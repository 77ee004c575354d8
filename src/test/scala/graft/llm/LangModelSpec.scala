package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram language-model scoring: smoothing math, OOV/fallback handling,
  * edge cases. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // counts: a=4, b=3, c=2; bigrams: (a,b)=2, (b,a)=1, (a,c)=1, (c,a)=1, (b,c)=1
  private val docs = Seq(
    (1L, "a b a c"),
    (2L, "a b c a"),
    (3L, "b")).toDF("doc_id", "text")

  private def mic(x: Double): Long = math.round(x * 1e6)

  test("lmUnigrams: capped vocab with smoothed fallback micros") {
    val u = LangModel.lmUnigrams(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(u.size == 3)
    assert(u("a")._2 == 4L && u("b")._2 == 3L && u("c")._2 == 2L)
    assert(u("a")._3 == mic(math.log(1.0 / (4 + 3))))
    // cap keeps top-V by (cnt desc, token asc); V shrinks the smoothing
    val capped = LangModel.lmUnigrams(docs, "doc_id", "text", vocabSize = 2)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(capped.keySet == Set("a", "b") && capped("a")._3 == mic(math.log(1.0 / (4 + 2))))
  }

  test("lmBigrams: sparse table of observed in-vocab bigrams with add-one smoothing") {
    val b = LangModel.lmBigrams(docs, "doc_id", "text")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(b.size == 5)
    assert(b(("a", "b"))._1 == 2L)
    assert(b(("a", "b"))._2 == mic(math.log(3.0 / (4 + 3)))) // (2+1)/(c_a=4 + V=3)
    assert(b(("c", "a"))._2 == mic(math.log(2.0 / (2 + 3))))
  }

  test("lmScore: observed bigrams, fallbacks, and zero-pair docs") {
    val s = LangModel.lmScore(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(s.size == 3)
    // doc 1 "a b a c": pairs (a,b)(b,a)(a,c) all observed
    val lp1 = mic(math.log(3.0 / 7)) + mic(math.log(2.0 / 6)) + mic(math.log(2.0 / 7))
    assert(s(1L)._2 == 3L && s(1L)._3 == lp1)
    // doc 3 "b": no pairs at all
    assert(s(3L)._2 == 0L && s(3L)._3 == 0L)
  }

  test("lmScoreWith: unobserved in-vocab bigram takes the left fallback; OOV pairs skipped") {
    val uni = LangModel.lmUnigrams(docs, "doc_id", "text")
    val bi = LangModel.lmBigrams(docs, "doc_id", "text")
    val fresh = Seq((10L, "c b"), (11L, "a zzz b")).toDF("doc_id", "text")
    val s = LangModel.lmScoreWith(fresh, "doc_id", "text", uni, bi)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // (c,b) never observed -> fallback of c: ln(1/(2+3))
    assert(s(10L)._2 == 1L && s(10L)._3 == mic(math.log(1.0 / 5)))
    // both pairs touch OOV 'zzz' -> nothing scored
    assert(s(11L)._2 == 0L && s(11L)._3 == 0L)
  }

  test("ccnetBuckets: thirds by per-token score, zero-pair docs in tail") {
    // 9 docs per lang with clearly separated per-token scores via
    // repetition counts, plus a pairless doc
    val cs = (1 to 9).flatMap { i =>
      Seq((i.toLong, ("a b " * i).trim + " " + ("zz " * (9 - i)).trim, "en"))
    } :+ ((100L, "solo", "en")) :+ ((101L, "a b a b", "fr"))
    val df = cs.toDF("doc_id", "text", "lang")
    val out = LangModel.ccnetBuckets(df, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out(100L) == "tail", "pairless doc must land in tail")
    val en = (1 to 9).map(i => out(i.toLong))
    assert(en.count(_ == "head") >= 2 && en.count(_ == "tail") >= 2,
      s"expected a spread across buckets, got $en")
    // monotone: a doc in head never has a lower-scored doc above it
    val scored = LangModel.ccnetBuckets(df, "doc_id", "text", "lang")
      .filter($"lang" === "en" && $"tok_lp_micros".isNotNull)
      .select("tok_lp_micros", "bucket")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val rank = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    for (w <- scored.sortBy(-_._1).toSeq.sliding(2) if w.size == 2)
      assert(rank(w(0)._2) <= rank(w(1)._2),
        s"bucket order violates score order: ${scored.toSeq}")
    // single-doc lang: quantiles degenerate to its own score -> head
    assert(out(101L) == "head")
  }

  test("ccnetBuckets is partition-invariant and never windows per lang") {
    val df = (1 to 40).map(i =>
      (i.toLong, Seq.fill(i % 7 + 1)("a b").mkString(" "), if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "text", "lang")
    val a = LangModel.ccnetBuckets(df, "doc_id", "text", "lang")
      .collect().map(_.toString).sorted.toSeq
    val b = LangModel.ccnetBuckets(df.repartition(13), "doc_id", "text", "lang")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    val plan = LangModel.ccnetBuckets(df, "doc_id", "text", "lang")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"per-lang window in plan:\n$plan")
  }
}
