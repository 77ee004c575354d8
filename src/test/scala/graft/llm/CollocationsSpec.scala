package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("pmi matches a hand-computed model") {
    // corpus: "a b" appears 3x, "a c" 1x, "c c" 1x
    val docs = Seq(
      (1L, "a b a b"),   // pairs: (a,b) (b,a) (a,b)
      (2L, "a b a c"),   // pairs: (a,b) (b,a) (a,c)
      (3L, "c c")        // pairs: (c,c)
    ).toDF("doc_id", "text")
    val out = Collocations.pmi(docs, "doc_id", "text", vocabSize = 8, minCount = 2)
      .orderBy("t1", "t2")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq

    // unigrams: a=4, b=3, c=3  → T = 10; pairs total P = 7
    // surviving pairs (cnt >= 2): (a,b) 3, (b,a) 2
    def pmiMicros(cab: Long, ca: Long, cb: Long): Long =
      math.round(math.log((cab.toDouble * 10 * 10) / (7.0 * ca * cb)) * 1e6)
    assert(out == Seq(
      ("a", "b", 3L, 4L, 3L, pmiMicros(3, 4, 3)),
      ("b", "a", 2L, 3L, 4L, pmiMicros(2, 3, 4))))
    // "a b" is the stronger collocation
    assert(out.head._6 > out(1)._6)
  }

  test("vocab cap and single-token/empty docs") {
    val docs = Seq(
      (1L, "x y x y x y"),
      (2L, "rare pair rare pair"),
      (3L, "solo"),
      (4L, "")
    ).toDF("doc_id", "text")
    // vocab = top-2 tokens only (x:3, y:3 beat rare:2, pair:2 on count;
    // "" from doc 4 has cnt 1): pairs among {x, y} survive, (rare,pair)
    // is capped out despite cnt 2
    val out = Collocations.pmi(docs, "doc_id", "text", vocabSize = 2, minCount = 2)
      .select("t1", "t2").as[(String, String)].collect().toSet
    assert(out == Set(("x", "y"), ("y", "x")))
  }

  test("mergePhrases: greedy left-to-right, no re-merge, overlap resolution") {
    val docs = Seq(
      (1L, "new york city hall"),      // (new,york) and (york,city) overlap
      (2L, "a a a"),                   // (a,a): merge 1-2, token 3 stays
      (3L, "new new york"),            // greedy: (new,new) not a phrase →
                                       // new stays, then (new,york) merges
      (4L, "solo"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Collocations.mergePhrases(docs, "doc_id", "text",
      Seq(("new", "york"), ("york", "city"), ("a", "a")))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 4L, 3L, "new_york city hall")))
    assert(got(1) == ((2L, 3L, 2L, "a_a a")))
    assert(got(2) == ((3L, 3L, 2L, "new new_york")))
    assert(got(3) == ((4L, 1L, 1L, "solo")))
    assert(got(4) == ((5L, 0L, 0L, "")))
  }

  test("mergePhrases composes with pmi output") {
    val docs = Seq(
      (1L, "san francisco bay"),
      (2L, "san francisco fog"),
      (3L, "san diego bay")
    ).toDF("doc_id", "text")
    val phrases = Collocations.pmi(docs, "doc_id", "text", vocabSize = 16, minCount = 2)
      .filter(col("pmi_micros") > 0)
      .select("t1", "t2").as[(String, String)].collect().toSeq
    assert(phrases.contains(("san", "francisco")))
    val merged = Collocations.mergePhrases(docs, "doc_id", "text", phrases)
      .filter(col("doc_id") === 1).as[(Long, Long, Long, String)].head()
    assert(merged._4.startsWith("san_francisco"))
  }

  test("guards are loud") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Collocations.pmi(docs, "doc_id", "text", vocabSize = 0)
    }
    intercept[IllegalArgumentException] {
      Collocations.pmi(docs, "doc_id", "text", minCount = 0)
    }
  }
}
