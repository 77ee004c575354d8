package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeywordTagSpec extends SparkSpec {
  import spark.implicits._

  /** Naive model of the kernel contract: all start positions over code
    * points, overlapping included. */
  private def naiveCount(text: String, kw: String): Long = {
    val t = text.codePoints().toArray
    val k = kw.codePoints().toArray
    (0 to t.length - k.length).count(i => t.slice(i, i + k.length).sameElements(k)).toLong
  }

  private def kernelCounts(text: Option[String], kws: Seq[String]): Seq[Long] = {
    val df = Seq(Tuple1(text.orNull)).toDF("text")
    df.select(graft.functions.GraftKeywordOps.keywordCountsKernel($"text", kws))
      .collect().head.getSeq[Long](0)
  }

  test("counts overlapping occurrences — the aaa/aa case") {
    assert(kernelCounts(Some("aaa"), Seq("aa")) == Seq(2L))
    assert(kernelCounts(Some("abababa"), Seq("aba", "ab", "ba")) == Seq(3L, 3L, 3L))
  }

  test("NULL text counts as the empty string") {
    assert(kernelCounts(None, Seq("aa", "b")) == Seq(0L, 0L))
  }

  test("counts by code point, not UTF-16 unit") {
    val g = new String(Character.toChars(0x1F600)) // non-BMP
    assert(kernelCounts(Some(s"x${g}x$g"), Seq(g, s"x$g")) == Seq(2L, 2L))
  }

  test("property fuzz vs the naive model — overlap-heavy random inputs") {
    val rnd = new scala.util.Random(20260814)
    val alphabet = "aab"
    for (round <- 0 until 200) {
      val text = Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val nKw = 1 + rnd.nextInt(5)
      val kws = Iterator
        .continually(Seq.fill(1 + rnd.nextInt(4))(alphabet(rnd.nextInt(alphabet.length))).mkString)
        .distinct.take(nKw).toSeq
      val got = kernelCounts(Some(text), kws)
      val want = kws.map(naiveCount(text, _))
      assert(got == want, s"round $round text='$text' kws=$kws: got $got want $want")
    }
  }

  test("tagTaxonomy sums per topic and counts matched keywords") {
    val docs = Seq(
      (1L, "spark table scan table"),
      (2L, "window stream"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tagTaxonomy(docs, "doc_id", "text", Seq(
        "rel" -> Seq("table", "scan"),
        "stream" -> Seq("stream", "window")))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out((1L, "rel")) == ((3L, 2L)))
    assert(out((1L, "stream")) == ((0L, 0L)))
    assert(out((2L, "stream")) == ((2L, 2L)))
    assert(out((3L, "rel")) == ((0L, 0L)))
    assert(out.size == 6)
  }

  test("tagTaxonomy is a zero-shuffle projection") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = TextAnalysis.tagTaxonomy(docs, "doc_id", "text",
      Seq("t" -> Seq("a"))).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("guards: empty/duplicate keywords and topics reject") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.tagTaxonomy(docs, "doc_id", "text", Seq("t" -> Nil))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.tagTaxonomy(docs, "doc_id", "text",
        Seq("t" -> Seq("a"), "t" -> Seq("b")))
    }
    intercept[Exception] {
      kernelCounts(Some("x"), Seq("a", "a"))
    }
  }
}
