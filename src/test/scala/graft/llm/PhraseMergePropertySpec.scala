package graft.llm

import graft.SparkSpec

/** Property fuzz for [[Collocations.mergePhrases]]: random corpora over a
  * tiny vocabulary (dense phrase-pair collisions, adjacent repeats) and
  * random phrase sets are checked against a naive in-memory greedy fold
  * — plain Scala, no Spark. The single sequential pass with its
  * no-re-merge rule is exactly the kind of recurrence where a window or
  * fold spelling can drift off by one (an "a a a" run with phrase (a,a)
  * must merge positions 1-2 and leave 3). */
class PhraseMergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d")

  /** Naive model of the greedy left-to-right single pass. */
  private def model(tokens: Seq[String], phrases: Set[(String, String)]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < tokens.length) {
      if (i + 1 < tokens.length && phrases(tokens(i) -> tokens(i + 1))) {
        out += s"${tokens(i)}_${tokens(i + 1)}"
        i += 2
      } else {
        out += tokens(i)
        i += 1
      }
    }
    out.toSeq
  }

  test("random corpora and phrase sets match the naive greedy model") {
    val rnd = new scala.util.Random(20260814)
    for (trial <- 1 to 12) {
      val corpus = (0 until 40).map { i =>
        val len = 1 + rnd.nextInt(14)
        i.toLong -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val nPhrases = 1 + rnd.nextInt(6)
      val phrases = Seq.fill(nPhrases)(
        (vocab(rnd.nextInt(vocab.size)), vocab(rnd.nextInt(vocab.size)))).distinct
      val got = Collocations.mergePhrases(
        corpus.toDF("doc_id", "text"), "doc_id", "text", phrases)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> r).toMap
      corpus.foreach { case (id, text) =>
        val toks = text.split("\\s+").toSeq
        val want = model(toks, phrases.toSet)
        val (_, nTok, nAfter, merged) = got(id)
        assert(nTok == toks.length && nAfter == want.length &&
          merged == want.mkString(" "),
          s"trial $trial doc $id: text '$text' phrases $phrases → " +
            s"got ($nTok, $nAfter, '$merged'), want (${toks.length}, " +
            s"${want.length}, '${want.mkString(" ")}')")
      }
    }
  }
}
