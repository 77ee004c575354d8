package graft.llm

import graft.SparkSpec

/** Property fuzz for [[Collocations.pmi]]: random corpora over a tiny
  * vocabulary (dense pair collisions, single-token and repeated-token
  * docs) checked against a naive in-memory model — plain Scala counts
  * and the same left-associated double fold. Pins the totals (T from
  * unigrams, P from pairs), the vocab cap tiebreak, and the minCount
  * floor under randomized corpora. */
class CollocationsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d", "e", "f")

  private def model(corpus: Seq[(Long, String)], vocabSize: Int, minCount: Int)
      : Map[(String, String), (Long, Long, Long, Long)] = {
    val toks = corpus.map(_._2.split("\\s+").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = uni.toSeq.sortBy { case (t, c) => (-c, t) }.take(vocabSize).toMap
    val pairs = toks.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tTot = uni.values.sum
    val pTot = pairs.values.sum
    pairs.collect {
      case ((a, b), cab) if cab >= minCount && top.contains(a) && top.contains(b) =>
        val pmi = math.round(math.log(
          (cab.toDouble * tTot * tTot) / (pTot.toDouble * top(a) * top(b))) * 1e6)
        (a, b) -> (cab, top(a), top(b), pmi)
    }.toMap
  }

  test("random corpora match the naive count/fold model") {
    val rnd = new scala.util.Random(160814)
    for (trial <- 1 to 10) {
      val corpus = (0 until 30).map { i =>
        val len = 1 + rnd.nextInt(12)
        i.toLong -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val vs = 2 + rnd.nextInt(5)
      val mc = 1 + rnd.nextInt(3)
      val got = Collocations.pmi(corpus.toDF("doc_id", "text"), "doc_id", "text",
        vocabSize = vs, minCount = mc)
        .as[(String, String, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
      val want = model(corpus, vs, mc)
      assert(got == want,
        s"trial $trial (vocab=$vs minCount=$mc): " +
          s"missing=${(want.keySet -- got.keySet).take(3)} " +
          s"extra=${(got.keySet -- want.keySet).take(3)} " +
          s"diff=${want.keySet.intersect(got.keySet).filter(k => want(k) != got(k)).take(3)
            .map(k => s"$k: ${got(k)} vs ${want(k)}")}")
    }
  }
}
