package graft.llm

import graft.SparkSpec

/** Property fuzz for the compiled model-scoring kernels
  * ([[graft.functions.GraftModelOps]]): random corpora over a tiny
  * vocabulary — plus whitespace/empty-text edge cases — are scored
  * through the full train+score pipelines and checked against naive
  * in-memory reimplementations of the documented math (plain Scala
  * maps, no Spark). Catches lookup/memoization/tokenization drift that
  * the hand-picked spec cases would miss. */
class ScoringKernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee", "zz")
  private val langs = Vector("l1", "l2", "l3")

  private def randomCorpus(rnd: scala.util.Random, nDocs: Int): Seq[(Long, String, String)] =
    (0 until nDocs).map { i =>
      val len = rnd.nextInt(12) // 0 => empty text
      val words = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      // occasional odd whitespace to exercise the tokenizer contract
      val sep = if (rnd.nextInt(10) == 0) "  " else " "
      (i.toLong, words.mkString(sep), langs(rnd.nextInt(langs.size)))
    }

  private def toks(text: String): Array[String] = text.trim.split("\\s+", -1)

  /** Naive NB: mirrors the Classify scaladoc math directly. */
  private def nbModel(corpus: Seq[(Long, String, String)], v: Int) = {
    val tokCounts = corpus.flatMap { case (_, t, l) => toks(t).map(l -> _) }
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val vocabSel = tokCounts.groupBy(_._1._2).map { case (t, xs) => t -> xs.values.sum }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(v).map(_._1).toSet
    val labels = corpus.map(_._3).distinct.sorted
    val tl = labels.map(l => l -> tokCounts.collect {
      case ((ll, t), c) if ll == l && vocabSel(t) => c }.sum).toMap
    val vSize = vocabSel.size
    def lik(l: String, t: String): Long =
      math.round(math.log((tokCounts.getOrElse((l, t), 0L) + 1).toDouble / (tl(l) + vSize)) * 1e6)
    val nDocs = corpus.size
    val prior = labels.map(l =>
      l -> math.round(math.log(corpus.count(_._3 == l).toDouble / nDocs) * 1e6)).toMap
    (labels, vocabSel, lik _, prior)
  }

  test("nbClassify equals the naive model on random corpora") {
    val rnd = new scala.util.Random(1514L)
    for (round <- 1 to 8) {
      val corpus = randomCorpus(rnd, 20 + rnd.nextInt(40))
      val v = 3 + rnd.nextInt(4)
      val (labels, vocabSel, lik, prior) = nbModel(corpus, v)
      val got = Classify.nbClassify(corpus.toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang", vocabSize = v)
        .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
      corpus.foreach { case (id, text, _) =>
        val scores = labels.map(l =>
          l -> (prior(l) + toks(text).filter(vocabSel).map(t => lik(l, t)).sum))
        val best = scores.reduceLeft((a, b) => if (b._2 > a._2) b else a)
        assert(got(id) == ((id, best._1, best._2)),
          s"round $round doc $id '$text': got ${got(id)}, expected $best")
      }
    }
  }

  test("lmScore equals the naive model on random corpora") {
    val rnd = new scala.util.Random(2514L)
    for (round <- 1 to 8) {
      val corpus = randomCorpus(rnd, 20 + rnd.nextInt(40))
      val v = 3 + rnd.nextInt(4)
      val docs = corpus.map(c => (c._1, c._2)).toDF("doc_id", "text")
      // naive tables
      val uniAll = corpus.flatMap(c => toks(c._2)).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toLong }
      val vocabSel = uniAll.toSeq.sortBy { case (t, c) => (-c, t) }.take(v).toMap
      val vSize = vocabSel.size
      val biAll = corpus.flatMap(c => toks(c._2).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1)))).groupBy(identity)
        .map { case (p, xs) => p -> xs.size.toLong }
      def pairScore(t1: String, t2: String): Option[Long] =
        if (!vocabSel.contains(t1) || !vocabSel.contains(t2)) None
        else Some(biAll.get((t1, t2)).filter(_ => true) match {
          case Some(c) => math.round(math.log((c + 1).toDouble / (vocabSel(t1) + vSize)) * 1e6)
          case None => math.round(math.log(1.0 / (vocabSel(t1) + vSize)) * 1e6)
        })
      val got = LangModel.lmScore(docs, "doc_id", "text", vocabSize = v)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      corpus.foreach { case (id, text, _) =>
        val pairs = toks(text).sliding(2).filter(_.length == 2).toSeq
          .flatMap(p => pairScore(p(0), p(1)))
        assert(got(id) == ((id, pairs.size.toLong, pairs.sum)),
          s"round $round doc $id '$text': got ${got(id)}, expected (${pairs.size}, ${pairs.sum})")
      }
    }
  }
}
