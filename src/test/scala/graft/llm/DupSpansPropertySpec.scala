package graft.llm

import graft.SparkSpec

/** Property fuzz for the span-dedup operators: random corpora over a
  * deliberately tiny vocabulary (so cross-document gram collisions are
  * dense) are checked against a naive in-memory model — brute-force gram
  * sets, island merging, and token excision computed with plain Scala
  * collections, no Spark. Catches off-by-ones in the islands window
  * arithmetic and the drop-set explode that hand-picked cases miss. */
class DupSpansPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d", "e")

  private def randomCorpus(rnd: scala.util.Random, nDocs: Int): Seq[(Long, String)] =
    (0 until nDocs).map { i =>
      val len = 1 + rnd.nextInt(20)
      i.toLong -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }

  /** Naive model: per doc, positions whose n-gram string occurs in >= 2
    * docs; islands; token cover. */
  private def model(corpus: Seq[(Long, String)], n: Int) = {
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val grams: Map[Long, Seq[String]] = toks.map { case (id, ts) =>
      id -> (if (ts.length >= n) ts.sliding(n).map(_.mkString(" ")).toSeq else Seq.empty)
    }
    val docsPerGram = grams.toSeq.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    corpus.map { case (id, _) =>
      val gs = grams(id)
      val dupPos = gs.zipWithIndex.collect { case (g, p) if docsPerGram(g) >= 2 => p + 1 }
      // islands over consecutive positions
      val spans = dupPos.foldLeft(List.empty[List[Int]]) {
        case (acc @ (run :: rest), p) if run.head == p - 1 => (p :: run) :: rest
        case (acc, p) => List(p) :: acc
      }
      val nGrams = gs.length.toLong
      val dupGrams = dupPos.size.toLong
      val nSpans = spans.size.toLong
      val maxSpan = if (spans.isEmpty) 0L else spans.map(_.size).max.toLong
      val frac = if (nGrams > 0) dupGrams.toDouble / nGrams else 0.0
      // token cover for removal
      val dropped = dupPos.flatMap(p => p until (p + n)).toSet
      val ts = toks(id)
      val kept = ts.zipWithIndex.collect { case (t, i) if !dropped(i + 1) => t }
      (id, (nGrams, dupGrams, nSpans, maxSpan, frac),
        (ts.length.toLong, kept.length.toLong, kept.mkString(" ")))
    }
  }

  test("dupSpans and removeDupSpans match the naive model on random corpora") {
    val rnd = new scala.util.Random(77)
    for (trial <- 0 until 8) {
      val n = 2 + trial % 3
      val corpus = randomCorpus(rnd, 4 + rnd.nextInt(6))
      val df = corpus.toDF("doc_id", "text")
      val expected = model(corpus, n)
      val gotSpans = Dedup.dupSpans(df, "doc_id", "text", n)
        .as[(Long, Long, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      val gotClean = Dedup.removeDupSpans(df, "doc_id", "text", n)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      for ((id, spans, clean) <- expected) {
        assert(gotSpans(id) == spans, s"trial $trial n=$n doc $id spans: got ${gotSpans(id)}, want $spans")
        assert(gotClean(id) == clean, s"trial $trial n=$n doc $id clean: got ${gotClean(id)}, want $clean")
      }
    }
  }
}
