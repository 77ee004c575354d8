package graft.llm

import graft.SparkSpec
import graft.functions.GraftBpeOps
import org.apache.spark.sql.functions._

/** Trainable BPE: merge adoption order, tiebreaks, encode semantics, and
  * the kernel-vs-model equivalence fuzz. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train adopts the most frequent pair per round with (cnt, lhs, rhs) ties") {
    // 'abab' x2 + 'abx': pairs (a,b)=5, (b,a)=2, (b,x)=1 -> merge 1 = (a,b)
    // then (ab,ab)=2 beats (ab,x)=1 -> merge 2 = (ab,ab)
    val docs = Seq((1L, "abab abx"), (2L, "abab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "doc_id", "text", merges = 2)
    assert(m == Seq(("a", "b"), ("ab", "ab")))
  }

  test("train stops early when no pairs remain") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "doc_id", "text", merges = 5)
    assert(m.isEmpty) // every word is a single symbol from the start
  }

  test("applyMerge is one left-to-right non-overlapping pass") {
    assert(GraftBpeOps.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(GraftBpeOps.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(GraftBpeOps.applyMerge(Array("x"), "a", "a").toSeq == Seq("x"))
  }

  test("encode applies merges in rank order; tokens concatenate back to the words") {
    val docs = Seq((1L, "abab abx"), (2L, "abab"), (3L, "")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "doc_id", "text", merges = 2)
    val enc = Bpe.encode(docs, "doc_id", "text", m)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1: [abab][ab, x] -> 3 tokens; doc 2: [abab] -> 1; doc 3: 0
    assert(enc(1L)._2 == 3L && enc(2L)._2 == 1L && enc(3L)._2 == 0L)
    // empty doc hashes to the fold seed
    assert(enc(3L)._3 == TextHash.Seed)
  }

  test("kernel round-trip fuzz: token concatenation rebuilds every word") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd"
    val corpus = (0 until 40).map { i =>
      val words = Seq.fill(1 + rnd.nextInt(6))(
        Seq.fill(1 + rnd.nextInt(8))(alpha(rnd.nextInt(alpha.length))).mkString)
      (i.toLong, words.mkString(" "))
    }
    val docs = corpus.toDF("doc_id", "text")
    val m = Bpe.train(docs, "doc_id", "text", merges = 12)
    val toks = docs.select(col("doc_id"),
      GraftBpeOps.bpeEncode(col("text"), m).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    corpus.foreach { case (id, text) =>
      assert(toks(id).mkString == text.split("\\s+", -1).mkString,
        s"doc $id: tokens don't rebuild the text")
      // every token is either a single char or a trained merge product
      val merged = m.map { case (l, r) => l + r }.toSet
      toks(id).foreach(t => assert(t.length == 1 || merged(t), s"unknown token $t"))
    }
  }

  test("supplementary-plane text symbolizes by code point, ties break in UTF-8 order") {
    // 𝄞 (U+1D11E) is a surrogate pair in UTF-16: charAt-splitting would
    // produce two lone-surrogate "symbols" the DuckDB oracle (substr by
    // code point) never sees
    assert(GraftBpeOps.codePointSymbols("a𝄞b").toSeq ==
      Seq("a", "𝄞", "b"))
    assert(GraftBpeOps.codePointSymbols("").toSeq == Seq())
    val g = "𝄞" // 𝄞
    val docs = Seq((1L, s"$g$g$g$g ${g}x")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "doc_id", "text", merges = 1)
    // the one possible pair is (𝄞, 𝄞) as CODE POINTS, not surrogates
    assert(m == Seq((g, g)))
    val enc = Bpe.encode(docs, "doc_id", "text", m)
      .as[(Long, Long, Long)].collect().head
    // 𝄞𝄞𝄞𝄞 -> [𝄞𝄞][𝄞𝄞]; 𝄞x -> [𝄞][x] => 4 tokens
    assert(enc._2 == 4L)
    // tie-break: count ties between a private-use BMP char (U+E000,
    // UTF-8 ee 80 80) and 𝄞 (UTF-8 f0 9d 84 9e) must adopt the BMP char
    // first — UTF-8 byte order, where Java UTF-16 order would pick 𝄞
    // (surrogate D834 < E000)
    val e = "\uE000"
    val tie = Seq((1L, s"$e$e"), (2L, s"$g$g")).toDF("doc_id", "text")
    assert(Bpe.train(tie, "doc_id", "text", merges = 1) == Seq((e, e)))
  }

  test("trainDf emits the ranked merge table") {
    val docs = Seq((1L, "abab abx"), (2L, "abab")).toDF("doc_id", "text")
    val rows = Bpe.trainDf(docs, "doc_id", "text", merges = 2)
      .as[(Int, String, String, String)].collect().toSeq
    assert(rows == Seq((1, "a", "b", "ab"), (2, "ab", "ab", "abab")))
  }
}
