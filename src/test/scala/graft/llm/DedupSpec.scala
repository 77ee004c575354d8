package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, format_string}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact: keeps min id per duplicate group, counts copies") {
    val d = docs(1L -> "aaa bbb", 2L -> "ccc ddd", 3L -> "aaa bbb", 7L -> "aaa bbb")
    val got = Dedup.exact(d, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L), (2L, 1L)))
  }

  test("minhashPairs finds a planted near-duplicate and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = base.replace("today", "tomoro")
    val other = "completely different content with zero overlapping shingles here"
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Dedup.minhashPairs(d, "doc_id", "text", minJaccard = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhashPairs jaccard matches a hand-computed shingle Jaccard") {
    val a = "abcdefghij"
    val b = "abcdefghiX" // shares 5-shingles abcde..efghi
    val d = docs(1L -> a, 2L -> b)
    // force candidate generation by identical prefix: verify the exact value
    val row = Dedup.minhashPairs(d, "doc_id", "text", minJaccard = 0.0).collect()
    if (row.nonEmpty) { // banding is probabilistic; exact-jaccard must match when present
      val shA = a.sliding(5).toSet
      val shB = b.sliding(5).toSet
      val expected = shA.intersect(shB).size.toDouble / shA.union(shB).size
      assert(math.abs(row.head.getAs[Double]("jaccard") - expected) < 1e-12)
    }
  }

  test("simhashFingerprints are deterministic and bounded to 24 bits") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "alpha beta gamma", 3L -> "delta epsilon zeta")
    val fps = Dedup.simhashFingerprints(d, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L)) // identical text, identical fingerprint
    assert(fps.values.forall(fp => fp >= 0 && fp < (1L << 24)))
  }

  test("simhashPairs: identical docs collide at hamming 0") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "alpha beta gamma", 3L -> "x y z")
    val pairs = Dedup.simhashPairs(d, "doc_id", "text")
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("incremental dedup drops seen content and keeps min id per fresh hash") {
    import org.apache.spark.sql.functions.md5
    val history = docs(1L -> "already ingested", 2L -> "also known")
      .select(md5(col("text")).as("text_md5"))
    val batch = docs(
      10L -> "already ingested", // exact dup of history → dropped
      11L -> "brand new text",
      12L -> "brand new text",   // in-batch dup → min id survives
      13L -> "another fresh one")
    val got = Dedup.incremental(batch, "doc_id", "text", history)
      .select("keep_id").as[Long].collect().toSet
    assert(got == Set(11L, 13L))
  }

  test("clusters handles an empty universe and empty pair table") {
    val empty = spark.emptyDataFrame.select(
      org.apache.spark.sql.functions.lit(0L).as("doc_id")).filter(col("doc_id") =!= 0L)
    val noPairs = empty.select(col("doc_id").as("doc_a"), col("doc_id").as("doc_b"))
    assert(Dedup.clusters(empty, noPairs).count() == 0)
    val three = docs(1L -> "a", 2L -> "b", 3L -> "c").select("doc_id")
    val got = Dedup.clusters(three, noPairs)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 2L), (3L, 3L))) // singletons self-cluster
  }

  test("ngramJaccardPairs computes exact word-3-gram Jaccard above threshold") {
    val a = "one two three four five six"
    val b = "one two three four five seven" // shares 3 of the union's grams
    val d = docs(1L -> a, 2L -> b, 3L -> "nothing shared at all whatsoever kept")
    val got = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, minJaccard = 0.1)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 1)
    val (da, db, j) = got.head
    assert((da, db) == (1L, 2L))
    def grams(s: String) = s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expected = grams(a).intersect(grams(b)).size.toDouble / grams(a).union(grams(b)).size
    assert(math.abs(j - expected) < 1e-12)
  }

  test("dupSpans merges adjacent shared grams into one span, hand-computed") {
    val d = docs(
      1L -> "a b c d e f g h",  // grams 1-4; grams 1,2 shared with doc 2
      2L -> "a b c d e f z z",  // grams 1,2 shared with doc 1
      3L -> "q r s t",          // shorter than n=5: zero grams
      4L -> "u v w x y z2 u v") // 4 grams, none shared
    val got = Dedup.dupSpans(d, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) == ((4L, 2L, 1L, 2L, 0.5)))
    assert(got(2L) == ((4L, 2L, 1L, 2L, 0.5)))
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0.0)))
    assert(got(4L) == ((4L, 0L, 0L, 0L, 0.0)))
  }

  test("dupSpans counts non-adjacent shared grams as separate spans") {
    val d = docs(
      5L -> "a b c d e x1 x2 x3 x4 p q r s t",
      6L -> "a b c d e y1 y2 y3 y4 p q r s t")
    // shared 5-grams: "a b c d e" (pos 1) and "p q r s t" (pos 10); 10 grams total
    val got = Dedup.dupSpans(d, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got(5L) == ((10L, 2L, 2L, 1L, 0.2)))
    assert(got(6L) == ((10L, 2L, 2L, 1L, 0.2)))
  }

  test("removeDupSpans excises shared spans and rebuilds the survivors in order") {
    val d = docs(
      1L -> "a b c d e f g h",  // grams 1,2 shared -> tokens 1..6 dropped
      2L -> "a b c d e f z z",
      3L -> "q r s t",          // shorter than n: untouched
      4L -> "u v w x y z2 u v") // no shared grams: untouched
    val got = Dedup.removeDupSpans(d, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((8L, 2L, "g h")))
    assert(got(2L) == ((8L, 2L, "z z")))
    assert(got(3L) == ((4L, 4L, "q r s t")))
    assert(got(4L) == ((8L, 8L, "u v w x y z2 u v")))
  }

  test("removeDupSpans empties a fully duplicated document") {
    val d = docs(5L -> "p q r s t", 6L -> "p q r s t")
    val got = Dedup.removeDupSpans(d, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(5L) == ((5L, 0L, "")))
    assert(got(6L) == ((5L, 0L, "")))
  }

  test("semantic: removes higher-id near-cosine cell-mates, keeps cross-cell twins") {
    // k=2, seeds = ids 0 and 1 (x-axis vs y-axis); iters=1 keeps the seed
    // centroids, so the cells are exactly {x-ish} and {y-ish}
    val vecs = Seq(
      (0L, Seq(1f, 0f)),   // seed cell A
      (1L, Seq(0f, 1f)),   // seed cell B
      (2L, Seq(2f, 0.1f)), // cell A, cosine~1 vs 0 -> removed, dup_of 0
      (3L, Seq(0.1f, 3f)), // cell B, cosine~1 vs 1 -> removed, dup_of 1
      (4L, Seq(1f, 1.2f)), // cell B, cosine vs 1 = .77, vs 3 = .80 -> removed at tau .7
      (5L, Seq(0f, 0f))    // zero norm: never compared, kept
    ).toDF("vec_id", "embedding")
    val out = Dedup.semantic(vecs, "vec_id", "embedding", k = 2, iters = 1, tau = 0.7)
      .as[(Long, Long, Option[Long], Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 6)
    assert(out(0L)._4 && out(1L)._4 && out(5L)._4)
    assert(!out(2L)._4 && out(2L)._3.contains(0L))
    assert(!out(3L)._4 && out(3L)._3.contains(1L))
    assert(!out(4L)._4 && out(4L)._3.contains(1L)) // min matching cell-mate
    // cross-cell twins survive: 2 is near-parallel to nothing in cell B
    assert(out(2L)._2 == 0L && out(3L)._2 == 1L && out(4L)._2 == 1L)
  }

  test("semantic: cells above cellCap are dropped from pair expansion (all kept)") {
    val vecs = (0L to 5L).map(i => (i, Seq(1f, 0f))).toDF("vec_id", "embedding")
    // one degenerate cell of 6 identical vectors; cap 5 -> no pairs at all
    val out = Dedup.semantic(vecs, "vec_id", "embedding", k = 1, iters = 1,
      tau = 0.5, cellCap = 5)
    assert(out.filter(col("keep")).count() == 6)
    // without the cap the same cell collapses to one survivor
    val uncapped = Dedup.semantic(vecs, "vec_id", "embedding", k = 1, iters = 1, tau = 0.5)
    assert(uncapped.filter(col("keep")).as[(Long, Long, Option[Long], Boolean)]
      .collect().map(_._1).toSeq == Seq(0L))
  }

  test("semantic: kernel path equals the pair-join fallback on the real corpus") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val kernel = Dedup.semantic(embs, "vec_id", "embedding", k = 8, iters = 2, tau = 0.3)
      .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    // string ids force the generic fallback; map back to longs to compare
    val viaFallback = Dedup.semantic(
      embs.select(format_string("%09d", col("vec_id")).as("vec_id"), col("embedding")),
      "vec_id", "embedding", k = 8, iters = 2, tau = 0.3)
      .select(col("vec_id").cast("long"), col("cluster").cast("long"),
        col("dup_of").cast("long"), col("keep"))
      .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    assert(kernel == viaFallback)
    assert(kernel.exists(!_._4) && kernel.exists(_._4))
  }

  test("minhashIncrementalPairs finds cross-side near-dups only") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val hist = docs(
      1L -> base,
      2L -> base.replace("today", "tonite"), // hist-internal near-dup: must NOT pair
      3L -> "completely different content with zero overlapping shingles here")
    val fresh = docs(
      10L -> base.replace("today", "tomoro"), // near-dup of hist 1 and 2
      11L -> "nothing in common with the historical corpus whatsoever at all")
    val pairs = Dedup.minhashIncrementalPairs(fresh, hist, "doc_id", "text", minJaccard = 0.5)
      .select("new_id", "hist_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 1L), (10L, 2L)))
  }

  test("minhashIncrementalPairs equals batch minhashPairs restricted to cross-side pairs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val all = docs(
      1L -> base,
      2L -> base.replace("today", "tonite"),
      3L -> "completely different content with zero overlapping shingles here",
      10L -> base.replace("today", "tomoro"),
      11L -> "nothing in common with the historical corpus whatsoever at all")
    val hist = all.filter(col("doc_id") < 10)
    val fresh = all.filter(col("doc_id") >= 10)
    val incr = Dedup.minhashIncrementalPairs(fresh, hist, "doc_id", "text", minJaccard = 0.0)
      .as[(Long, Long, Double)].collect().toSet
    val batch = Dedup.minhashPairs(all, "doc_id", "text", minJaccard = 0.0)
      .filter(col("doc_a") < 10 && col("doc_b") >= 10)
      .select(col("doc_b"), col("doc_a"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(incr == batch)
  }
}
