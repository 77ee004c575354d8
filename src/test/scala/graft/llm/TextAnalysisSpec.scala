package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("stats computes token/char counts and ratios") {
    val d = docs(1L -> "the quick the fox")
    val r = TextAnalysis.stats(d, "doc_id", "text").head()
    assert(r.getAs[Int]("n_chars") == 17)
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Int]("n_distinct_tokens") == 3)
    assert(r.getAs[Long]("token_chars") == 14)
    assert(r.getAs[Double]("distinct_ratio") == 0.75)
    assert(r.getAs[Double]("stopword_ratio") == 0.5) // 'the' twice
  }

  test("bpeish tokenization splits words, numbers, and symbols") {
    val d = docs(1L -> "ab12 cd, ef!")
    val r = TextAnalysis.stats(d, "doc_id", "text").head()
    // ab, 12, cd, ',', ef, '!'
    assert(r.getAs[Int]("n_bpeish_tokens") == 6)
  }

  test("langId scores marker hits and breaks ties in declaration order") {
    val d = docs(
      1L -> "the a table spark", // en=3, zh=1 -> en
      2L -> "spark spark order", // zh=3 -> zh
      3L -> "data join key") // de=1, fr=1, es=1 -> de (declaration order)
    val got = TextAnalysis.langId(d, "doc_id", "text")
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "zh", 3L -> "de"))
  }

  test("langId pass-through columns ride alongside the prediction") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val d = docs(1L -> "the a table spark", 2L -> "spark spark order")
      .withColumn("label", concat(lit("L"), col("doc_id")))
    val got = TextAnalysis.langId(d, "doc_id", "text", passThrough = Seq("label"))
      .select("doc_id", "label", "predicted_lang")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "L1", "en"), (2L, "L2", "zh")))
  }

  test("qualityScore is in [0,1] and buckets deterministically") {
    val rows = TextAnalysis.qualityScore(
      docs(1L -> "the quick brown fox jumps", 2L -> "x"), "doc_id", "text").collect()
    rows.foreach { r: Row =>
      val s = r.getAs[Double]("quality_score")
      assert(s >= 0.0 && s <= 1.0)
      assert(Seq("high", "medium", "low").contains(r.getAs[String]("quality_bucket")))
    }
  }

  test("vocabulary counts tf with multiplicity and df per document") {
    val d = docs(1L -> "a b a", 2L -> "a c")
    val got = TextAnalysis.vocabulary(d, "doc_id", "text")
      .select("token", "tf", "df", "rank").as[(String, Long, Long, Int)].collect().toSeq
    assert(got == Seq(("a", 3L, 2L, 1), ("b", 1L, 1L, 2), ("c", 1L, 1L, 3)))
  }

  test("fingerprints: content hash differs on different text, equals on same") {
    val got = TextAnalysis.fingerprints(
      docs(1L -> "aaaa bbbb cccc", 2L -> "aaaa bbbb cccc", 3L -> "dddd eeee ffff"),
      "doc_id", "text")
      .select("doc_id", "content_hash").as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L) && got(1L) != got(3L))
  }

  test("hashedFeatures: counts land in polyHash%dim buckets; vector sums to token count") {
    val docs = Seq((1L, "aa bb aa"), (2L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.hashedFeatures(docs, "doc_id", "text", dim = 8)
      .as[(Long, Seq[Double])].collect().toMap
    def bucket(w: String): Int = (TextHash.Prime + 0) match { case _ =>
      // recompute the portable hash in-test
      (w.foldLeft(7L)((a, c) => (a * 31 + c.toInt) % 1000000007L) % 8).toInt
    }
    val v1 = got(1L)
    assert(v1.sum == 3.0 && v1.length == 8)
    assert(v1(bucket("aa")) >= 2.0 && v1(bucket("bb")) >= 1.0)
    // empty text tokenizes to [""] -> one count in ""'s bucket
    assert(got(2L).sum == 1.0)
    // equals the HOF formulation bucket-for-bucket on the real corpus
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val kernel = TextAnalysis.hashedFeatures(real, "doc_id", "text", dim = 16)
      .as[(Long, Seq[Double])].collect().toMap
    val hof = real.select(col("doc_id"),
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.sequence(lit(0), lit(15)),
        b => org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.filter(
          graft.functions.HashFunctions.tokenHashes(col("text")),
          h => h % 16 === b)).cast("double")).as("f"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(kernel == hof)
  }

  test("vocabGrowth: hand-computed curve over a tiny ordered corpus") {
    // global stream (doc order): a b | a c | d d  -> N=6
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "d d")).toDF("doc_id", "text")
    // first_pos: a=0 b=1 c=3 d=4; checkpoints i*6/4 = 1,3,4,6 (strict <)
    val out = TextAnalysis.vocabGrowth(docs, "doc_id", "text", nCheckpoints = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1) == ((1L, 1L)))   // before pos 1: {a}
    assert(out(2) == ((3L, 2L)))   // before pos 3: {a,b}
    assert(out(3) == ((4L, 3L)))   // before pos 4: {a,b,c}
    assert(out(4) == ((6L, 4L)))   // full corpus
  }

  test("vocabGrowth: monotone, partition-invariant, NULL text contributes nothing") {
    val docs = ((1 to 60).map(i => (i.toLong, s"w${i % 13} w${i % 7} common"))
      :+ (61L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val a = TextAnalysis.vocabGrowth(docs, "doc_id", "text").collect()
      .sortBy(_.getInt(0)).map(r => (r.getLong(1), r.getLong(2)))
    val b = TextAnalysis.vocabGrowth(docs.repartition(7), "doc_id", "text")
      .collect().sortBy(_.getInt(0)).map(r => (r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
    assert(a.last._1 == 180L, "NULL text must add no tokens")
    for (w <- a.toSeq.sliding(2) if w.size == 2) {
      assert(w(0)._1 <= w(1)._1 && w(0)._2 <= w(1)._2, s"curve not monotone: ${a.toSeq}")
    }
    assert(a.last._2 == 14L) // w0..w12 (13) + common; w{i%7} are dupes
  }
}
