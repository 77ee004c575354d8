package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextHashSpec extends SparkSpec {
  import spark.implicits._

  test("polyHash matches the hand-computed fold (parity with the DuckDB mirror)") {
    // fold('abc', 7): ((7*31+97)*31+98)*31+99 mod 1e9+7 = 304891
    // (the same value the oracle-side list_reduce produces)
    val got = Seq("abc").toDF("s").select(TextHash.polyHash(col("s"))).head.getLong(0)
    assert(got == 304891L)
  }

  test("polyHash stays within [0, Prime)") {
    val hashes = Seq("the quick brown fox", "x" * 500, "a")
      .toDF("s").select(TextHash.polyHash(col("s"))).collect().map(_.getLong(0))
    assert(hashes.forall(h => h >= 0 && h < TextHash.Prime))
  }

  test("charShingles: distinct k-grams, first-occurrence order, short-input guard") {
    val got = Seq("ababa").toDF("s")
      .select(TextHash.charShingles(col("s"), 3)).head.getSeq[String](0)
    assert(got == Seq("aba", "bab")) // 'aba' appears twice, kept once
    val short = Seq("ab").toDF("s")
      .select(TextHash.charShingles(col("s"), 3)).head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("wordNgrams builds space-joined n-grams") {
    val got = Seq("a b c d").toDF("s")
      .select(TextHash.wordNgrams(TextHash.wordTokens(col("s")), 3)).head.getSeq[String](0)
    assert(got == Seq("a b c", "b c d"))
  }

  test("minhashSignature: sig(j) = min over hashes of ((2j+1)h + j^2+1) mod P") {
    val df = Seq("x").toDF("s").select(
      TextHash.minhashSignature(typedLit(Seq(10L, 20L, 3L)), 4).as("sig"))
    val sig = df.head.getSeq[Long](0)
    def perm(j: Long, h: Long) = (h * (2 * j + 1) + (j * j + 1)) % TextHash.Prime
    val expected = (0L until 4L).map(j => Seq(10L, 20L, 3L).map(perm(j, _)).min)
    assert(sig == expected)
  }

  test("bandDigests folds rowsPerBand consecutive signature entries") {
    val sig = Seq(1L, 2L, 3L, 4L)
    val got = Seq("x").toDF("s")
      .select(TextHash.bandDigests(typedLit(sig), 2, 2).as("b"))
      .selectExpr("b[0].band", "b[0].band_hash", "b[1].band", "b[1].band_hash")
      .head
    def fold(vals: Seq[Long]) =
      vals.foldLeft(TextHash.Seed)((a, c) => (a * 31 + c) % TextHash.Prime)
    assert(got.getInt(0) == 0 && got.getLong(1) == fold(Seq(1L, 2L)))
    assert(got.getInt(2) == 1 && got.getLong(3) == fold(Seq(3L, 4L)))
  }

  test("simhash: all-identical tokens set every active bit of their hash") {
    // single token hash h: every bit i of the fingerprint equals bit i of h
    // (vote = +1 where bit set, -1 where clear)
    val df = Seq("hello hello hello").toDF("s")
    val h = df.select(TextHash.polyHash(lit("hello"))).head.getLong(0)
    val fp = df.select(
      TextHash.simhash(TextHash.hashAll(TextHash.wordTokens(col("s"))), 24)).head.getLong(0)
    assert(fp == (h & ((1L << 24) - 1)))
  }

  test("bindOnce preserves the bound value") {
    val got = Seq(1).toDF("i")
      .select(TextHash.bindOnce(array(lit(5L), lit(6L)), a => element_at(a, 2)))
      .head.getLong(0)
    assert(got == 6L)
  }
}
