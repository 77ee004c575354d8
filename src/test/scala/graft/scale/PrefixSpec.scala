package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-phase distributed prefix sum: correctness vs the single-partition
  * window, and plan independence from partition-boundary placement. */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("matches the global-window running total on shuffled input") {
    val df = spark.range(0, 1000).select(
      col("id").as("k"), (pmod(col("id") * 37 + 11, lit(100)) + 1).as("v"))
      .repartition(13) // scatter input so range partitioning has to work
    val got = Prefix.exclusiveRunningTotal(df, "k", "v", "run", numPartitions = 7)
      .select("k", "run").as[(Long, Long)].collect().toMap
    val sorted = df.select("k", "v").as[(Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    val expected = sorted.map { case (k, v) => val r = k -> acc; acc += v; r }.toMap
    assert(got == expected)
    assert(got(0L) == 0L) // first row: exclusive total is zero
  }

  test("partition count does not change values") {
    val df = spark.range(0, 500).select(col("id").as("k"), lit(3L).as("v"))
    val a = Prefix.exclusiveRunningTotal(df, "k", "v", "run", numPartitions = 3)
      .select("k", "run").as[(Long, Long)].collect().toMap
    val b = Prefix.exclusiveRunningTotal(df, "k", "v", "run", numPartitions = 17)
      .select("k", "run").as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a(499L) == 499L * 3)
  }

  test("sequenceSpans: contiguous offsets, exact span arithmetic") {
    val docs = Seq(
      (1L, "a b c"), // 3 tokens, offset 0, seq 0
      (2L, Seq.fill(130)("t").mkString(" ")), // 130 tokens, offset 3, seqs 0-1
      (3L, "x y")) // offset 133, seq 1
      .toDF("doc_id", "text")
    val out = graft.llm.Packing.sequenceSpans(docs, "doc_id", "text", seqLen = 128)
      .select("doc_id", "n_tokens", "start_offset", "first_seq", "last_seq", "n_seqs")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(out == List(
      (1L, 3L, 0L, 0L, 0L, 1L),
      (2L, 130L, 3L, 0L, 1L, 2L),
      (3L, 2L, 133L, 1L, 1L, 1L)))
  }
}
