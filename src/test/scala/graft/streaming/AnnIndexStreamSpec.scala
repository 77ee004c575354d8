package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.llm.{Pq, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming IVF-PQ index maintenance: the streamed cell-partitioned
  * store must answer searches bit-identically to a direct batch encode
  * of the same vectors, replay must be idempotent, and probes must
  * partition-prune to the probed cells. */
class AnnIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def vecs(from: Int, until: Int): DataFrame =
    spark.range(from, until).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        i => (pmod(abs(xxhash64(col("id"), i)), lit(1000L)) / 250.0 - 2.0)
          .cast("float")).as("embedding"))

  private val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  test("streamed index == direct encode; search agrees; replay idempotent; probes prune") {
    val all = vecs(0, 160)
    val (coarse, pq) = Pq.ivfPqTrain(all, "vec_id", "embedding", dim,
      cells = 4, m = 2, k = 4)

    val root = Files.createTempDirectory("ann-index")
    val dropDir = s"$root/drops"
    val indexPath = s"$root/index"
    val checkpoint = s"$root/ckpt"
    new java.io.File(dropDir).mkdirs()

    def land(df: DataFrame, name: String): Unit = {
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(dropDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach(f => fs.rename(f.getPath,
          new org.apache.hadoop.fs.Path(s"$dropDir/$name.parquet")))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }

    land(vecs(0, 90), "drop0")
    val stream = spark.readStream.schema(embeddingsSchema).parquet(dropDir)
    CorpusStream.annIndexSink(stream, indexPath, checkpoint, coarse, pq)
      .start().awaitTermination(120000)

    // second drop; AvailableNow catches up from the checkpoint
    land(vecs(90, 160), "drop1")
    CorpusStream.annIndexSink(stream, indexPath, checkpoint, coarse, pq)
      .start().awaitTermination(120000)

    val index = CorpusStream.readAnnIndex(spark, indexPath)
    val direct = Pq.ivfPqEncode(all, "vec_id", "embedding", coarse, pq)
    val cols = direct.columns.toSeq // vec_id, cell, __c0, __c1
    def rows(df: DataFrame) =
      df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
    assert(rows(index) == rows(direct),
      "streamed index must hold exactly the direct batch encode")

    // search over the streamed store == direct search over the vectors
    val query = all.filter(col("vec_id") === 3L)
      .select(Similarity.asDouble(col("embedding"))).head.getSeq[Double](0).toArray
    val viaIndex = Pq.ivfPqSearchOverIndex(index, coarse, pq, query,
      nProbes = 2, topK = 10).collect().map(_.toString).toSeq
    val directSearch = Pq.ivfPqSearch(all, "vec_id", "embedding", coarse, pq,
      query, nProbes = 2, topK = 10).collect().map(_.toString).toSeq
    assert(viaIndex == directSearch)

    // crash-replay of an already-committed batch rewrites, not duplicates
    CorpusStream.annIndexBatch(vecs(0, 90), 0L, indexPath, coarse, pq)
    assert(rows(CorpusStream.readAnnIndex(spark, indexPath)) == rows(direct),
      "replaying batch 0 must be idempotent")

    // probes partition-prune on cell across every batch directory
    val plan = Pq.ivfPqSearchOverIndex(index, coarse, pq, query,
      nProbes = 1, topK = 5).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters:\n$plan")
    val pruned = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(pruned.exists(_.contains("cell")),
      s"cell not in partition filters: $pruned")
  }
}
