package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.CorpusStream

/** Dev tool: drop-by-drop soak for the streaming near-dup gate (not part
  * of the driver contract). Splits a documents table into id-range drops
  * (the arrival order of a crawl), lands them as a file-source stream,
  * and drains through [[CorpusStream.nearDupGateSink]] one file per
  * trigger — so every batch pays the real cost profile: in-batch LSH
  * clustering plus the bipartite join against the signature store of all
  * previously kept documents, with the store growing across batches.
  *
  * Prints wall, per-batch drain rate, kept/total docs, and the signature
  * store's row count and byte size (the thing that must stay ~0.5 KB/doc
  * for the 100 TB posture to hold).
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.GateSoak
  *     /root/testdata/sf0.1/documents.parquet /tmp/gate_soak 10'
  */
object GateSoak {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GateSoak <documentsParquet> <workDir> [nDrops]")
    val docsPath = args(0)
    val work = args(1)
    val nDrops = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(docsPath)
    val (minId, maxId, total) = {
      val r = docs.agg(min("doc_id"), max("doc_id"), count(lit(1))).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val span = (maxId - minId + nDrops) / nDrops
    val dropDir = s"$work/drops"
    for (i <- 0 until nDrops) {
      docs.filter(col("doc_id").between(minId + i * span, minId + (i + 1) * span - 1))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$work/stage_$i")
      val staged = Files.list(java.nio.file.Paths.get(s"$work/stage_$i")).toArray
        .map(_.toString).filter(_.endsWith(".parquet"))
      Files.createDirectories(java.nio.file.Paths.get(dropDir))
      Files.move(java.nio.file.Paths.get(staged.head),
        java.nio.file.Paths.get(f"$dropDir/drop_$i%03d.parquet"))
    }
    println(s"staged $nDrops drops of ~$span docs ($total total, ids $minId..$maxId)")

    val corpus = s"$work/corpus"
    val store = s"$work/store"
    val ckpt = s"$work/ckpt"
    val stream = spark.readStream.schema(CorpusStream.documentsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dropDir)
    val t0 = System.nanoTime()
    val q = CorpusStream.nearDupGateSink(stream, corpus, store, ckpt).start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9

    val kept = CorpusStream.readKept(spark, corpus).count()
    val storeRows = spark.read.parquet(store).count()
    val storeBytes = Files.walk(java.nio.file.Paths.get(store)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(Files.size).sum
    println(f"GATE SOAK: $nDrops drops, $total docs -> $kept kept " +
      f"(${total - kept} near-dups gated), wall $wall%.1f s " +
      f"(${wall / nDrops}%.2f s/drop), store $storeRows rows / " +
      f"${storeBytes / 1024} KB (${storeBytes.toDouble / math.max(1, storeRows)}%.0f B/doc)")
    spark.stop()
  }
}
