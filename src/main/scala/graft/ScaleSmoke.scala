package graft

import graft.config.FloodConfig
import graft.pipeline.{ForecastPipeline, Sinks}
import graft.queries.FloodShaped
import graft.transforms.ThresholdPercentages
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full-size E1 smoke (dev tool, not part of the driver contract): the
  * whole daily pipeline — flood-shaped inputs → threshold percentages →
  * control join → summary → geometry → relevance filter → partitioned
  * parquet sinks — at whatever SF `SPARK_GRAFT_SF_DIR` points to, in the
  * production configuration (Approx percentile mode, AQE partition
  * planning). Prints stage row counts and wall time; any stage failing or
  * returning zero rows exits nonzero. This is the "would the operational
  * job run end to end at scale" check, distinct from the per-operator
  * correctness gate (sf0.01 DuckDB hashes) and the bench (min-of-3
  * timings). */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outDir = java.nio.file.Files.createTempDirectory("e1smoke").toString
    val t0 = System.nanoTime()
    val out = ForecastPipeline.run(
      FloodShaped.forecast(spark, sfDir),
      FloodShaped.thresholds(spark, sfDir),
      FloodConfig(),
      mode = ThresholdPercentages.Approx) // the 100 TB default: sketches
    // both outputs written the way the daily job writes them: detailed
    // partitioned by issue date (hive layout), summary flat
    Sinks.writePartitioned(
      out.detailed.withColumn("issued_on", col("issued_on").cast("string")),
      s"$outDir/detailed", Seq("issued_on"))
    out.summary.write.mode("overwrite").parquet(s"$outDir/summary")
    out.release()
    val detailedRows = spark.read.parquet(s"$outDir/detailed").count()
    val summaryRows = spark.read.parquet(s"$outDir/summary").count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"E1 @ $sfDir: detailed=$detailedRows rows, summary=$summaryRows rows, ${secs}%.2f s")
    spark.stop()
    require(detailedRows > 0 && summaryRows > 0, "E1 smoke produced an empty output")
  }
}
