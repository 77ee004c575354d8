package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: per-query timing breakdown for the bench's slowest registry
  * entries (not part of the driver contract). Pass query names as args;
  * with no args, times the historical slow set. `EXPLAIN=1` prints the
  * formatted physical plan after the timed runs. */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_detailed_control", "q_detailed_restricted", "q_pair_vocabulary",
        "q_roi_slice", "q_curate", "q_retention", "q_dedup_clusters",
        "q_events_hopping", "q_peak_timing")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val a = once(); val b = once()
      println(f"$name%-26s run1=$a%6.2f s  run2=$b%6.2f s")
      if (sys.env.contains("EXPLAIN")) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
