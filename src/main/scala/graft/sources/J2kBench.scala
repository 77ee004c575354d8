package graft.sources

/** Dev probe: single-message J2K decode throughput (not driver contract). */
object J2kBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (f <- args) {
      val df = spark.read.format(classOf[GribSource].getName)
        .option("path", f).load()
      val t0 = System.nanoTime()
      val n = df.filter(org.apache.spark.sql.functions.col("value").isNotNull).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$f: $n cells in $dt%.2f s = ${n / dt / 1e6}%.2f M cells/s")
      // second run warm
      val t1 = System.nanoTime()
      df.agg(org.apache.spark.sql.functions.sum("value")).head
      val dt2 = (System.nanoTime() - t1) / 1e9
      println(f"  warm: $dt2%.2f s = ${n / dt2 / 1e6}%.2f M cells/s")
    }
    spark.stop()
  }
}
