package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitioned lays out hive partitions, overwrites only present ones, and prunes reads") {
    val dir = Files.createTempDirectory("part-sink").toString
    val day1 = Seq((1L, "2023-10-01", 5.0), (2L, "2023-10-01", 6.0)).toDF("id", "issued_on", "v")
    val day2 = Seq((3L, "2023-10-02", 7.0)).toDF("id", "issued_on", "v")
    Sinks.writePartitioned(day1.union(day2), dir, Seq("issued_on"))
    assert(new java.io.File(s"$dir/issued_on=2023-10-01").isDirectory)
    assert(new java.io.File(s"$dir/issued_on=2023-10-02").isDirectory)

    // dynamic overwrite: rewriting day2 must not truncate day1
    val day2v2 = Seq((4L, "2023-10-02", 8.0)).toDF("id", "issued_on", "v")
    Sinks.writePartitioned(day2v2, dir, Seq("issued_on"))
    val all = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 4L))

    // partition pruning: the filtered scan reads only the matching dir
    val scan = spark.read.parquet(dir).filter(col("issued_on") === "2023-10-02")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("issued_on"))
    assert(scan.select("id").as[Long].collect().toSet == Set(4L))
  }

  test("writeZOrdered prunes a bbox read to a fraction of the row groups a lat-sort reads") {
    // 120×120 grid of 0.05° cells (toy extent of the GloFAS grid), tiny
    // parquet row groups so one file holds MANY groups with min/max stats
    // — the pruning unit the Morton layout exists to serve. The same data
    // is written plain-(lat,lon)-sorted (the reference's layout) and
    // Z-ordered; a small centered bbox must scan far fewer post-pruning
    // rows from the Z-ordered copy (a lat-sort clusters only latitude, so
    // every matching-lat row group straddles ALL longitudes and survives
    // pruning).
    val n = 120
    val cells = spark.range(n.toLong * n).select(
      round(lit(-3.0) + floor(col("id") / n) * 0.05 + 0.025, 3).as("latitude"),
      round(lit(25.0) + (col("id") % n) * 0.05 + 0.025, 3).as("longitude"),
      (col("id") % 97).cast("double").as("v"))

    val zDir = Files.createTempDirectory("z-sink").toString
    val latDir = Files.createTempDirectory("lat-sink").toString
    // fine-grained row groups so the layout difference is measurable:
    // dictionary encoding off (it makes the writer's in-memory size
    // estimate lag, inflating groups far past the requested block size)
    val tinyGroups = Map(
      "parquet.block.size" -> (8 * 1024).toString,
      "parquet.page.size" -> (1024).toString,
      "parquet.enable.dictionary" -> "false")
    Sinks.writeZOrdered(cells.coalesce(1), zDir, options = tinyGroups)
    cells.coalesce(1).orderBy("latitude", "longitude")
      .write.mode("overwrite").options(tinyGroups).parquet(latDir)

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case s: QueryStageExec => flatten(s.plan)
      case other => other.children.flatMap(flatten)
    })
    def scannedRows(dir: String): Long = {
      val bbox = spark.read.parquet(dir)
        .filter(col("latitude").between(-0.4, 0.4) &&
          col("longitude").between(27.8, 28.6))
      assert(bbox.collect().length === 16 * 16) // correctness first: 16×16 cells
      val scans = flatten(bbox.queryExecution.executedPlan)
        .collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty)
      scans.map(_.metrics("numOutputRows").value).sum
    }

    val fromZ = scannedRows(zDir)
    val fromLat = scannedRows(latDir)
    val total = n.toLong * n
    assert(fromZ < fromLat,
      s"z-order scanned $fromZ rows, lat-sort scanned $fromLat — no pruning win")
    assert(fromZ < total / 4,
      s"z-order scanned $fromZ of $total rows — row groups not pruned")
  }

  test("writePartitionedZOrdered keeps the hive layout and the dynamic overwrite contract") {
    val dir = Files.createTempDirectory("pz-sink").toString
    def day(d: String, base: Long) = spark.range(base, base + 100).select(
      round(lit(-3.0) + floor(col("id") % 100 / 10) * 0.05 + 0.025, 3).as("latitude"),
      round(lit(25.0) + (col("id") % 10) * 0.05 + 0.025, 3).as("longitude"),
      col("id"),
      lit(d).as("issued_on"))
    Sinks.writePartitionedZOrdered(day("2023-10-01", 0).union(day("2023-10-02", 100)),
      dir, Seq("issued_on"))
    assert(new java.io.File(s"$dir/issued_on=2023-10-01").isDirectory)
    // dynamic overwrite: rewriting day 2 must not touch day 1
    Sinks.writePartitionedZOrdered(day("2023-10-02", 500), dir, Seq("issued_on"))
    val ids = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    assert(ids === ((0L until 100L) ++ (500L until 600L)).toSet)

    // and the per-file LOCAL z-sort holds inside every written file: the
    // derived z key must be non-decreasing in file row order (this is
    // exactly the property row-group min/max pruning feeds on — no
    // shuffle was allowed to produce it, so assert it really happened)
    import graft.transforms.Geometry
    new java.io.File(s"$dir/issued_on=2023-10-02").listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach { f =>
        val z = spark.read.parquet(f.getAbsolutePath).select(
          Geometry.zOrder(
            Geometry.cellIndex(col("latitude"), 90, 50),
            Geometry.cellIndex(col("longitude"), 180, 50)).as("z"))
          .collect().map(_.getLong(0))
        assert(z.sameElements(z.sorted), s"file ${f.getName} not z-sorted")
      }
  }

  test("writeJdbc round-trips through a real embedded JDBC database (Derby)") {
    // Derby ships on Spark's unmanaged classpath, so this exercises the
    // full E2E path — connection, DDL (Overwrite = drop+create), batched
    // INSERTs, read-back — not just writer composition. In-memory DB:
    // local-mode executors share the JVM, so every write task sees it.
    val url = "jdbc:derby:memory:graftSinks;create=true"
    // VARCHAR override: Derby's dialect maps StringType to CLOB, which
    // can't be compared/pushed-down on read-back
    val cfg = Sinks.JdbcConfig(url = url, table = "forecast_out",
      user = "graft", password = "", numPartitions = 2, batchSize = 2,
      createTableColumnTypes = Some("issued_on VARCHAR(10)"))
    val df = Seq((1L, "2023-10-01", 5.0), (2L, "2023-10-01", 6.0),
      (3L, "2023-10-02", 7.5)).toDF("id", "issued_on", "v")
    Sinks.writeJdbc(df, cfg)
    // Overwrite mode must replace, not append, on re-run
    Sinks.writeJdbc(df, cfg)

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", cfg.table)
      .option("user", cfg.user).option("password", cfg.password)
      .load()
    assert(back.count() == 3)
    assert(back.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(back.filter(col("issued_on") === "2023-10-02")
      .select("v").as[Double].collect().toSeq == Seq(7.5))
  }
}
