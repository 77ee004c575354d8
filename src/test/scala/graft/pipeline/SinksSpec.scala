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
