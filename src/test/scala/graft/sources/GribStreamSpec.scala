package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming GRIB ingest: the micro-batch surface of [[GribSource]] — new
  * files under a glob become micro-batches of decoded cells, with exactly
  * the batch scan's decode/NULL semantics and exactly-once file accounting
  * across query restarts (checkpointed file-set offsets). */
class GribStreamSpec extends SparkSpec {

  private val fixture = new File("data/grib/forecast.grib2").getAbsolutePath
  private val expected = new File("data/grib/forecast_expected.parquet").getAbsolutePath

  private def startQuery(dir: String, checkpoint: String, name: String) = {
    val stream = spark.readStream
      .format(classOf[GribSource].getName)
      .option("path", s"$dir/*.grib2")
      .option("numPartitions", "3")
      .load()
    stream.writeStream
      .format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
  }

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getDouble(0), r.getDouble(1), Option(r.get(2)),
      r.getInt(3), r.getLong(4), Option(r.get(5)))).toSet

  test("files arriving across restarts are consumed exactly once, decoded bit-exactly") {
    val dir = Files.createTempDirectory("gribstream")
    val checkpoint = Files.createTempDirectory("gribckpt").toString
    val outDir = Files.createTempDirectory("gribout").toString

    // checkpoint RECOVERY needs a restart-capable sink → parquet, not memory
    def runOnce(): Unit = {
      val q = spark.readStream
        .format(classOf[GribSource].getName)
        .option("path", s"$dir/*.grib2")
        .option("numPartitions", "3")
        .load()
        .writeStream
        .format("parquet").outputMode("append")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    // day 1: one leadtime file lands
    Files.copy(Paths.get(fixture), dir.resolve("lt024.grib2"))
    runOnce()
    assert(spark.read.parquet(outDir).count() == 7L * 48)
    assert(asTuples(spark.read.parquet(outDir)) == asTuples(spark.read.parquet(expected)))

    // day 2: a second file lands; a RESTARTED query (same checkpoint) must
    // append only the new file's rows — the first file is in the offset
    Files.copy(Paths.get(fixture), dir.resolve("lt048.grib2"))
    runOnce()
    assert(spark.read.parquet(outDir).count() == 2L * 7 * 48)

    // and a third run with nothing new appends nothing
    runOnce()
    assert(spark.read.parquet(outDir).count() == 2L * 7 * 48)

    // retention deletes a PROCESSED file: the offset is a monotone union
    // of commit + listing, so the deletion neither re-ingests nor crashes
    // — and a later drop REUSING the name is still considered seen (the
    // files-are-immutable contract; a reused name means the same data)
    Files.delete(dir.resolve("lt024.grib2"))
    runOnce()
    assert(spark.read.parquet(outDir).count() == 2L * 7 * 48)
    Files.copy(Paths.get(fixture), dir.resolve("lt024.grib2"))
    runOnce()
    assert(spark.read.parquet(outDir).count() == 2L * 7 * 48)
  }

  test("an empty directory starts cleanly and emits zero rows") {
    val dir = Files.createTempDirectory("gribstream-empty")
    val checkpoint = Files.createTempDirectory("gribckpt-empty").toString
    val q = startQuery(dir.toString, checkpoint, "grib_stream_empty")
    q.awaitTermination(120000)
    assert(spark.table("grib_stream_empty").count() == 0)
  }

  test("maxFilesPerTrigger drains a backlog in bounded batches under AvailableNow") {
    val dir = Files.createTempDirectory("gribstream-cap")
    val checkpoint = Files.createTempDirectory("gribckpt-cap")
    val outDir = Files.createTempDirectory("gribout-cap").toString
    for (lt <- Seq("024", "048", "072"))
      Files.copy(Paths.get(fixture), dir.resolve(s"lt$lt.grib2"))
    val q = spark.readStream
      .format(classOf[GribSource].getName)
      .option("path", s"$dir/*.grib2")
      .option("numPartitions", "3")
      .option("maxFilesPerTrigger", "1")
      .load()
      .writeStream
      .format("parquet").outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // all three files land, one file per micro-batch (3 committed batches)
    assert(spark.read.parquet(outDir).count() == 3L * 7 * 48)
    val commits = new File(checkpoint.toFile, "commits").list()
      .filterNot(_.startsWith(".")).toSet
    assert(commits == Set("0", "1", "2"), s"expected 3 commits, got $commits")
  }

  test("stream offsets round-trip through their JSON form") {
    val off = GribStreamOffset(42L)
    assert(GribStreamOffset.fromJson(off.json()) == off)
    assert(GribStreamOffset.fromJson(GribStreamOffset(-1L).json()) == GribStreamOffset(-1L))
  }

  test("seen-file log compacts: restart across a compaction boundary, bounded log size") {
    val dir = Files.createTempDirectory("gribstream-compact")
    val checkpoint = Files.createTempDirectory("gribckpt-compact")
    val outDir = Files.createTempDirectory("gribout-compact").toString

    def runOnce(): Unit = {
      val q = spark.readStream
        .format(classOf[GribSource].getName)
        .option("path", s"$dir/*.grib2")
        .option("numPartitions", "3")
        .option("maxFilesPerTrigger", "1")
        .option("fileLogCompactInterval", "2") // compact at batch ids 1, 3, 5, …
        .load()
        .writeStream
        .format("parquet").outputMode("append")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    // run 1: three files, one per batch → batches 0,1,2; compact at 1
    for (lt <- Seq("024", "048", "072"))
      Files.copy(Paths.get(fixture), dir.resolve(s"lt$lt.grib2"))
    runOnce()
    assert(spark.read.parquet(outDir).count() == 3L * 7 * 48)

    // run 2 RESTARTS from a checkpoint whose seen set spans the snapshot
    // at batch 1 plus the delta at 2 — two more files → batches 3
    // (compact), 4; nothing re-ingested
    for (lt <- Seq("096", "120"))
      Files.copy(Paths.get(fixture), dir.resolve(s"lt$lt.grib2"))
    runOnce()
    assert(spark.read.parquet(outDir).count() == 5L * 7 * 48)

    // run 3: nothing new, nothing appended
    runOnce()
    assert(spark.read.parquet(outDir).count() == 5L * 7 * 48)

    // the side-log holds snapshots + recent deltas only: batch 0's delta
    // (superseded by two compactions) is gone, and the engine's offset WAL
    // entries are O(1) — no full file list in any offset file
    val logFiles = new File(checkpoint.toFile + "/sources/0/filelog").list()
      .filterNot(_.startsWith(".")).toSet
    assert(logFiles("3.compact"), s"expected snapshot 3.compact in $logFiles")
    assert(!logFiles("0"), s"expected batch-0 delta cleaned up, got $logFiles")
    val offsetJson = Files.readString(
      checkpoint.resolve("offsets").resolve("4"))
    assert(offsetJson.contains("\"batchId\":4"), s"offset WAL entry was: $offsetJson")
    assert(!offsetJson.contains("lt024"), "offset must not carry file lists")
  }

  test("a changed fileLogCompactInterval cannot reinterpret an existing log") {
    val dir = Files.createTempDirectory("gribstream-ivl")
    val checkpoint = Files.createTempDirectory("gribckpt-ivl")
    val outDir = Files.createTempDirectory("gribout-ivl").toString

    def runOnce(interval: Int): Unit = {
      val q = spark.readStream
        .format(classOf[GribSource].getName)
        .option("path", s"$dir/*.grib2")
        .option("numPartitions", "3")
        .option("maxFilesPerTrigger", "1")
        .option("fileLogCompactInterval", interval.toString)
        .load()
        .writeStream
        .format("parquet").outputMode("append")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    // the log is created with interval 2 (snapshots at batch ids 1, 3, …)
    for (lt <- Seq("024", "048", "072"))
      Files.copy(Paths.get(fixture), dir.resolve(s"lt$lt.grib2"))
    runOnce(interval = 2)
    assert(spark.read.parquet(outDir).count() == 3L * 7 * 48)

    // a restart CONFIGURED with interval 5 must keep reading the layout
    // with the persisted interval 2 (under 5, seenUpTo(4) would look for a
    // snapshot '4.compact' that doesn't exist) — warn-and-ignore, stream
    // lives on, nothing re-ingested, and batch 3 still compacts per the
    // CREATED interval
    for (lt <- Seq("096", "120"))
      Files.copy(Paths.get(fixture), dir.resolve(s"lt$lt.grib2"))
    runOnce(interval = 5)
    assert(spark.read.parquet(outDir).count() == 5L * 7 * 48)
    val logFiles = new File(checkpoint.toFile + "/sources/0/filelog").list()
      .filterNot(_.startsWith(".")).toSet
    assert(logFiles("3.compact"),
      s"expected snapshot 3.compact under the persisted interval, got $logFiles")
  }

  test("maxFileAge ignores files older than the newest drop by more than the age") {
    val dir = Files.createTempDirectory("gribstream-age")
    val checkpoint = Files.createTempDirectory("gribckpt-age").toString
    val outDir = Files.createTempDirectory("gribout-age").toString
    Files.copy(Paths.get(fixture), dir.resolve("stale.grib2"))
    Files.copy(Paths.get(fixture), dir.resolve("fresh.grib2"))
    // stale is 2h older than fresh; maxFileAge=1h → only fresh admitted
    val now = System.currentTimeMillis()
    Files.setLastModifiedTime(dir.resolve("stale.grib2"),
      java.nio.file.attribute.FileTime.fromMillis(now - 2 * 3600 * 1000))
    Files.setLastModifiedTime(dir.resolve("fresh.grib2"),
      java.nio.file.attribute.FileTime.fromMillis(now))
    val q = spark.readStream
      .format(classOf[GribSource].getName)
      .option("path", s"$dir/*.grib2")
      .option("numPartitions", "3")
      .option("maxFileAge", "1h")
      .load()
      .writeStream
      .format("parquet").outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.read.parquet(outDir).count() == 7L * 48) // fresh only
  }

  test("resolveStatuses: vanished paths fail loudly by default, skip under ignoreMissingFiles") {
    val dir = Files.createTempDirectory("gribstream-missing")
    Files.copy(Paths.get(fixture), dir.resolve("present.grib2"))
    val present = dir.resolve("present.grib2").toString
    val gone = dir.resolve("vanished.grib2").toString
    def spec(ignore: Boolean) = GribSpec(s"$dir/*.grib2", 3, 0, 0L, ignore, 10,
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
    val e = intercept[IllegalStateException] {
      GribModel.resolveStatuses(spec(ignore = false), Seq(present, gone))
    }
    assert(e.getMessage.contains("vanished.grib2"))
    val kept = GribModel.resolveStatuses(spec(ignore = true), Seq(present, gone))
    assert(kept.map(_.getPath.getName).toSeq == Seq("present.grib2"))
  }

  test("durations parse with unit suffixes and reject garbage") {
    assert(GribModel.parseDuration("500ms") == 500L)
    assert(GribModel.parseDuration("30s") == 30000L)
    assert(GribModel.parseDuration("45") == 45000L) // bare = seconds
    assert(GribModel.parseDuration("10m") == 600000L)
    assert(GribModel.parseDuration("24h") == 24L * 3600 * 1000)
    assert(GribModel.parseDuration("7d") == 7L * 24 * 3600 * 1000)
    intercept[IllegalArgumentException](GribModel.parseDuration("soon"))
    intercept[IllegalArgumentException](GribModel.parseDuration("-5s"))
  }

  test("raw-GRIB alerting path: decode → normalize → threshold flags, no parquet hop") {
    import graft.streaming.ForecastStream
    val dir = Files.createTempDirectory("gribstream-alert")
    val checkpoint = Files.createTempDirectory("gribckpt-alert").toString
    Files.copy(Paths.get(fixture), dir.resolve("lt024.grib2"))
    // static threshold side: one known cell set low (everything exceeds),
    // everywhere else unmatched (left join → flags 0)
    import spark.implicits._
    val thresholds = Seq((17.975, -17.925, 0.1, 0.2, 1.0e9))
      .toDF("latitude", "longitude", "threshold_2y", "threshold_5y", "threshold_20y")
    val q = ForecastStream.gribExceedances(
      ForecastStream.readGrib(spark, s"$dir/*.grib2", numPartitions = 3), thresholds)
      .writeStream
      .format("memory").queryName("grib_alerts").outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("grib_alerts")
    // normalization applied: bitmap-missing cells dropped, day steps
    assert(out.count() == 7L * 48 - 3)
    assert(out.select("step").distinct().collect().map(_.getInt(0)).toSet == Set(1, 2))
    // the low-threshold cell flags 2y/5y exceedance but not the huge 20y
    val flagged = out.filter(col("latitude") === 17.975 && col("longitude") === -17.925)
    assert(flagged.count() == 7) // all messages cover this cell
    assert(flagged.filter(col("exceed_2y") === 1).count() == 7)
    assert(flagged.filter(col("exceed_20y") === 1).count() == 0)
    // unmatched cells: flags present and zero (left join semantics)
    assert(out.filter(col("exceed_2y") === 1).count() == 7)
  }

  test("E1 alert stream over a full day with a mid-run kill: restart drains the " +
    "backlog, output == batch run, exactly once") {
    import graft.streaming.ForecastStream
    import graft.transforms.Normalize
    import spark.implicits._
    val dir = Files.createTempDirectory("gribstream-e1")
    val checkpoint = Files.createTempDirectory("gribckpt-e1")
    val outDir = Files.createTempDirectory("gribout-e1").toString
    // six leadtime drops — the operational day shape in miniature
    for (lt <- Seq("024", "048", "072", "096", "120", "144"))
      Files.copy(Paths.get(fixture), dir.resolve(s"lt$lt.grib2"))
    val thresholds = Seq(
      (17.975, -17.925, 0.1, 0.2, 1.0e9),
      (17.975, -17.875, 50.0, 100.0, 200.0))
      .toDF("latitude", "longitude", "threshold_2y", "threshold_5y", "threshold_20y")

    def startQuery() = ForecastStream.gribExceedances(
        ForecastStream.readGrib(spark, s"$dir/*.grib2", numPartitions = 3,
          maxFilesPerTrigger = 1), thresholds)
      .writeStream
      .format("parquet").outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint.toString)
      .trigger(Trigger.AvailableNow()).start()

    // the first attempt is KILLED as soon as its first batch commits —
    // mid-run, with most of the day still pending (one file per trigger)
    val q1 = startQuery()
    val firstCommit = new File(checkpoint.toFile, "commits/0")
    val deadline = System.currentTimeMillis() + 60000
    while (!firstCommit.exists() && System.currentTimeMillis() < deadline)
      Thread.sleep(25)
    assert(firstCommit.exists(), "first batch never committed")
    q1.stop()
    q1.awaitTermination()

    // a restart from the same checkpoint must drain exactly the remainder
    val q2 = startQuery()
    q2.awaitTermination(120000)
    val commits = new File(checkpoint.toFile, "commits").list()
      .filterNot(_.startsWith(".")).map(_.toInt).toSet
    assert(commits == (0 to 5).toSet, s"expected 6 committed batches, got $commits")

    // batch reference: the same glob through the BATCH scan and the same
    // normalize → broadcast threshold join → indicator chain
    val batchGrib = spark.read.format(classOf[GribSource].getName)
      .option("path", s"$dir/*.grib2").option("numPartitions", "3").load()
    val batch = Seq(2, 5, 20).foldLeft(
      Normalize.fromGrib(batchGrib, 3)
        .join(broadcast(Normalize.roundKeys(thresholds, 3)),
          Seq("latitude", "longitude"), "left")) { (df, n) =>
      df.withColumn(s"exceed_${n}y",
        when(col("dis24") >= col(s"threshold_${n}y"), 1).otherwise(0))
    }
    // multiset equality (the six identical drops make legitimate duplicate
    // rows, so a set compare would mask double-ingestion — exceptAll both
    // ways catches dupes AND losses across the kill/restart boundary)
    val streamed = spark.read.parquet(outDir) // reads via _spark_metadata:
    // any orphan part-file from the killed attempt is invisible
    val cols = batch.columns.map(col).toSeq
    assert(streamed.count() == 6L * (7 * 48 - 3)) // bitmap-missing cells dropped
    assert(streamed.select(cols: _*).exceptAll(batch.select(cols: _*)).isEmpty &&
      batch.select(cols: _*).exceptAll(streamed.select(cols: _*)).isEmpty)
  }

  test("downstream transforms run per micro-batch (member filter + aggregation)") {
    val dir = Files.createTempDirectory("gribstream-agg")
    val checkpoint = Files.createTempDirectory("gribckpt-agg").toString
    Files.copy(Paths.get(fixture), dir.resolve("lt024.grib2"),
      StandardCopyOption.REPLACE_EXISTING)
    val stream = spark.readStream
      .format(classOf[GribSource].getName)
      .option("path", s"$dir/*.grib2")
      .option("numPartitions", "3")
      .load()
      .filter(col("number").isNotNull && col("step_hours") === 24)
      .groupBy("latitude", "longitude")
      .agg(count(lit(1)).as("members"))
    val q = stream.writeStream
      .format("memory").queryName("grib_stream_agg").outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("grib_stream_agg").collect()
    assert(rows.length == 48) // 6x8 grid
    assert(rows.forall(_.getLong(2) == 3L)) // 3 perturbed members at step 24
  }
}
