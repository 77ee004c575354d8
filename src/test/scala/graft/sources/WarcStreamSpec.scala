package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming WARC ingest: crawl segments landing under a drop directory
  * become micro-batches of records with exactly the batch scan's decode
  * semantics, exactly-once file accounting across restarts, and
  * per-trigger admission control. */
class WarcStreamSpec extends SparkSpec {

  private val gz = new File("data/warc/crawl.warc.gz").getAbsolutePath
  private val plain = new File("data/warc/crawl.warc").getAbsolutePath

  /** (file tail, record_idx, payload md5) — the identity of every decoded
    * record, file-attributed. */
  private def keys(df: org.apache.spark.sql.DataFrame): Set[(String, Long, String)] =
    df.select(
        element_at(split(col("file"), "/"), -1).as("f"),
        col("record_idx"),
        coalesce(md5(col("payload")), lit("null")).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

  test("drop-by-drop ingest equals the batch scan; restarts are exactly-once") {
    val dir = Files.createTempDirectory("warcdrop")
    val checkpoint = Files.createTempDirectory("warcckpt").toString
    val outDir = Files.createTempDirectory("warcout").toString

    def runOnce(): Unit = {
      val q = graft.streaming.CorpusStream
        .readWarc(spark, dir.toString, maxFilesPerTrigger = 1)
        .writeStream
        .format("parquet").outputMode("append")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    // a stream may start before the first segment lands: empty dir → no rows
    runOnce()
    assert(!new File(outDir).listFiles().exists(_.getName.endsWith(".parquet")) ||
      spark.read.parquet(outDir).count() == 0)

    // day 1: two segments land; maxFilesPerTrigger=1 → two micro-batches
    Files.copy(Paths.get(gz), dir.resolve("seg-00.warc.gz"))
    Files.copy(Paths.get(plain), dir.resolve("seg-01.warc"))
    runOnce()
    val afterDay1 = spark.read.parquet(outDir)
    val expectedOne = spark.read
      .format(classOf[WarcSource].getName).option("path", gz).load()
    assert(afterDay1.count() == 2 * expectedOne.count())
    // batch ≡ streamed, per file: same record identities
    assert(keys(afterDay1) ==
      keys(expectedOne.withColumn("file", lit("seg-00.warc.gz"))) ++
      keys(spark.read.format(classOf[WarcSource].getName).option("path", plain)
        .load().withColumn("file", lit("seg-01.warc"))))

    // restart with nothing new: nothing re-ingested
    runOnce()
    assert(spark.read.parquet(outDir).count() == afterDay1.count())

    // day 2: a third segment lands; only it is appended
    Files.copy(Paths.get(gz), dir.resolve("seg-02.warc.gz"))
    runOnce()
    assert(spark.read.parquet(outDir).count() == 3 * expectedOne.count())
  }

  test("option-seeded record predicates reach the streaming record loop") {
    // Spark's MicroBatchExecution builds streaming scans WITHOUT operator
    // pushdown, so the gate predicates ride reader options instead —
    // non-matching records skip HTTP parsing and payload copies per
    // trigger. The source description in the progress carries the seeds.
    val dir = Files.createTempDirectory("warcdrop2")
    Files.copy(Paths.get(gz), dir.resolve("seg-00.warc.gz"))
    val checkpoint = Files.createTempDirectory("warcckpt2").toString

    val filtered = graft.streaming.CorpusStream.readWarc(spark, dir.toString,
        options = Map("recordType" -> "response", "httpStatus" -> "200"))
      .select(col("target_uri"), col("payload_len"))
    val q = filtered.writeStream
      .format("memory").queryName("warc_stream_pred").outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("warc_stream_pred")
    val want = spark.read.format(classOf[WarcSource].getName)
      .option("path", gz).load()
      .filter(col("record_type") === "response" && col("http_status") === 200)
      .select(col("target_uri"), col("payload_len"))
    assert(got.collect().map(_.toSeq).toSet == want.collect().map(_.toSeq).toSet)
    assert(q.lastProgress.sources.head.description.contains("type=response"))
    assert(q.lastProgress.sources.head.description.contains("status=200"))

    // option-seeded sets also work (and intersect with filters) in batch
    val optBatch = spark.read.format(classOf[WarcSource].getName)
      .option("path", gz).option("recordType", "response")
      .option("httpStatus", "200").load()
      .select(col("target_uri"), col("payload_len"))
    assert(optBatch.collect().map(_.toSeq).toSet ==
      want.collect().map(_.toSeq).toSet)
  }

  test("crawl-to-text composes on the stream (WARC scan -> html kernel)") {
    val dir = Files.createTempDirectory("warcdrop3")
    Files.copy(Paths.get(gz), dir.resolve("seg-00.warc.gz"))
    val checkpoint = Files.createTempDirectory("warcckpt3").toString

    val texts = graft.streaming.CorpusStream.readWarc(spark, dir.toString)
      .filter(col("record_type") === "response" && col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html"))
      .select(col("record_idx"), col("target_uri"),
        graft.functions.GraftHtmlOps.htmlTextCol(col("payload").cast("string")).as("text"))
    val q = texts.writeStream
      .format("memory").queryName("warc_stream_text").outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("warc_stream_text").collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    val exp = spark.read.parquet(new File("data/warc/text_expected.parquet").getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(got == exp)
  }
}
