package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC source: checked against the COMMITTED python-generated fixture
  * (`tools/make_warc_fixture.py` writes the bytes from the public ISO
  * 28500 + RFC 9112 specs — an implementation independent of the Scala
  * reader). 13 records: warcinfo, request, seven responses (identity /
  * chunked / gzip / chunked+gzip / zlib-deflate / raw-deflate /
  * plain-text / 404), metadata, revisit, resource; one record with an
  * LWS-folded header; the `.gz` twin is record-per-member. A separate
  * `unsupported_ce.warc` carries a brotli response the reader must
  * reject loudly. */
class WarcSourceSpec extends SparkSpec {

  private val gz = new File("data/warc/crawl.warc.gz").getAbsolutePath
  private val plain = new File("data/warc/crawl.warc").getAbsolutePath
  private val expected = new File("data/warc/records_expected.parquet").getAbsolutePath

  private def warc(path: String) = spark.read
    .format(classOf[WarcSource].getName)
    .option("path", path)
    .load()

  private val projection = Seq(
    col("record_idx"), col("offset"), col("record_type"), col("record_id"),
    col("target_uri"), col("warc_date"), col("content_type"),
    col("content_length"), col("http_status"), col("http_content_type"),
    col("payload_len"), md5(col("payload")).as("payload_md5"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("gz scan matches the independent python parse record-for-record") {
    val got = warc(gz).select(projection: _*)
    val exp = spark.read.parquet(expected)
    assert(got.columns.toSeq == exp.columns.toSeq)
    assert(rows(got) == rows(exp))
    assert(got.count() == 13)
  }

  test("plain .warc parses identically to the record-per-member .gz") {
    assert(rows(warc(plain).select(projection: _*)) ==
      rows(warc(gz).select(projection: _*)))
  }

  test("http bodies are de-chunked and content-decoded (payload digests)") {
    val exp = spark.read.parquet(expected)
      .filter(col("http_status") === 200)
      .select("target_uri", "payload_len", "payload_md5")
    val got = warc(gz)
      .filter(col("http_status") === 200)
      .select(col("target_uri"), col("payload_len"),
        md5(col("payload")).as("payload_md5"))
    assert(rows(got) == rows(exp))
    // the chunked+gzip page decodes to readable HTML
    val p4 = warc(gz).filter(col("target_uri") === "http://example.org/page4")
      .filter(col("record_type") === "response")
      .select(col("payload").cast("string")).head.getString(0)
    assert(p4.contains("<h2>Chunked + gzip</h2>"))
  }

  test("record_type/http_status predicates are pushed into the scan") {
    val df = warc(gz)
      .filter(col("record_type") === "response" && col("http_status") === 200)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("type=response"), s"pushdown missing:\n$plan")
    assert(plan.contains("status=200"), s"pushdown missing:\n$plan")
    assert(df.count() == 7)
  }

  test("column pruning reaches the reader (metadata scan omits payload)") {
    val meta = warc(gz).select("record_idx", "record_type", "content_length")
    val plan = meta.queryExecution.executedPlan.toString
    assert(plan.contains("cols=record_idx,record_type,content_length"),
      s"pruning missing:\n$plan")
    assert(meta.count() == 13)
  }

  test("a directory input plans one partition per file") {
    val dir = new File("data/warc").getAbsolutePath
    val df = warc(dir)
    assert(df.rdd.getNumPartitions == 3) // crawl.warc + .gz twin + unsupported_ce.warc
    assert(df.count() == 27)
  }

  test("deflate bodies decode under both wrappings (zlib and raw)") {
    def page(uri: String): String =
      warc(gz).filter(col("target_uri") === uri &&
          col("record_type") === "response")
        .select(col("payload").cast("string")).head.getString(0)
    assert(page("http://example.org/page5").contains("<h2>Deflate page</h2>"))
    assert(page("http://example.org/page6").contains("<h2>Raw deflate page</h2>"))
  }

  test("an unsupported Content-Encoding rejects loudly on payload access") {
    val br = new File("data/warc/unsupported_ce.warc").getAbsolutePath
    // metadata-only scan never parses HTTP: must succeed
    assert(warc(br).select("record_idx", "record_type").count() == 1)
    // content_encoding surfaces the coding WITHOUT decoding — the
    // quantify-before-reject pass a real crawl needs for brotli triage
    val encs = warc(br).select("content_encoding").collect().map(_.getString(0))
    assert(encs.toSeq == Seq("br"), s"got ${encs.mkString(",")}")
    // materializing the body must fail naming the coding, never emit
    // still-compressed bytes as a decoded payload
    val e = intercept[Exception] {
      warc(br).select(md5(col("payload"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("unsupported Content-Encoding 'br'")), s"got: $e")
  }

  test("truncated input is rejected loudly, not misparsed") {
    val bytes = Files.readAllBytes(Paths.get(plain))
    val tmp = Files.createTempFile("graft_warc_trunc", ".warc")
    Files.write(tmp, java.util.Arrays.copyOfRange(bytes, 0, bytes.length / 2))
    val e = intercept[Exception] {
      warc(tmp.toString).select(projection: _*).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("WarcSource") || m.contains("truncated")),
      s"unexpected failure shape: $e")
  }
}
