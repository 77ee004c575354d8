package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, InputStream}
import java.util
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSourceV2: WARC web-crawl archives (ISO 28500 / WARC 1.1 —
  * the CommonCrawl container, the de-facto raw input of large-scale LLM
  * training-data pipelines) as a TABLE.
  *
  * One row per WARC record. For `response` records the HTTP/1.1 message
  * in the block is parsed (RFC 9112): status line, headers, then the body
  * is de-chunked (`Transfer-Encoding: chunked`, incl. chunk extensions
  * and trailers) and content-decoded (`Content-Encoding: gzip`/`x-gzip`,
  * `deflate` — zlib or raw — and `identity`; anything else, e.g. `br`,
  * rejects loudly) — so `payload` is the bytes a text-extraction stage
  * actually wants, not the wire framing. Other record types carry their
  * raw block as `payload`. The `content_encoding` column surfaces the raw
  * (normalized) Content-Encoding header WITHOUT decoding, so a
  * metadata-only pass can quantify e.g. brotli prevalence in a crawl —
  * and filter those records — before any payload projection would hit
  * the loud reject.
  *
  * Scale posture (100 TB = a CommonCrawl-sized corpus):
  *  - the parallel unit is the FILE — crawls ship as ~1 GB `.warc.gz`
  *    files in the tens of thousands, so file-granular partitions keep
  *    every executor busy without splitting inside a compression stream.
  *    `.gz` members are record-per-member (the ISO 28500 annex layout)
  *    but a member index (CDX) is external metadata; this scan streams
  *    each file once, sequentially — the I/O-optimal access for a full
  *    pass, which is what a curation pipeline does.
  *  - `record_type` / `http_status` equality predicates are pushed into
  *    the reader: non-matching records are skipped without HTTP parsing
  *    or payload materialization (the bytes still stream past — that is
  *    inherent to gzip — but nothing is decoded, copied, or emitted).
  *    The same predicates are accepted as reader options
  *    (`recordType`/`httpStatus`, csv) because micro-batch STREAMING
  *    scans get no Catalyst pushdown from the engine.
  *  - column pruning is pushed: a metadata-only scan (no `payload`)
  *    never de-chunks, never gunzips, and never copies a body.
  *
  * Malformed input is rejected loudly (bad version line, missing
  * Content-Length, truncated block) — never silently dropped or
  * misparsed, same discipline as [[GribSource]]/[[NetcdfSource]].
  *
  * Reference context: the flood reference ingests curated GRIB/NetCDF
  * drops and has no crawl path; this source is part of the LLM-pipeline
  * surface the engine adds on top (SURVEY §2.11).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.WarcSource")
  *   .option("path", "/crawl/segment-00/")   // file, dir, or glob
  *   .load()
  * }}}
  */
class WarcSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WarcSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(new CaseInsensitiveStringMap(properties))
}

object WarcSource {
  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_idx", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("record_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("content_encoding", StringType, nullable = true),
    StructField("payload_len", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  private[sources] def pathOf(o: CaseInsensitiveStringMap): String =
    Option(o.get("path")).getOrElse(
      throw new IllegalArgumentException("WarcSource requires option 'path'"))

  /** List the WARC files under a file/dir/glob with modification times.
    * Tolerant of nothing-there-yet (a STREAM legitimately starts against
    * an empty or not-yet-created drop directory). */
  private[sources] def listWarc(
      path: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val statuses =
      if (path.exists("*?[{".contains(_)))
        Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      else if (!fs.exists(p)) Nil
      else {
        val st = fs.getFileStatus(p)
        if (st.isDirectory)
          fs.listStatus(p).toSeq.filter(s => isWarc(s.getPath.getName))
        else Seq(st)
      }
    statuses.filter(_.isFile)
      .map(s => (s.getPath.toString, s.getModificationTime))
      .sortBy(_._1)
  }

  private[sources] def resolveFiles(o: CaseInsensitiveStringMap): Seq[String] = {
    val path = pathOf(o)
    val files = listWarc(path, HadoopConf.session()).map(_._1)
    require(files.nonEmpty, s"WarcSource: no .warc/.warc.gz files under $path")
    files
  }

  private def isWarc(name: String): Boolean =
    name.endsWith(".warc") || name.endsWith(".warc.gz")
}

private class WarcTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"warc(${WarcSource.pathOf(options)})"
  override def schema(): StructType = WarcSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(options)
}

/** Pushes `record_type` / `http_status` equality (and In) predicates into
  * the record loop, and column pruning into the HTTP-decode step.
  *
  * The same predicates are ALSO accepted as reader OPTIONS
  * (`recordType` / `httpStatus`, csv for a set) because Spark's
  * micro-batch execution builds streaming scans without operator pushdown
  * (`MicroBatchExecution` calls `newScanBuilder(options).build()`
  * directly — confirmed against Spark 4.1) — a streaming curation gate
  * sets the options so non-matching records still skip HTTP parsing and
  * payload materialization per trigger. Catalyst filters INTERSECT with
  * option-seeded sets, so using both stays correct. */
private class WarcScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = WarcSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var typeIn: Option[Set[String]] =
    Option(options.get("recordType"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
  private var statusIn: Option[Set[Int]] =
    Option(options.get("httpStatus"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).map(_.toInt).toSet)

  private def applyOne(f: Filter): Boolean = f match {
    case EqualTo("record_type", v: String) =>
      typeIn = Some(typeIn.fold(Set(v))(_ intersect Set(v))); true
    case In("record_type", vs) if vs.forall(_.isInstanceOf[String]) =>
      val s = vs.map(_.asInstanceOf[String]).toSet
      typeIn = Some(typeIn.fold(s)(_ intersect s)); true
    case EqualTo("http_status", v: Integer) =>
      statusIn = Some(statusIn.fold(Set(v.intValue))(_ intersect Set(v.intValue))); true
    case In("http_status", vs) if vs.forall(_.isInstanceOf[Integer]) =>
      val s = vs.map(_.asInstanceOf[Integer].intValue).toSet
      statusIn = Some(statusIn.fold(s)(_ intersect s)); true
    case IsNotNull(_) => false // cheap post-filter; keep the pushdown list honest
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition(applyOne)
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new WarcScan(options, required, typeIn, statusIn)
}

private class WarcScan(
    options: CaseInsensitiveStringMap,
    required: StructType,
    typeIn: Option[Set[String]],
    statusIn: Option[Set[Int]])
  extends Scan with Batch {

  /** Batch file listing — lazy so a STREAMING scan (which lists per
    * micro-batch) never requires the drop directory to be non-empty at
    * query start. */
  private lazy val files: Seq[String] = WarcSource.resolveFiles(options)
  @volatile private var streaming = false

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val t = typeIn.fold("*")(_.mkString("|"))
    val s = statusIn.fold("*")(_.mkString("|"))
    val src = if (streaming) WarcSource.pathOf(options) else s"${files.length} files"
    s"WarcScan($src, type=$t, status=$s, cols=${required.fieldNames.mkString(",")})"
  }
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => WarcPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, typeIn, statusIn, new SerializableHadoopConf(HadoopConf.session()))

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    streaming = true
    new WarcMicroBatchStream(
      WarcSource.pathOf(options),
      maxFilesPerTrigger = options.getInt("maxFilesPerTrigger", 0),
      compactInterval = options.getInt("fileLogCompactInterval", 10),
      required, typeIn, statusIn,
      new SerializableHadoopConf(HadoopConf.session()),
      checkpointLocation)
  }
}

/** Micro-batch WARC stream over a drop directory/glob — "crawl segments
  * land, curation gates run": the 100 TB operating mode where tens of
  * thousands of ~1 GB `.warc.gz` files arrive over days and each trigger
  * ingests only the new ones.
  *
  * Same design as [[GribMicroBatchStream]], and it REUSES the same
  * building blocks: the checkpointed offset is a plain batch id
  * ([[GribStreamOffset]]) and the per-batch file sets live in a compacted
  * seen-file side-log ([[GribFileLog]]) under the stream's checkpoint —
  * the engine's offset WAL stays O(1) per entry for the stream's
  * lifetime. Files are immutable once dropped (crawlers write-then-
  * rename); the seen set is append-only. Admission control honors
  * `maxFilesPerTrigger`; `Trigger.AvailableNow` freezes the listing at
  * query start for catch-up-then-stop runs. Each admitted file becomes
  * one input partition read by the identical executor path as the batch
  * scan — pushed predicates and column pruning included. */
private class WarcMicroBatchStream(
    path: String,
    maxFilesPerTrigger: Int,
    compactInterval: Int,
    required: StructType,
    typeIn: Option[Set[String]],
    statusIn: Option[Set[Int]],
    conf: SerializableHadoopConf,
    checkpointLocation: String)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private val log = new GribFileLog(
    new Path(checkpointLocation, "filelog"), conf, compactInterval)

  private def currentListing(): Seq[(String, Long)] =
    WarcSource.listWarc(path, conf.value)

  private var availableNowCap: Option[Seq[(String, Long)]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(currentListing())
  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  // seen-set cache across triggers (this instance is the log's only
  // writer): one disk read per (re)start, then maintained by admissions
  private var seenCache: Option[(Long, Set[String])] = None
  private def seenUpToCached(batchId: Long): Set[String] =
    seenCache match {
      case Some((id, paths)) if id == batchId => paths
      case _ =>
        val paths = log.seenUpTo(batchId).map(_.path).toSet
        seenCache = Some((batchId, paths))
        paths
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startId = start.asInstanceOf[GribStreamOffset].batchId
    val seen = seenUpToCached(startId)
    val listed = availableNowCap.getOrElse(currentListing())
    val fresh = listed.filter { case (p, _) => !seen(p) }
    val admitted = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        fresh.take(m.maxFiles())
      case _ => fresh
    }
    if (admitted.isEmpty) GribStreamOffset(startId)
    else {
      val id = startId + 1
      log.add(id, admitted.map { case (p, mt) => GribFileEntry(p, mt, id) },
        expireBefore = Long.MinValue)
      seenCache = Some((id, seen ++ admitted.map(_._1)))
      GribStreamOffset(id)
    }
  }

  override def initialOffset(): Offset = GribStreamOffset(-1L)
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")
  override def deserializeOffset(json: String): Offset = GribStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val startId = start.asInstanceOf[GribStreamOffset].batchId
    val endId = end.asInstanceOf[GribStreamOffset].batchId
    if (endId <= startId) return Array.empty
    // the side-log, not a re-glob, names a batch's files: a restart
    // replays the identical set
    ((startId + 1) to endId).flatMap(log.filesForBatch)
      .map(e => WarcPartition(e.path): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, typeIn, statusIn, conf)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Shown as the source description in streaming progress — carries the
    * pushdown so operators can see from the logs that a gate's predicates
    * reached the record loop. */
  override def toString: String = {
    val t = typeIn.fold("*")(_.mkString("|"))
    val s = statusIn.fold("*")(_.mkString("|"))
    s"WarcStream($path, type=$t, status=$s, cols=${required.fieldNames.mkString(",")})"
  }
}

private final case class WarcPartition(file: String) extends InputPartition

private class WarcReaderFactory(
    required: StructType,
    typeIn: Option[Set[String]],
    statusIn: Option[Set[Int]],
    conf: SerializableHadoopConf)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[WarcPartition].file
    new WarcRecordReader(file, required, typeIn, statusIn, conf.value)
  }
}

/** Streaming WARC record parser over one file (decompressing `.gz`
  * transparently — the JDK `GZIPInputStream` reads concatenated members,
  * which is exactly the record-per-member layout). Offsets are positions
  * in the UNCOMPRESSED stream, the coordinate a CDX index carries. */
private class WarcRecordReader(
    file: String,
    required: StructType,
    typeIn: Option[Set[String]],
    statusIn: Option[Set[Int]],
    conf: org.apache.hadoop.conf.Configuration)
  extends PartitionReader[InternalRow] {

  private val needed = required.fieldNames.toSet
  // columns that force HTTP parsing of response blocks
  private val needHttp = statusIn.isDefined ||
    Seq("http_status", "http_content_type", "content_encoding", "payload_len",
      "payload").exists(needed)
  // columns that force body decode (de-chunk + gunzip) and retention
  private val needBody = Seq("payload_len", "payload").exists(needed)

  private val raw: InputStream = {
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, conf)
    val base: InputStream = fs.open(p)
    if (file.endsWith(".gz"))
      new BufferedInputStream(new GZIPInputStream(base, 1 << 16), 1 << 16)
    else new BufferedInputStream(base, 1 << 16)
  }
  private var pos = 0L // decompressed-stream offset
  private var recordIdx = -1L
  private var atEof = false
  private var current: InternalRow = _

  // ------------------------------------------------------------- byte layer

  private def readByte(): Int = {
    val b = raw.read()
    if (b >= 0) pos += 1
    b
  }

  /** One CRLF-terminated ASCII line; returns null at clean EOF before any
    * byte. Bare LF is tolerated (robustness ruling shared with the HTTP
    * spec's obs-fold guidance); CR is required by both specs in practice. */
  private def readLine(): String = {
    val sb = new java.lang.StringBuilder(64)
    var b = readByte()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      sb.append(b.toChar)
      b = readByte()
    }
    if (b < 0 && sb.length == 0) return null
    var n = sb.length
    if (n > 0 && sb.charAt(n - 1) == '\r') n -= 1
    sb.substring(0, n)
  }

  private def readFully(n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = raw.read(out, off, n - off)
      if (r < 0) throw new EOFException(
        s"WarcSource: truncated record block in $file (wanted $n bytes, got $off)")
      off += r
      pos += r
    }
    out
  }

  private def skipFully(n: Long): Unit = {
    var left = n
    val buf = new Array[Byte](math.min(left, 1L << 16).toInt max 1)
    while (left > 0) {
      val r = raw.read(buf, 0, math.min(left, buf.length.toLong).toInt)
      if (r < 0) throw new EOFException(
        s"WarcSource: truncated record block in $file ($left bytes short)")
      left -= r
      pos += r
    }
  }

  // ------------------------------------------------------------ WARC layer

  /** Header block: `Name: value` lines, LWS continuation lines joined
    * with a single space (ISO 28500 §4), case-insensitive names. */
  private def readHeaders(): CaseInsensitiveMap[String] = {
    val pairs = ArrayBuffer.empty[(String, String)]
    var line = readLine()
    while (line != null && line.nonEmpty) {
      if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
        require(pairs.nonEmpty, s"WarcSource: continuation line with no header in $file")
        val (k, v) = pairs.last
        pairs(pairs.length - 1) = (k, v + " " + line.trim)
      } else {
        val i = line.indexOf(':')
        require(i > 0, s"WarcSource: malformed header line '$line' in $file")
        pairs += ((line.substring(0, i).trim, line.substring(i + 1).trim))
      }
      line = readLine()
    }
    require(line != null, s"WarcSource: EOF inside header block in $file")
    CaseInsensitiveMap(pairs.toMap)
  }

  override def next(): Boolean = {
    while (!atEof) {
      // offset = start of the version line (the coordinate a CDX carries),
      // not of the preceding record's CRLF CRLF separator
      var startPos = pos
      var version = readLine()
      while (version != null && version.isEmpty) { startPos = pos; version = readLine() }
      if (version == null) { atEof = true; return false }
      require(version.startsWith("WARC/"),
        s"WarcSource: expected WARC version line at offset $startPos of $file, got '$version'")
      // implemented framing is WARC 0.x/1.x (ISO 28500 and the
      // pre-standard drafts share it); an unknown major means unknown
      // framing — reject loudly rather than misparse
      require(version.startsWith("WARC/0.") || version.startsWith("WARC/1."),
        s"WarcSource: unsupported WARC version '$version' in $file")
      val headers = readHeaders()
      val len = headers.getOrElse("Content-Length",
        throw new IllegalArgumentException(
          s"WarcSource: record without Content-Length in $file")).toLong
      recordIdx += 1
      val rtype = headers.getOrElse("WARC-Type", "unknown")

      if (typeIn.exists(!_.contains(rtype))) {
        skipFully(len) // pushed record_type filter: body never materialized
      } else {
        require(len <= Int.MaxValue, s"WarcSource: oversized record ($len B) in $file")
        val block = if (needHttp || needBody) readFully(len.toInt)
        else { skipFully(len); Array.emptyByteArray }
        val isHttpResponse = rtype == "response" &&
          headers.get("Content-Type").exists(_.startsWith("application/http"))
        var status: Option[Int] = None
        var httpCt: Option[String] = None
        var httpEnc: Option[String] = None
        var payload: Array[Byte] = block
        if (needHttp && isHttpResponse) {
          val (s, ct, enc, body) =
            WarcHttp.parseResponse(block, decodeBody = needBody, file)
          status = Some(s); httpCt = ct; httpEnc = enc; payload = body
        }
        if (statusIn.forall(s => status.exists(s.contains))) {
          current = buildRow(startPos, rtype, headers, len, status, httpCt,
            httpEnc, if (needBody) payload else null)
          // trailing CRLF CRLF record separator (consumed lazily by the
          // blank-line tolerance above on the next iteration)
          return true
        }
      }
    }
    false
  }

  private def buildRow(
      offset: Long,
      rtype: String,
      h: CaseInsensitiveMap[String],
      len: Long,
      status: Option[Int],
      httpCt: Option[String],
      httpEnc: Option[String],
      payload: Array[Byte]): InternalRow = {
    def utf8(s: String) = UTF8String.fromString(s)
    val values: Map[String, Any] = Map(
      "file" -> utf8(file),
      "record_idx" -> recordIdx,
      "offset" -> offset,
      "record_type" -> utf8(rtype),
      "record_id" -> h.get("WARC-Record-ID").map(stripAngle).map(utf8).orNull,
      "target_uri" -> h.get("WARC-Target-URI").map(utf8).orNull,
      "warc_date" -> h.get("WARC-Date").map(utf8).orNull,
      "content_type" -> h.get("Content-Type").map(utf8).orNull,
      "content_length" -> len,
      "http_status" -> status.map(Int.box).orNull,
      "http_content_type" -> httpCt.map(utf8).orNull,
      "content_encoding" -> httpEnc.map(utf8).orNull,
      "payload_len" -> (if (payload == null) null else payload.length.toLong),
      "payload" -> payload)
    InternalRow.fromSeq(required.fieldNames.toSeq.map(values))
  }

  private def stripAngle(s: String): String =
    if (s.length >= 2 && s.charAt(0) == '<' && s.charAt(s.length - 1) == '>')
      s.substring(1, s.length - 1)
    else s

  override def get(): InternalRow = current
  override def close(): Unit = raw.close()
}

/** RFC 9112 response-message parsing over an in-memory record block. */
private[sources] object WarcHttp {

  /** Returns (status, Content-Type, normalized Content-Encoding, body) —
    * body de-chunked and content-decoded when `decodeBody`, else empty.
    * The encoding is surfaced WITHOUT decoding so a metadata-only pass can
    * quantify unsupported codings (brotli, zstd) before any body decode
    * would reject them. */
  def parseResponse(
      block: Array[Byte],
      decodeBody: Boolean,
      ctx: String): (Int, Option[String], Option[String], Array[Byte]) = {
    val headerEnd = indexOfDoubleCrlf(block)
    require(headerEnd >= 0, s"WarcSource: HTTP response without header terminator in $ctx")
    val head = new String(block, 0, headerEnd, "ISO-8859-1")
    val lines = head.split("\r\n").toSeq
    val statusLine = lines.head
    require(statusLine.startsWith("HTTP/"),
      s"WarcSource: bad HTTP status line '$statusLine' in $ctx")
    val parts = statusLine.split(" ", 3)
    require(parts.length >= 2, s"WarcSource: bad HTTP status line '$statusLine' in $ctx")
    val status = parts(1).toInt
    val headers = CaseInsensitiveMap(lines.tail.filter(_.nonEmpty).flatMap { l =>
      val i = l.indexOf(':')
      if (i > 0) Some(l.substring(0, i).trim -> l.substring(i + 1).trim) else None
    }.toMap)
    val ct = headers.get("Content-Type")
    val codings = headers.get("Content-Encoding").toSeq
      .flatMap(_.split(',')).map(_.trim.toLowerCase).filter(_.nonEmpty)
    val enc = if (codings.isEmpty) None else Some(codings.mkString(","))
    if (!decodeBody) return (status, ct, enc, Array.emptyByteArray)
    var body = java.util.Arrays.copyOfRange(block, headerEnd + 4, block.length)
    if (headers.get("Transfer-Encoding").exists(_.toLowerCase.contains("chunked")))
      body = dechunk(body, ctx)
    // Content-Encoding is an ordered list applied by the sender left to
    // right, so the receiver decodes right to left (RFC 9110 §8.4).
    // Unsupported codings (br, zstd, compress) REJECT LOUDLY — emitting
    // still-compressed bytes as "payload" would feed garbage to html
    // extraction downstream, the silent misparse this source forbids.
    codings.reverse.foreach {
        case "gzip" | "x-gzip" => body = gunzip(body)
        case "deflate"         => body = inflate(body, ctx)
        case "identity"        => ()
        case other => throw new IllegalArgumentException(
          s"WarcSource: unsupported Content-Encoding '$other' in $ctx — " +
            "supported: gzip, deflate, identity. Filter such records out " +
            "(e.g. on http_status / a metadata-only pass) or re-encode " +
            "the crawl; this reader will not emit undecoded bytes as a " +
            "decoded body.")
      }
    (status, ct, enc, body)
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** RFC 9112 §7.1 chunked coding: hex size [;extensions] CRLF data CRLF,
    * terminated by a zero chunk + optional trailer fields + CRLF. */
  private[sources] def dechunk(b: Array[Byte], ctx: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    def line(): String = {
      val start = i
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      require(i + 1 < b.length, s"WarcSource: truncated chunked body in $ctx")
      val s = new String(b, start, i - start, "ISO-8859-1")
      i += 2
      s
    }
    var done = false
    while (!done) {
      val sizeLine = line()
      val semi = sizeLine.indexOf(';')
      val size = Integer.parseInt(
        (if (semi >= 0) sizeLine.substring(0, semi) else sizeLine).trim, 16)
      if (size == 0) {
        // trailer section: fields until the empty line
        var t = line()
        while (t.nonEmpty) t = line()
        done = true
      } else {
        require(i + size <= b.length, s"WarcSource: truncated chunk in $ctx")
        out.write(b, i, size)
        i += size
        require(i + 2 <= b.length && b(i) == '\r' && b(i + 1) == '\n',
          s"WarcSource: chunk without CRLF terminator in $ctx")
        i += 2
      }
    }
    out.toByteArray
  }

  /** `Content-Encoding: deflate` decode. RFC 9110 defines deflate as the
    * ZLIB container (RFC 1950), but a well-documented population of
    * servers ships RAW deflate (RFC 1951) under the same token — both
    * browsers accept both, so both are decoded here: zlib first (the
    * spec reading), raw as the fallback. A stream that is neither fails
    * loudly with the record context. */
  private[sources] def inflate(b: Array[Byte], ctx: String): Array[Byte] = {
    def tryInflate(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      try {
        inf.setInput(b)
        val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 4))
        val buf = new Array[Byte](1 << 16)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n > 0) out.write(buf, 0, n)
          else if (inf.needsInput() || inf.needsDictionary())
            throw new java.util.zip.DataFormatException("truncated deflate stream")
        }
        out.toByteArray
      } finally inf.end()
    }
    try tryInflate(false)
    catch {
      case _: java.util.zip.DataFormatException =>
        try tryInflate(true)
        catch {
          case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"WarcSource: Content-Encoding deflate body is neither zlib " +
                s"nor raw deflate in $ctx: ${e.getMessage}")
        }
    }
  }

  private[sources] def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b), 1 << 16)
    val out = new java.io.ByteArrayOutputStream(b.length * 4)
    val buf = new Array[Byte](1 << 16)
    var r = in.read(buf)
    while (r >= 0) {
      out.write(buf, 0, r)
      r = in.read(buf)
    }
    out.toByteArray
  }
}
