package graft.sources

import java.time.{LocalDateTime, ZoneOffset}
import java.util

import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSourceV2: GRIB2 ensemble-forecast files as a TABLE — the S1
  * ingestion boundary the reference crosses in Python (`flood/etl/utils.py:
  * 3-14` opens CDS GRIB via the cfgrib engine; `databricks/glofas-transform
  * .py:104-109` splits control/perturbed members with filter_by_keys). This
  * source reads the GRIB file directly: each message (one 2-D field per
  * ensemble member × forecast step for GloFAS) flattens to long-form rows
  * `(latitude, longitude, number, step_hours, ref_time, value)` — the same
  * shape the reference's xarray→pandas→parquet conversion produces, without
  * the conversion hop.
  *
  * Built from the public WMO FM 92 GRIB edition 2 specification only:
  * sections 0–8, grid definition template 3.0 (regular lat/lon), product
  * definition templates 4.0 (deterministic; `number` NULL) and 4.1
  * (individual ensemble member), data representation templates 5.0
  * (simple packing, `Y = (R + X·2^E) / 10^D`), 5.2 (complex packing —
  * grouped values with per-group reference/width, the encoding
  * operational CDS/GloFAS drops commonly use) and 5.3 (complex packing
  * with first/second-order spatial differencing), 5.41 (PNG packing —
  * the packed stream rides a PNG raster; NCEP products ship it), 5.42
  * (CCSDS/AEC lossless compression — the ecCodes-side default for many
  * operational ECMWF products; see [[CcsdsDecoder]]), optional
  * section-6 bitmap (absent cells surface as SQL NULL values).
  * Sign-and-magnitude integers and MSB-first bit packing per spec.
  * Anything outside that envelope — edition 1, spectral/JPEG2000
  * packings, embedded missing-value management, non-lat/lon grids — is
  * rejected loudly rather than mis-read.
  *
  * Scale shape:
  *  - the driver INDEXES the file (walks section headers, skipping data
  *    payloads — KBs of reads for GBs of file) into per-message metadata;
  *  - messages distribute across `numPartitions`; executors do ranged
  *    reads of exactly their messages' bitmap+data payloads — a GloFAS day
  *    (51 members × 30 steps = 1530 messages) parallelizes naturally;
  *  - predicates on `number` / `step_hours` prune whole MESSAGES at plan
  *    time (the GRIB analog of parquet row-group pruning): reading one
  *    member's track out of 51 touches 1/51 of the data bytes
  *    (`SupportsPushDownFilters`);
  *  - an unprojected `value` column skips payload decode entirely
  *    (`SupportsPushDownRequiredColumns`) — metadata scans are free.
  */
class GribSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GribSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GribTable(GribModel.fromOptions(new CaseInsensitiveStringMap(properties)))
}

/** Everything known WITHOUT touching the filesystem — `getTable` builds only
  * this, so a STREAMING query can start against a directory that does not
  * have files yet; the driver-side message index is computed lazily (batch:
  * once at scan planning; streaming: per micro-batch over the new files).
  * `maxFilesPerTrigger` (0 = unlimited) bounds each micro-batch — a
  * multi-year backfill drains in controlled chunks instead of one giant
  * first batch. Option `maxFileAge` (a duration like `30m`/`24h`/`7d`;
  * absent = disabled) makes the stream ignore — and eventually forget —
  * files older than the newest drop by that much, bounding the seen-file
  * log on a long-lived stream. `ignoreMissingFiles`
  * (default false: fail loudly) lets a stream skip a file that was admitted
  * into a checkpointed offset but deleted before its batch executed — the
  * listing-to-read race with aggressive retention. `compactInterval` sets
  * the seen-file log's snapshot cadence. `partitionByStep` (batch only)
  * makes the scan emit ONE partition per distinct `step_hours` and REPORT
  * that clustering to Catalyst (`KeyGroupedPartitioning`), so a
  * downstream aggregation or join whose keys include `step_hours` plans
  * with NO exchange — the ensemble members of every (cell, step) group
  * are already co-located in the step's partition. Opt-in because it
  * caps parallelism at the distinct-step count (30 for a GloFAS day —
  * right for the daily ingest-aggregate job; wrong for a single-file
  * scan or a multi-month corpus, which want cell-balanced slices).
  * `indexCacheDir` (absent = off) persists each file's driver-side
  * message index as a (path, length, mtime)-keyed sidecar in that
  * directory — repeated scans/streams of an immutable drop read KBs
  * instead of re-walking every message header (see [[GribIndexCache]]). */
private[sources] final case class GribSpec(
    path: String, numPartitions: Int, maxFilesPerTrigger: Int,
    maxFileAgeMs: Long, ignoreMissingFiles: Boolean, compactInterval: Int,
    conf: SerializableHadoopConf, partitionByStep: Boolean = false,
    indexCacheDir: Option[String] = None)

object GribSource {
  val Schema: StructType = StructType(Seq(
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false),
    StructField("number", IntegerType, nullable = true), // NULL = deterministic (4.0)
    StructField("step_hours", IntegerType, nullable = false),
    StructField("ref_time", LongType, nullable = false), // epoch seconds UTC
    StructField("value", DoubleType, nullable = true))) // NULL = bitmap-missing

  /** The audited DRS reject list (WMO GRIB2 code table 5.0 swept against
    * this source's dispatch, round 19; 5.4 decoded in round 20): every
    * template the registry defines that this source does NOT decode,
    * with its occurrence in the wild — so the "supported packings" claim
    * is auditable and each reject names what the user hit. Decoded
    * templates: 5.0, 5.2, 5.3, 5.4 (IEEE f32/f64; f128 rejects naming
    * the precision), 5.40 (lossless; lossy rejects at index time naming
    * the cause), 5.41, 5.42. `GribSourceSpec` pins a by-name rejection
    * per entry. */
  val DrsRejects: Map[Int, String] = Map(
    1 -> ("matrix values at grid point: pre-operational status in the WMO " +
      "registry, no known operational products emit it"),
    6 -> ("simple packing with pre-processing: validation status in the " +
      "WMO registry, not operational"),
    50 -> ("spectral data simple packing: spherical-harmonic coefficients, " +
      "not a lat/lon raster — outside this source's grid model"),
    51 -> ("spherical harmonics complex packing: ECMWF model-level " +
      "spectral fields, not a lat/lon raster"),
    53 -> ("spectral data complex packing for limited-area models: " +
      "spectral fields, not a lat/lon raster"),
    61 -> ("simple packing with logarithm pre-processing: some JMA " +
      "products; decode would need the pre-processing parameter semantics"),
    200 -> ("run-length packing with level values: JMA radar products"))

  /** Driver-side distinct `step_hours` over a glob — the same message index
    * a scan's planning walks (and the same `indexCacheDir` sidecar
    * round-trip when set), with NO Spark job: callers that need the step
    * set for a plan-time decision (e.g. the pipeline's daily-leadtime
    * guard) ask the index directly instead of running a
    * scan+distinct+collect over the cluster. Sorted ascending. */
  def distinctStepHours(glob: String, indexCacheDir: Option[String] = None): Seq[Int] = {
    val spec = GribSpec(glob, numPartitions = 1, maxFilesPerTrigger = 0,
      maxFileAgeMs = 0L, ignoreMissingFiles = false, compactInterval = 10,
      conf = new SerializableHadoopConf(HadoopConf.session()),
      partitionByStep = false, indexCacheDir = indexCacheDir)
    GribModel.indexAll(spec).map(_.stepHours).distinct.sorted
  }
}

/** One GRIB2 message: grid geometry + packing parameters + payload offsets.
  * Everything an executor needs to decode its field without re-reading the
  * header. Lat/lon are kept in micro-degrees (the wire integers) and
  * divided once at emit, so coordinates are bit-stable. */
private[sources] final case class GribMessage(
    path: String,
    ni: Int, nj: Int,
    latFirstMicro: Long, lonFirstMicro: Long,
    diMicro: Long, djMicro: Long,
    jAscending: Boolean,
    number: Option[Int], stepHours: Int, refEpoch: Long,
    refValue: Float, binScale: Int, decScale: Int, nbits: Int,
    nPresent: Int,
    bitmapOffset: Long, // -1 = no bitmap (all cells present)
    dataOffset: Long,
    dataLen: Int = -1, // section-7 body length (needed for complex packing)
    complex: Option[ComplexParams] = None, // None = simple packing (5.0)
    png: Boolean = false, // DRS 5.41: section 7 is a PNG raster
    j2k: Boolean = false, // DRS 5.40: section 7 is a JPEG 2000 codestream
    ccsds: Option[CcsdsParams] = None, // DRS 5.42: CCSDS/AEC stream
    ieeePrecision: Int = 0) { // DRS 5.4: 0 = not IEEE, 1 = f32, 2 = f64
  def points: Int = ni * nj
}

/** DRS template 5.42 (CCSDS lossless compression) parameters — octets
  * 22 (options mask), 23 (block size), 24-25 (reference sample
  * interval) of section 5. */
private[sources] final case class CcsdsParams(
    flags: Int, blockSize: Int, rsi: Int)

/** Data representation templates 5.2/5.3 (complex packing [+ spatial
  * differencing]) parameters — WMO FM 92 GRIB2 DRS templates, octets
  * 22-49 of section 5. `spatialOrder` 0 means template 5.2 (no
  * differencing); 1/2 are the 5.3 orders. `extraOctets` is the byte
  * width of the section-7 spatial-differencing descriptors (octet 49). */
private[sources] final case class ComplexParams(
    ng: Int, // number of groups (octets 32-35)
    refGroupWidth: Int, groupWidthBits: Int, // octets 36, 37
    refGroupLen: Int, lenInc: Int, lastGroupLen: Int, groupLenBits: Int, // 38-41, 42, 43-46, 47
    spatialOrder: Int, extraOctets: Int) // octets 48, 49 (5.3 only)

private[sources] object GribModel {

  /** Sign-and-magnitude decode (GRIB2 uses the high bit as sign). */
  private def sm16(v: Int): Int = if ((v & 0x8000) != 0) -(v & 0x7FFF) else v
  private def sm32(v: Int): Long =
    if ((v & 0x80000000) != 0) -(v.toLong & 0x7FFFFFFFL) else v.toLong

  def fromOptions(o: CaseInsensitiveStringMap): GribSpec = {
    val path = Option(o.get("path")).getOrElse(
      throw new IllegalArgumentException("GribSource requires option 'path'"))
    val numPartitions = Option(o.get("numpartitions")).map(_.toInt).getOrElse(8)
    val maxFiles = Option(o.get("maxfilespertrigger")).map(_.toInt).getOrElse(0)
    require(maxFiles >= 0, s"maxFilesPerTrigger must be >= 0, got $maxFiles")
    val maxAge = Option(o.get("maxfileage")).map(parseDuration).getOrElse(0L)
    val ignoreMissing = Option(o.get("ignoremissingfiles")).exists(_.toBoolean)
    val compactInterval =
      Option(o.get("filelogcompactinterval")).map(_.toInt).getOrElse(10)
    require(compactInterval >= 1,
      s"fileLogCompactInterval must be >= 1, got $compactInterval")
    val byStep = Option(o.get("partitionbystep")).exists(_.toBoolean)
    val idxCache = Option(o.get("indexcachedir")).map(_.trim).filter(_.nonEmpty)
    GribSpec(path, numPartitions, maxFiles, maxAge, ignoreMissing,
      compactInterval, new SerializableHadoopConf(HadoopConf.session()), byStep,
      idxCache)
  }

  /** `"500ms" | "30s" | "10m" | "24h" | "7d"` (bare number = seconds) →
    * milliseconds. */
  private[sources] def parseDuration(s: String): Long = {
    val Pattern = "^([0-9]+)\\s*(ms|s|m|h|d)?$".r
    s.trim.toLowerCase match {
      case Pattern(n, unit) =>
        val mult = unit match {
          case "ms" => 1L
          case null | "s" => 1000L
          case "m" => 60L * 1000
          case "h" => 3600L * 1000
          case "d" => 24L * 3600 * 1000
        }
        n.toLong * mult
      case other => throw new IllegalArgumentException(
        s"cannot parse duration '$other' (use e.g. 500ms, 30s, 10m, 24h, 7d)")
    }
  }

  /** Resolve `spec.path` to files. `path` may be a glob — a GloFAS day
    * arrives as one GRIB file per leadtime (glofas-API-query.py fetches
    * 30); one scan reads them all. A LITERAL path that exists wins over
    * glob interpretation, so file names containing glob metacharacters
    * ([..], {..}) still open. Sorted by path for determinism. */
  def listFiles(spec: GribSpec): Array[org.apache.hadoop.fs.FileStatus] = {
    val fs = FileSystem.get(new Path(spec.path).toUri, spec.conf.value)
    val p = new Path(spec.path)
    val literal = // one metadata RPC; glob fallback only when it misses
      try Some(fs.getFileStatus(p)).filter(_.isFile)
      catch { case _: java.io.FileNotFoundException => None }
    literal.map(Array(_)).getOrElse(
      Option(fs.globStatus(p)).getOrElse(Array.empty).filter(_.isFile))
      .sortBy(_.getPath.toString)
  }

  /** Driver-side message index over `files`, in PARALLEL: each file's
    * header walk is a handful of small seek+read RPCs, so a multi-year
    * backfill (thousands of files on an object store) is latency-bound,
    * not bandwidth-bound — a serial walk would make driver indexing the
    * planning bottleneck long before the executors see a byte. One stream
    * per task; FileSystem instances are cache-shared and thread-safe. */
  def indexFiles(
      spec: GribSpec,
      files: Array[org.apache.hadoop.fs.FileStatus]): Seq[GribMessage] = {
    val fs = FileSystem.get(new Path(spec.path).toUri, spec.conf.value)
    def walkFile(st: org.apache.hadoop.fs.FileStatus): Seq[GribMessage] = {
      val in = fs.open(st.getPath) // FileStatus carries the length
      try indexMessages(in, st.getLen, st.getPath.toString)
      finally in.close()
    }
    // sidecar cache (`indexCacheDir`): a GRIB day is immutable once
    // dropped, but the header walk is a seek+read RPC per section per
    // message — years of history at backfill scale re-pay it on EVERY
    // query. With the option set, each file's index round-trips through a
    // (path, len, mtime)-keyed sidecar: first reader writes, every later
    // scan or stream batch reads KBs instead of re-walking.
    def indexFile(st: org.apache.hadoop.fs.FileStatus): Seq[GribMessage] =
      spec.indexCacheDir match {
        case Some(dir) => GribIndexCache.readThrough(spec, dir, st)(() => walkFile(st))
        case None => walkFile(st)
      }
    // files stay sorted by path: parallelMap preserves input order
    parallelMap(files.toSeq)(indexFile).flatten
  }

  /** Bounded-pool (≤16 threads) parallel map over driver-side per-file RPC
    * work, preserving input order; a task failure rethrows its CAUSE, not
    * the ExecutionException wrapper, so malformed inputs fail the caller
    * loudly with the real error. The pool dies with the call. */
  private[sources] def parallelMap[A, B](items: Seq[A])(f: A => B): Seq[B] =
    if (items.length <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(items.length, 16))
      try {
        val futures = items.map { a =>
          pool.submit(new java.util.concurrent.Callable[B] {
            override def call(): B = f(a)
          })
        }
        futures.map(fu =>
          try fu.get()
          catch { case e: java.util.concurrent.ExecutionException => throw e.getCause })
      } finally pool.shutdownNow()
    }

  /** Resolve explicit paths to statuses in PARALLEL (same bounded pool
    * shape as [[indexFiles]]) — a multi-thousand-file backfill batch on an
    * object store would otherwise serialize one metadata RPC per file and
    * make planning driver-latency-bound. A vanished path fails loudly by
    * default (it sits in a checkpointed offset: silence = data loss);
    * `ignoreMissingFiles` opts into warn-and-skip, mirroring the built-in
    * file source's escape hatch for aggressive-retention directories. */
  def resolveStatuses(
      spec: GribSpec,
      paths: Seq[String]): Array[org.apache.hadoop.fs.FileStatus] = {
    val fs = FileSystem.get(new Path(spec.path).toUri, spec.conf.value)
    def resolve(p: String): Option[org.apache.hadoop.fs.FileStatus] =
      try Some(fs.getFileStatus(new Path(p)))
      catch {
        case _: java.io.FileNotFoundException if spec.ignoreMissingFiles =>
          org.slf4j.LoggerFactory.getLogger(classOf[GribSource])
            .warn(s"ignoreMissingFiles: skipping vanished GRIB stream file '$p'")
          None
        case _: java.io.FileNotFoundException => throw new IllegalStateException(
          s"GRIB stream file '$p' in checkpointed offset range no longer " +
            "exists (set ignoreMissingFiles=true to skip it)")
      }
    parallelMap(paths)(resolve).flatten.toArray
  }

  /** Batch index: every file matching the spec; empty matches fail loudly
    * (a typo'd path must not read as an empty table). */
  def indexAll(spec: GribSpec): Seq[GribMessage] = {
    val files = listFiles(spec)
    require(files.nonEmpty, s"no GRIB files match '${spec.path}'")
    indexFiles(spec, files)
  }

  /** Walk the file's messages, reading section headers and SKIPPING data
    * payloads — the driver-side index costs KBs of I/O regardless of file
    * size. */
  private def indexMessages(in: FSDataInputStream, fileLen: Long, path: String): Seq[GribMessage] = {
    val out = Seq.newBuilder[GribMessage]
    var offset = 0L
    while (offset + 16 <= fileLen) {
      in.seek(offset)
      val ind = new Array[Byte](16)
      in.readFully(ind)
      require(ind(0) == 'G' && ind(1) == 'R' && ind(2) == 'I' && ind(3) == 'B',
        s"$path: no GRIB indicator at offset $offset")
      require(ind(7) == 2, s"$path: GRIB edition ${ind(7)} unsupported (edition 2 only)")
      val msgLen = java.nio.ByteBuffer.wrap(ind, 8, 8).getLong
      require(msgLen >= 16 && offset + msgLen <= fileLen,
        // a partially-copied drop must fail HERE, at index time — a
        // value-pruned scan (count, metadata queries) never touches the
        // payload and would otherwise read a truncated file as complete
        s"$path: message at offset $offset declares $msgLen bytes but the " +
          s"file ends at $fileLen (truncated drop?)")
      out += indexOne(in, offset, offset + msgLen, path)
      offset += msgLen
    }
    out.result()
  }

  private def indexOne(in: FSDataInputStream, msgStart: Long, msgEnd: Long, path: String): GribMessage = {
    // mutable message fields, filled section by section
    var refEpoch = 0L
    var ni, nj = 0
    var latFirst, lonFirst, di, dj = 0L
    var jAscending = false
    var number: Option[Int] = None
    var stepHours = 0
    var refValue = 0.0f
    var binScale, decScale, nbits = 0
    var nPresent = 0
    var bitmapOffset = -1L
    var dataOffset = -1L
    var dataLen = -1
    var complex: Option[ComplexParams] = None
    var png = false
    var j2k = false
    var ccsds: Option[CcsdsParams] = None
    var ieeePrecision = 0

    var at = msgStart + 16
    while (at < msgEnd - 4) {
      in.seek(at)
      val head = new Array[Byte](5)
      in.readFully(head)
      val secLen = java.nio.ByteBuffer.wrap(head, 0, 4).getInt
      val secNum = head(4) & 0xFF
      require(secLen >= 5, // a zero/short length would re-read the same bytes forever
        s"$path: malformed section $secNum at offset $at (length $secLen)")
      require(at + secLen <= msgEnd, // a corrupt length past the message end
        // would silently read the NEXT message's bytes (or EOF obscurely)
        s"$path: section $secNum at offset $at (length $secLen) overruns " +
          s"message end $msgEnd")
      def body(): java.nio.ByteBuffer = {
        val b = new Array[Byte](secLen - 5)
        in.readFully(b)
        java.nio.ByteBuffer.wrap(b)
      }
      secNum match {
        case 1 =>
          val b = body()
          val year = b.getShort(7) & 0xFFFF
          refEpoch = LocalDateTime.of(year, b.get(9) & 0xFF, b.get(10) & 0xFF,
            b.get(11) & 0xFF, b.get(12) & 0xFF, b.get(13) & 0xFF)
            .toEpochSecond(ZoneOffset.UTC)
        case 2 => // local use — skip
        case 3 =>
          val b = body()
          require((b.get(0) & 0xFF) == 0, s"$path: grid definition source ${b.get(0)} unsupported")
          val template = b.getShort(7) & 0xFFFF
          require(template == 0,
            s"$path: grid template 3.$template unsupported (3.0 regular lat/lon only)")
          // template 3.0 body starts at offset 9 (after npts(4), optional-list(2), template(2))
          ni = b.getInt(9 + 16)
          nj = b.getInt(9 + 20)
          latFirst = sm32(b.getInt(9 + 32))
          lonFirst = sm32(b.getInt(9 + 36))
          di = b.getInt(9 + 49).toLong & 0xFFFFFFFFL
          dj = b.getInt(9 + 53).toLong & 0xFFFFFFFFL
          val scan = b.get(9 + 57) & 0xFF
          require((scan & 0xBF) == 0, // only bit 0x40 (j ascending) may vary
            s"$path: scanning mode 0x${scan.toHexString} unsupported " +
              "(+i row-major only; bit 0x40 j-direction honored)")
          jAscending = (scan & 0x40) != 0
        case 4 =>
          val b = body()
          val template = b.getShort(2) & 0xFFFF
          require(template == 0 || template == 1,
            s"$path: product template 4.$template unsupported (4.0/4.1 only)")
          val unit = b.get(12) & 0xFF
          val ft = b.getInt(13)
          stepHours = unit match {
            case 0 => // minutes: reject sub-hourly rather than alias steps
              require(ft % 60 == 0,
                s"$path: sub-hourly forecast time ($ft min) cannot map to step_hours")
              ft / 60
            case 1 => ft
            case 2 => ft * 24 // days
            case u => throw new IllegalArgumentException(
              s"$path: time unit $u unsupported (minute/hour/day)")
          }
          number = if (template == 1) Some(b.get(30) & 0xFF) else None
        case 5 =>
          val b = body()
          nPresent = b.getInt(0)
          require(nPresent >= 0, // untrusted; drives payload-buffer sizing
            s"$path: negative data-point count $nPresent in section 5 at offset $at")
          val template = b.getShort(4) & 0xFFFF
          // a corrupt section length below the template's fixed octets
          // must reject by name, not as a buffer-bounds exception
          require(b.limit() >= (if (template == 4) 7 else 15),
            s"$path: section 5 of ${b.limit() + 5} octets too short for " +
              s"template 5.$template")
          if (template != 4) {
            // every packed-integer template shares octets 12-21 (R/E/D/
            // nbits); template 5.4 (raw IEEE floats) has NONE of them —
            // its section is 12 octets and ends at the precision code
            refValue = b.getFloat(6)
            binScale = sm16(b.getShort(10) & 0xFFFF)
            decScale = sm16(b.getShort(12) & 0xFFFF)
            nbits = b.get(14) & 0xFF
            require(nbits <= 32, // 0 = constant field; >32 would overflow the
              // 64-bit unpack accumulator and is unheard-of for real data
              s"$path: packing with $nbits bits per value unsupported")
          }
          template match {
            case 0 => // simple packing: octets 12-21 above are the whole story
            case 4 => // IEEE floating point: section 7 is raw big-endian
              // IEEE samples over the present cells — float32 and float64
              // both widen to the Double value column BIT-EXACTLY, so
              // this is the one "unpacked" template that is still
              // exactly hash-checkable. Precision 3 (128-bit) has no
              // Double-exact widening and keeps the loud reject.
              val precision = b.get(6) & 0xFF
              require(precision == 1 || precision == 2,
                s"$path: IEEE floating-point precision code $precision " +
                  "unsupported (1 = 32-bit, 2 = 64-bit)")
              ieeePrecision = precision
            case 2 | 3 => // complex packing (5.2) / + spatial differencing (5.3)
              val split = b.get(16) & 0xFF
              require(split == 1,
                s"$path: group splitting method $split unsupported (1 = general splitting)")
              val missing = b.get(17) & 0xFF
              require(missing == 0, // missing cells ride the section-6 bitmap;
                // embedded missing-value substitution is a different encoding
                s"$path: missing-value management $missing unsupported (0; use a bitmap)")
              val ng = b.getInt(26)
              require(ng >= 0 && ng <= 2 * nPresent + 8, // untrusted: sizes three
                // driver/executor arrays; a corrupt count must not OOM
                s"$path: implausible group count $ng for $nPresent data points")
              val refW = b.get(30) & 0xFF
              val wBits = b.get(31) & 0xFF
              val refL = b.getInt(32)
              val lInc = b.get(36) & 0xFF
              val lastL = b.getInt(37)
              val lBits = b.get(41) & 0xFF
              require(refL >= 0 && lastL >= 0 && wBits <= 32 && lBits <= 32,
                s"$path: malformed complex-packing group descriptors " +
                  s"(refLen=$refL lastLen=$lastL widthBits=$wBits lenBits=$lBits)")
              val (order, extraOct) =
                if (template == 3) {
                  val o = b.get(42) & 0xFF
                  val eo = b.get(43) & 0xFF
                  require(o == 1 || o == 2,
                    s"$path: spatial differencing order $o unsupported (1 or 2)")
                  require(eo >= 1 && eo <= 4,
                    s"$path: $eo-octet spatial-differencing descriptors unsupported (1-4)")
                  (o, eo)
                } else (0, 0)
              complex = Some(ComplexParams(ng, refW, wBits, refL, lInc, lastL,
                lBits, order, extraOct))
            case 41 => // PNG packing: the packed-integer stream rides a PNG
              // raster in section 7; octets 12-21 above are the only
              // template parameters (octet 22 is the original-type code,
              // unused — values reconstruct from R/E/D regardless).
              // Practical encoders (NCEP g2clib pngpack, ecCodes
              // grib_accessor_data_png_packing) round the packed width to
              // a whole-byte PNG sample: 8/16-bit grayscale, 24-bit RGB,
              // 32-bit RGBA. Sub-byte grayscale depths never appear on
              // the wire from those encoders and are rejected loudly.
              require(nbits == 0 || nbits == 8 || nbits == 16 ||
                  nbits == 24 || nbits == 32,
                s"$path: PNG packing with $nbits bits per value unsupported " +
                  "(whole-byte PNG sample widths 8/16/24/32, or 0 = constant)")
              png = true
            case 42 => // CCSDS/AEC lossless compression: octets 12-21 as
              // simple packing, then the three AEC parameters. The
              // stream-shape validation (flags, block size, RSI bounds)
              // lives in CcsdsDecoder so index-time and decode-time agree.
              val ccsdsFlags = b.get(16) & 0xFF
              val block = b.get(17) & 0xFF
              val rsi = b.getShort(18) & 0xFFFF
              require(nbits == 0 || (block == 8 || block == 16 ||
                  block == 32 || block == 64),
                s"$path: CCSDS block size $block unsupported (8/16/32/64)")
              require(nbits == 0 || (rsi >= 1 && rsi <= 4096),
                s"$path: CCSDS reference sample interval $rsi out of range")
              ccsds = Some(CcsdsParams(ccsdsFlags, block, rsi))
            case 40 => // JPEG 2000 packing: octets 12-21 as simple
              // packing, then type of compression (0 = lossless) and the
              // target ratio. Lossless decodes from spec (J2kDecoder);
              // LOSSY (irreversible 9/7) keeps the loud reject — a rate-
              // controlled stream has no exact integer reconstruction.
              val compression = b.get(16) & 0xFF
              require(compression == 0,
                s"$path: data representation template 5.40 with LOSSY " +
                  "JPEG 2000 compression is not supported (no exact " +
                  "integer reconstruction exists) — re-encode at ingest: " +
                  "`grib_set -r -s packingType=grid_simple in.grib2 out.grib2` " +
                  "(or grid_ccsds / lossless jpeg)")
              j2k = true
            case t => throw new IllegalArgumentException(
              s"$path: data representation template 5.$t unsupported" +
                GribSource.DrsRejects.get(t).fold("")(why => s" ($why)") +
                " — supported: 5.0 simple, 5.2 complex, 5.3 complex+spatial " +
                "differencing, 5.4 IEEE floats, 5.40 lossless JPEG 2000, " +
                "5.41 PNG, 5.42 CCSDS; " +
                "re-encode at ingest: grib_set -r -s packingType=grid_simple")
          }
        case 6 =>
          val indicator = { val x = new Array[Byte](1); in.readFully(x); x(0) & 0xFF }
          indicator match {
            case 255 => bitmapOffset = -1L
            case 0 => bitmapOffset = at + 6
            case other => throw new IllegalArgumentException(
              s"$path: bitmap indicator $other unsupported (0 or 255)")
          }
        case 7 => dataOffset = at + 5; dataLen = secLen - 5
        case other => throw new IllegalArgumentException(s"$path: unexpected section $other")
      }
      at += secLen
    }
    require(ni > 0 && nj > 0 && dataOffset >= 0, s"$path: incomplete message at $msgStart")
    require(ni.toLong * nj <= Int.MaxValue, // points is an Int; a corrupt
      // grid size must not wrap it
      s"$path: grid $ni x $nj overflows the per-message cell count")
    require(nPresent <= ni.toLong * nj, // more present cells than grid cells
      s"$path: section 5 declares $nPresent data points for a $ni x $nj grid")
    if (bitmapOffset < 0) nPresent = ni * nj
    GribMessage(path, ni, nj, latFirst, lonFirst, di, dj, jAscending,
      number, stepHours, refEpoch, refValue, binScale, decScale, nbits,
      nPresent, bitmapOffset, dataOffset, dataLen, complex, png, j2k, ccsds,
      ieeePrecision)
  }
}

/** MSB-first bit reader over a section-7 body (the complex-packing
  * decode path; the simple-packing hot loop keeps its inline
  * accumulator). `align()` discards the remainder of a partially
  * consumed byte — each descriptor sequence in templates 7.2/7.3 is
  * zero-padded to a byte boundary. Bounds-checked: a corrupt header
  * whose group descriptors overrun the payload fails naming the file,
  * not as an opaque ArrayIndexOutOfBoundsException. */
private[sources] final class GribBitReader(b: Array[Byte], path: String) {
  private var bytePos = 0
  private var acc = 0L
  private var accBits = 0

  def read(nbits: Int): Long = {
    if (nbits == 0) return 0L
    while (accBits < nbits) {
      require(bytePos < b.length,
        s"$path: packed data exhausted at byte $bytePos (corrupt group descriptors?)")
      acc = (acc << 8) | (b(bytePos) & 0xFFL)
      accBits += 8
      bytePos += 1
    }
    val v = (acc >>> (accBits - nbits)) & ((1L << nbits) - 1)
    accBits -= nbits
    v
  }

  /** GRIB2 signed field over whole octets: MSB is the sign bit
    * (sign-and-magnitude, like the section-3/5 scaled integers). */
  def readSignMagnitude(octets: Int): Long = {
    val raw = read(octets * 8)
    val signBit = 1L << (octets * 8 - 1)
    if ((raw & signBit) != 0) -(raw & (signBit - 1)) else raw
  }

  /** Drop to the next byte boundary (leftover is always < 8 bits: bytes
    * are loaded only on demand). */
  def align(): Unit = { acc = 0L; accBits = 0 }

  /** Unary / fundamental-sequence read: the count of 0 bits before the
    * next 1 (which is consumed). Byte-at-a-time via highest-set-bit
    * arithmetic — the CCSDS decode hot path calls this per sample, and a
    * bit-at-a-time loop was its dominant cost. `max` bounds a corrupt
    * all-zeros stream (fails loudly instead of walking to the buffer
    * end one byte at a time for gigabytes). */
  def readUnary(max: Long): Long = {
    var z = 0L
    while (true) {
      if (accBits == 0) {
        require(bytePos < b.length,
          s"$path: packed data exhausted at byte $bytePos (unterminated " +
            "fundamental sequence?)")
        acc = b(bytePos) & 0xFFL
        accBits = 8
        bytePos += 1
      }
      val window = acc & ((1L << accBits) - 1)
      if (window == 0L) {
        z += accBits
        accBits = 0
      } else {
        val highest = 63 - java.lang.Long.numberOfLeadingZeros(window)
        z += accBits - 1 - highest
        accBits = highest // zeros and the terminating 1 consumed
        return z
      }
      require(z <= max,
        s"$path: fundamental-sequence codeword exceeds $max")
    }
    z // unreachable
  }
}

/** Persistent sidecar store for a GRIB file's driver-side message index
  * (the `indexCacheDir` option): one compact binary file per data file,
  * keyed by (path, length, mtime) — any re-drop of the data invalidates by
  * key, no TTL logic. Writes are tmp+rename so concurrent drivers race
  * benignly (both write identical content; rename is atomic-or-overwrites
  * on HDFS-like stores). A sidecar that fails to parse for ANY reason —
  * truncation, version bump, foreign bytes — falls back to a fresh header
  * walk and is rewritten; the cache can never poison a scan, only skip
  * RPCs. Hit/miss counters are exposed for tests and ops.
  */
private[graft] object GribIndexCache {
  private val Magic = 0x47524958 // "GRIX"
  // v2: + dataLen and the optional complex-packing (5.2/5.3) parameters.
  // v3: + the PNG-packing (5.41) flag.
  // v4: + the optional CCSDS (5.42) parameters.
  // A version bump benignly invalidates older sidecars (fresh walk + rewrite).
  private val Version = 6 // v6: +ieeePrecision (DRS 5.4 IEEE floats)
  val hits = new java.util.concurrent.atomic.AtomicLong
  val misses = new java.util.concurrent.atomic.AtomicLong

  /** `<name>.<sha of (path,len,mtime)>.gribidx` — the name survives for
    * humans; the digest is the actual key, so path moves or rewrites in
    * place never read a stale index. */
  private[sources] def sidecarPath(
      dir: String, st: org.apache.hadoop.fs.FileStatus): Path = {
    val key = s"${st.getPath}|${st.getLen}|${st.getModificationTime}"
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(12).map(b => f"$b%02x").mkString
    new Path(dir, s"${st.getPath.getName}.$sha.gribidx")
  }

  def readThrough(
      spec: GribSpec, dir: String, st: org.apache.hadoop.fs.FileStatus)(
      walk: () => Seq[GribMessage]): Seq[GribMessage] = {
    val fs = FileSystem.get(new Path(dir).toUri, spec.conf.value)
    val sidecar = sidecarPath(dir, st)
    read(fs, sidecar, st.getPath.toString) match {
      case Some(msgs) => hits.incrementAndGet(); msgs
      case None =>
        val msgs = walk()
        misses.incrementAndGet()
        try write(fs, sidecar, st.getPath.toString, msgs)
        catch { case e: java.io.IOException =>
          // a read-only or full cache volume must not fail the scan
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"could not write GRIB index sidecar $sidecar: $e")
        }
        msgs
    }
  }

  private def read(
      fs: FileSystem, sidecar: Path, expectPath: String): Option[Seq[GribMessage]] =
    try {
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(fs.open(sidecar)))
      try {
        if (in.readInt() != Magic || in.readInt() != Version) return None
        if (in.readUTF() != expectPath) return None
        val n = in.readInt()
        if (n < 0) return None
        val out = Vector.newBuilder[GribMessage]
        var i = 0
        while (i < n) {
          out += GribMessage(expectPath,
            ni = in.readInt(), nj = in.readInt(),
            latFirstMicro = in.readLong(), lonFirstMicro = in.readLong(),
            diMicro = in.readLong(), djMicro = in.readLong(),
            jAscending = in.readBoolean(),
            number = { val has = in.readBoolean(); val v = in.readInt()
              if (has) Some(v) else None },
            stepHours = in.readInt(), refEpoch = in.readLong(),
            refValue = in.readFloat(), binScale = in.readInt(),
            decScale = in.readInt(), nbits = in.readInt(),
            nPresent = in.readInt(),
            bitmapOffset = in.readLong(), dataOffset = in.readLong(),
            dataLen = in.readInt(),
            complex = {
              if (!in.readBoolean()) None
              else Some(ComplexParams(
                ng = in.readInt(),
                refGroupWidth = in.readInt(), groupWidthBits = in.readInt(),
                refGroupLen = in.readInt(), lenInc = in.readInt(),
                lastGroupLen = in.readInt(), groupLenBits = in.readInt(),
                spatialOrder = in.readInt(), extraOctets = in.readInt()))
            },
            png = in.readBoolean(),
            j2k = in.readBoolean(),
            ccsds = {
              if (!in.readBoolean()) None
              else Some(CcsdsParams(flags = in.readInt(),
                blockSize = in.readInt(), rsi = in.readInt()))
            },
            ieeePrecision = in.readInt())
          i += 1
        }
        Some(out.result())
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  private def write(
      fs: FileSystem, sidecar: Path, path: String, msgs: Seq[GribMessage]): Unit = {
    val tmp = new Path(sidecar.getParent,
      s".${sidecar.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    fs.mkdirs(sidecar.getParent)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(tmp, true)))
    try {
      out.writeInt(Magic); out.writeInt(Version)
      out.writeUTF(path)
      out.writeInt(msgs.length)
      msgs.foreach { m =>
        out.writeInt(m.ni); out.writeInt(m.nj)
        out.writeLong(m.latFirstMicro); out.writeLong(m.lonFirstMicro)
        out.writeLong(m.diMicro); out.writeLong(m.djMicro)
        out.writeBoolean(m.jAscending)
        out.writeBoolean(m.number.isDefined); out.writeInt(m.number.getOrElse(0))
        out.writeInt(m.stepHours); out.writeLong(m.refEpoch)
        out.writeFloat(m.refValue); out.writeInt(m.binScale)
        out.writeInt(m.decScale); out.writeInt(m.nbits)
        out.writeInt(m.nPresent)
        out.writeLong(m.bitmapOffset); out.writeLong(m.dataOffset)
        out.writeInt(m.dataLen)
        out.writeBoolean(m.complex.isDefined)
        m.complex.foreach { cp =>
          out.writeInt(cp.ng)
          out.writeInt(cp.refGroupWidth); out.writeInt(cp.groupWidthBits)
          out.writeInt(cp.refGroupLen); out.writeInt(cp.lenInc)
          out.writeInt(cp.lastGroupLen); out.writeInt(cp.groupLenBits)
          out.writeInt(cp.spatialOrder); out.writeInt(cp.extraOctets)
        }
        out.writeBoolean(m.png)
        out.writeBoolean(m.j2k)
        out.writeBoolean(m.ccsds.isDefined)
        m.ccsds.foreach { cc =>
          out.writeInt(cc.flags); out.writeInt(cc.blockSize)
          out.writeInt(cc.rsi)
        }
        out.writeInt(m.ieeePrecision)
      }
    } finally out.close()
    // some filesystems (LocalFileSystem among them) refuse to rename onto
    // an existing destination — e.g. a corrupt sidecar being repaired:
    // clear it and retry once; a still-failing rename means a concurrent
    // writer won with identical content, so just drop the tmp
    if (!fs.rename(tmp, sidecar)) {
      fs.delete(sidecar, false)
      if (!fs.rename(tmp, sidecar)) fs.delete(tmp, false)
    }
  }
}

private class GribTable(spec: GribSpec) extends Table with SupportsRead {
  override def name(): String = s"grib(${spec.path})"
  override def schema(): StructType = GribSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GribScanBuilder(spec)
}

/** Message-level pruning (the GRIB analog of row-group pruning): predicates
  * on `number` and `step_hours` are evaluated against the driver-side
  * message index, and non-matching messages are never read. NULL semantics:
  * a template-4.0 message has no `number`, so any comparison predicate on
  * `number` drops it (SQL three-valued logic — NULL compares to nothing).
  * Filters compile to message PREDICATES (not an eager prune) so the same
  * pushdown serves the batch scan and every streaming micro-batch. */
private object GribPruning {
  def toPredicate(f: Filter): Option[GribMessage => Boolean] = f match {
    case EqualTo("number", v: Number) =>
      Some(_.number.contains(v.intValue()))
    case In("number", vs) =>
      val set = vs.collect { case v: Number => v.intValue() }.toSet
      Some(_.number.exists(set))
    case IsNotNull("number") =>
      Some(_.number.isDefined)
    case GreaterThan("number", v: Number) =>
      Some(_.number.exists(_ > v.intValue()))
    case GreaterThanOrEqual("number", v: Number) =>
      Some(_.number.exists(_ >= v.intValue()))
    case LessThan("number", v: Number) =>
      Some(_.number.exists(_ < v.intValue()))
    case LessThanOrEqual("number", v: Number) =>
      Some(_.number.exists(_ <= v.intValue()))
    case EqualTo("step_hours", v: Number) =>
      Some(_.stepHours == v.intValue())
    case In("step_hours", vs) =>
      val set = vs.collect { case v: Number => v.intValue() }.toSet
      Some(m => set(m.stepHours))
    case GreaterThan("step_hours", v: Number) =>
      Some(_.stepHours > v.intValue())
    case GreaterThanOrEqual("step_hours", v: Number) =>
      Some(_.stepHours >= v.intValue())
    case LessThan("step_hours", v: Number) =>
      Some(_.stepHours < v.intValue())
    case LessThanOrEqual("step_hours", v: Number) =>
      Some(_.stepHours <= v.intValue())
    case And(l, r) =>
      for (pl <- toPredicate(l); pr <- toPredicate(r)) yield (m: GribMessage) => pl(m) && pr(m)
    case _ => None
  }
}

private class GribScanBuilder(spec: GribSpec)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var preds: Seq[GribMessage => Boolean] = Nil
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GribSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val compiled = filters.map(f => f -> GribPruning.toPredicate(f))
    pushed = compiled.collect { case (f, Some(_)) => f }
    preds = compiled.collect { case (_, Some(p)) => p }.toSeq
    compiled.collect { case (f, None) => f }
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new GribScan(spec, preds, required)
}

private class GribScan(
    spec: GribSpec, preds: Seq[GribMessage => Boolean], required: StructType)
  extends Scan with Batch with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  /** Batch message index, pruned — computed lazily so a STREAMING scan
    * (which indexes per micro-batch instead) never lists or walks files
    * that may not exist yet. */
  private lazy val messages: Seq[GribMessage] =
    GribModel.indexAll(spec).filter(m => preds.forall(_(m)))

  // Set when toMicroBatchStream is called (stream start, before any batch
  // executes): description() and estimateStatistics() are invoked on every
  // executed micro-batch plan (MicroBatchScanExec inherits the batch
  // plumbing), and in streaming mode they must NOT force `messages` — that
  // would full-index the whole directory per batch (defeating incremental
  // indexing) and crash on the empty directory a stream legitimately
  // starts against.
  @volatile private var streaming = false

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // fail loudly rather than silently hand back cell-balanced partitions:
    // a stream's micro-batches are per-file (single-step) anyway, so the
    // option cannot mean anything there — a user setting it on readStream
    // almost certainly expected the batch exchange-free plan
    require(!spec.partitionByStep,
      "partitionByStep is batch-only (a streaming micro-batch is already " +
        "per-file, one step per file at the GloFAS cadence) — drop the " +
        "option for readStream")
    streaming = true
    new GribMicroBatchStream(spec, preds, GribCol.ordinals(required),
      checkpointLocation)
  }
  override def description(): String =
    if (streaming)
      s"GribScan(${spec.path}, streaming, cols=[${required.fieldNames.mkString(",")}])"
    else
      s"GribScan(${spec.path}, messages=${messages.size}, " +
        s"cols=[${required.fieldNames.mkString(",")}])"

  /** Exact post-pruning cardinality from the message index — a
    * member/step-pruned scan reports only its surviving messages' points,
    * so Catalyst can broadcast one member's track against a big table.
    * Streaming: unknown (per-batch cardinality lives in the stream). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows =
      if (streaming) util.OptionalLong.empty()
      else util.OptionalLong.of(messages.map(_.points.toLong).sum)
    private val rowBytes = required.fields.map(_.dataType.defaultSize.toLong).sum
    override def sizeInBytes(): util.OptionalLong =
      if (rows.isPresent) util.OptionalLong.of(rows.getAsLong * rowBytes)
      else util.OptionalLong.empty()
    override def numRows(): util.OptionalLong = rows
  }

  /** One partition per distinct `step_hours`, each carrying its key
    * ([[org.apache.spark.sql.connector.read.HasPartitionKey]]) — the
    * physical clustering [[outputPartitioning]] declares. Message order
    * within a step stays file-ordered (one open stream per file). */
  private lazy val stepSlices: Array[InputPartition] = {
    val ords = GribCol.ordinals(required)
    messages.groupBy(_.stepHours).toSeq.sortBy(_._1).map { case (step, ms) =>
      GribStepPartition(ms.toArray, ords, spec.conf, step): InputPartition
    }.toArray
  }

  /** True only when the clustering is actually CONSUMABLE: the key column
    * must survive column pruning (Catalyst resolves the partition
    * expression against the scan output), and the session must have v2
    * bucketing on — Spark ignores reported clusterings without it, and
    * step-sliced partitions would then cap parallelism at the
    * distinct-step count while still paying the full shuffle.
    *
    * Evaluated ONCE (first use, on the planning thread, where the session
    * conf is live) and pinned: `outputPartitioning()` and
    * `planInputPartitions()` are separate callbacks, and a bucketing flag
    * flipped between them would otherwise make the declared
    * KeyGroupedPartitioning and the actual partitions disagree — a
    * runtime planning failure instead of a consistent plan. */
  private lazy val reportsStepClustering: Boolean = {
    if (!spec.partitionByStep) false
    else {
      val bucketing = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.sql.sources.v2.bucketing.enabled", "false").toBoolean
      if (!bucketing)
        org.slf4j.LoggerFactory.getLogger(classOf[GribSource]).warn(
          "partitionByStep=true ignored: set spark.sql.sources.v2.bucketing.enabled=true " +
            "for Catalyst to consume the reported step clustering; falling back " +
            "to cell-balanced partitions")
      bucketing && required.fieldNames.contains("step_hours")
    }
  }

  /** Declare the scan's physical clustering so Catalyst drops the
    * exchange for any aggregation/join keyed on a superset of
    * `step_hours` (needs `spark.sql.sources.v2.bucketing.enabled`). At
    * GloFAS day shape this removes the only 985M-row shuffle in the E1
    * pipeline — the members of a (cell, step) group never leave their
    * step's partition. */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (reportsStepClustering)
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions.identity("step_hours")),
        stepSlices.length)
    else new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)

  override def planInputPartitions(): Array[InputPartition] =
    if (reportsStepClustering) stepSlices
    else GribCol.slice(messages, spec.numPartitions, GribCol.ordinals(required), spec.conf)
  override def createReaderFactory(): PartitionReaderFactory = new GribReaderFactory
}

/** Streaming micro-batches over a GRIB directory/glob: the operational
  * shape — a GloFAS day drops one file per leadtime as the CDS fetches
  * complete — consumed incrementally instead of by a daily batch job.
  *
  * Offset model: the checkpointed offset is a plain BATCH ID; the file
  * sets live in a compacted seen-file side-log ([[GribFileLog]]) under the
  * stream's checkpoint directory — the built-in file stream source's
  * design, so the engine's offset WAL stays O(1) per entry and one stream
  * can outlive years of drops (the old full-file-list offset grew
  * O(files ever seen) per WAL entry, ≈1 MB/offset after a year at the
  * GloFAS 30-files/day cadence). Files are immutable once dropped
  * (write-then-rename), and the seen set is append-only: a processed file
  * later deleted by retention stays seen — a next-day drop REUSING the
  * name (the GloFAS per-leadtime convention) is not re-ingested. Optional
  * `maxFileAge` additionally ignores-and-forgets files older than the
  * newest drop by that much, bounding the seen set itself.
  *
  * Each micro-batch indexes ONLY its new files (driver thread pool,
  * KB-sized header reads), applies the compiled message predicates, and
  * distributes the surviving messages across `numPartitions` ranged-read
  * partitions — the identical executor path as the batch scan.
  * `Trigger.AvailableNow` gives catch-up-then-stop daily runs. */
private class GribMicroBatchStream(
    spec: GribSpec, preds: Seq[GribMessage => Boolean], cols: Array[Int],
    checkpointLocation: String)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private val log = new GribFileLog(
    new Path(checkpointLocation, "filelog"), spec.conf, spec.compactInterval)

  private def currentListing(): Seq[(String, Long)] =
    GribModel.listFiles(spec)
      .map(st => (st.getPath.toString, st.getModificationTime)).toSeq

  // Trigger.AvailableNow contract: the end offset is FROZEN at query start
  // (files landing mid-run belong to the next run), then batches drain up
  // to it and the query stops — the catch-up-then-stop daily shape.
  private var availableNowCap: Option[Seq[(String, Long)]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(currentListing())
  override def getDefaultReadLimit: ReadLimit =
    if (spec.maxFilesPerTrigger > 0) ReadLimit.maxFiles(spec.maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  /** Admit new files into the next batch: list, drop already-seen paths
    * and (with `maxFileAge`) stale ones, cap at the read limit, record the
    * admitted set in the side-log under the NEXT batch id, and return that
    * id as the offset. No new files → the start offset comes back
    * unchanged and no batch fires. The log write precedes the engine's
    * offset WAL write, so a replayed batch always finds its file set; a
    * crash in between re-runs this method, which idempotently overwrites
    * the never-committed batch id. */
  // Side-log contents cached across triggers: this instance is the log's
  // only writer, so after one disk read per (re)start the cache is
  // maintained by its own admissions — without it every trigger re-lists
  // and re-parses the full seen set, making trigger latency O(files ever
  // seen) in log I/O on an object store (the built-in file source keeps
  // the same in-memory map for the same reason).
  private var seenCache: Option[(Long, Seq[GribFileEntry])] = None
  private def seenUpToCached(batchId: Long): Seq[GribFileEntry] =
    seenCache match {
      case Some((id, entries)) if id == batchId => entries
      case _ =>
        val entries = log.seenUpTo(batchId)
        seenCache = Some((batchId, entries))
        entries
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startId = start.asInstanceOf[GribStreamOffset].batchId
    val seenEntries = seenUpToCached(startId)
    val seen = seenEntries.map(_.path).toSet
    val listed = availableNowCap.getOrElse(currentListing())
    // age cutoff trails the newest modification time ever observed — wall
    // clock never enters (immune to clock skew between driver and store)
    val cutoff =
      if (spec.maxFileAgeMs <= 0) Long.MinValue
      else (seenEntries.map(_.modTime) ++ listed.map(_._2))
        .maxOption.fold(Long.MinValue)(_ - spec.maxFileAgeMs)
    val fresh = listed
      .filter { case (p, mt) => !seen(p) && mt >= cutoff }
      .sortBy(_._1)
    val admitted = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        fresh.take(m.maxFiles())
      case _ => fresh
    }
    if (admitted.isEmpty) GribStreamOffset(startId)
    else {
      val id = startId + 1
      val entries = admitted.map { case (p, mt) => GribFileEntry(p, mt, id) }
      log.add(id, entries, cutoff)
      // mirror the log's expiry (a dropped entry is safe to forget: the
      // age filter above excludes it from admission forever — cutoff only
      // ever grows — so it can never be re-ingested)
      val merged = seenEntries ++ entries
      seenCache = Some((id,
        if (cutoff > Long.MinValue)
          merged.filter(e => e.modTime >= cutoff || e.batchId == id)
        else merged))
      GribStreamOffset(id)
    }
  }

  override def initialOffset(): Offset = GribStreamOffset(-1L)
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset =
    GribStreamOffset.parseLegacy(json) match {
      case None => GribStreamOffset.fromJson(json)
      case Some(paths) => migrateLegacyOffset(paths)
    }

  /** Migrate a pre-side-log offset (a full file-path list) onto the
    * batch-id model instead of bricking the checkpoint: seed the seen set
    * into [[GribFileLog]] and hand the engine an equivalent batch id, so a
    * version upgrade resumes in place — no fresh checkpoint directory, no
    * re-ingesting every file still in the glob into an append sink.
    *
    * The engine restores one or two legacy offsets at restart (the last
    * WAL entry, plus the previous one when the last batch was never
    * committed), in either order. First legacy list seen → seed batch 0
    * EMPTY and batch 1 with the list, return 1 (batch 0 is held in
    * reserve). Each further legacy list L is then mapped:
    *  - L == the seen set at some batch id → that id (idempotent re-parse);
    *  - L ⊂ the seeded set, nothing but the seeds in the log → L is the
    *    committed START below the already-returned END: split the seeds
    *    (batch 0 ← L, batch 1 ← rest) and return 0, so the engine's
    *    replay of (0, 1] re-reads exactly the uncommitted tail;
    *  - L ⊃ everything seen → L is the END above an already-returned
    *    START: append the difference as the next batch and return its id;
    *  - anything else → corrupted checkpoint, fail loudly.
    * All outcomes leave the log consistent for normal operation — offsets
    * the engine writes from here on are batch-id format. */
  private def migrateLegacyOffset(paths: List[String]): GribStreamOffset =
    synchronized {
      val logger = org.slf4j.LoggerFactory.getLogger(classOf[GribSource])
      val want = paths.toSet
      val fs = FileSystem.get(new Path(spec.path).toUri, spec.conf.value)
      def entriesFor(ps: Seq[String], id: Long): Seq[GribFileEntry] =
        GribModel.parallelMap(ps.sorted) { p =>
          // modTime drives only maxFileAge expiry; a vanished file can
          // never be re-listed, so 0 (= expire-eligible) is safe for it
          val mt =
            try fs.getFileStatus(new Path(p)).getModificationTime
            catch { case _: java.io.FileNotFoundException => 0L }
          GribFileEntry(p, mt, id)
        }
      def seed(): GribStreamOffset = {
        logger.warn(s"migrating legacy GRIB stream offset (${paths.size} " +
          s"files) at '$checkpointLocation' to the batch-id side-log format")
        log.markLegacyMigrated()
        log.add(0L, Nil, Long.MinValue)
        log.add(1L, entriesFor(paths, 1L), Long.MinValue)
        seenCache = None
        GribStreamOffset(1L)
      }
      val idsAtEntry = log.listIds()
      if (!log.legacyMigrated) {
        require(idsAtEntry.isEmpty,
          s"legacy full-file-list offset found, but the checkpoint at " +
            s"'$checkpointLocation' already has a batch-id file log — " +
            "mixed/corrupted checkpoint state")
        seed()
      } else if (idsAtEntry.isEmpty) {
        // crash landed between the marker write and the first seed batch:
        // nothing was seeded, so re-seeding is the correct (and only)
        // recovery — without this branch, the match below would die on
        // `ids.max` of an empty log on every restart, forever
        seed()
      } else {
        // Torn-state repairs, in write-order of the windows they close
        // (writeBytesAtomic's overwrite is delete+rename on a local FS, so
        // every overwrite of an EXISTING batch file has a crash window):
        //  - batch 0 vanished mid-overwrite (ids == [1]) → re-create it
        //    empty, restoring the original seed layout; the match/split
        //    logic below then proceeds exactly as on first migration
        //    (without this, seenUpTo(1)'s contiguity check bricks the
        //    checkpoint on every restart);
        //  - batch 1 vanished mid-overwrite (ids == [0]) needs no special
        //    case: the superset fallback below re-appends the tail;
        //  - split interrupted between the two writes → batch 0 holds the
        //    committed prefix while batch 1 still holds the FULL list;
        //    replaying (0, 1] would silently re-ingest the prefix. The
        //    state is detectable (batch 0 non-empty AND overlapping
        //    batch 1) and the repair is the same idempotent rewrite.
        if (idsAtEntry == Seq(1L)) {
          logger.warn("legacy offset migration: re-creating batch 0 lost " +
            "to an interrupted overwrite")
          log.add(0L, Nil, Long.MinValue)
          seenCache = None
        }
        if (log.listIds() == Seq(0L, 1L)) {
          val b0 = log.filesForBatch(0L)
          val b0Paths = b0.map(_.path).toSet
          val b1 = log.filesForBatch(1L)
          if (b0Paths.nonEmpty && b1.exists(e => b0Paths(e.path))) {
            logger.warn("completing a torn legacy-offset split " +
              s"(${b0Paths.size} committed / ${b1.count(e => !b0Paths(e.path))} " +
              "uncommitted files)")
            log.rewriteMigrationSplit(b0,
              b1.filterNot(e => b0Paths(e.path)).map(_.copy(batchId = 1L)))
            seenCache = None
          }
        }
        val ids = log.listIds()
        ids.find(id => log.seenUpTo(id).map(_.path).toSet == want) match {
          case Some(id) => GribStreamOffset(id)
          case None =>
            val maxId = ids.max
            val all = log.seenUpTo(maxId).map(_.path).toSet
            if (want.subsetOf(all) && ids == Seq(0L, 1L)) {
              val tail = (all -- want).toSeq
              logger.warn(s"legacy offset migration: splitting ${want.size} " +
                s"committed / ${tail.size} uncommitted files for replay")
              log.rewriteMigrationSplit(
                entriesFor(want.toSeq, 0L), entriesFor(tail, 1L))
              seenCache = None
              GribStreamOffset(0L)
            } else if (all.subsetOf(want)) {
              val id = maxId + 1
              log.add(id, entriesFor((want -- all).toSeq, id), Long.MinValue)
              seenCache = None
              GribStreamOffset(id)
            } else throw new IllegalStateException(
              s"legacy GRIB stream offset (${want.size} files) does not " +
                s"align with the migrated side-log at '$checkpointLocation' " +
                s"(batch ids ${ids.mkString(", ")}) — corrupted checkpoint")
        }
      }
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val startId = start.asInstanceOf[GribStreamOffset].batchId
    val endId = end.asInstanceOf[GribStreamOffset].batchId
    if (endId <= startId) return Array.empty
    // the side-log, not a re-glob, names this batch's files: on restart
    // this batch replays from checkpointed offsets and must read the
    // identical set; a file that vanished since fails loudly by default
    // (ignoreMissingFiles=true opts into warn-and-skip)
    val newPaths = ((startId + 1) to endId).flatMap(log.filesForBatch).map(_.path)
    if (newPaths.isEmpty) return Array.empty
    val files = GribModel.resolveStatuses(spec, newPaths)
    val msgs = GribModel.indexFiles(spec, files).filter(m => preds.forall(_(m)))
    GribCol.slice(msgs, spec.numPartitions, cols, spec.conf)
  }

  override def createReaderFactory(): PartitionReaderFactory = new GribReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The checkpointed stream offset: just the last admitted batch id (−1 =
  * nothing yet); the corresponding file sets live in [[GribFileLog]]. */
private[sources] final case class GribStreamOffset(batchId: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    org.json4s.jackson.Serialization.write(Map("batchId" -> batchId))(
      org.json4s.DefaultFormats)
}

private[sources] object GribStreamOffset {
  def fromJson(s: String): GribStreamOffset =
    org.json4s.jackson.JsonMethods.parse(s) \ "batchId" match {
      case org.json4s.JInt(id) => GribStreamOffset(id.toLong)
      case org.json4s.JLong(id) => GribStreamOffset(id)
      case _ => throw new IllegalStateException(
        s"unrecognized GRIB stream offset '$s': neither a batch-id offset " +
          "nor a legacy file-list offset")
    }

  /** The pre-side-log offset format: a bare JSON array of file paths
    * (the cumulative seen set). Some(paths) iff `s` is that shape —
    * handled by GribMicroBatchStream.deserializeOffset's migration. */
  def parseLegacy(s: String): Option[List[String]] =
    org.json4s.jackson.JsonMethods.parseOpt(s).collect {
      case org.json4s.JArray(items) if items.forall(_.isInstanceOf[org.json4s.JString]) =>
        items.collect { case org.json4s.JString(p) => p }
    }
}

private object GribCol {
  val Lat = 0; val Lon = 1; val Number = 2; val Step = 3; val RefTime = 4; val Value = 5

  /** Column ordinals resolved ONCE at plan time — the per-cell emit loop
    * switches on ints, never on field-name strings. */
  def ordinals(required: StructType): Array[Int] = required.fieldNames.map {
    case "latitude" => Lat
    case "longitude" => Lon
    case "number" => Number
    case "step_hours" => Step
    case "ref_time" => RefTime
    case "value" => Value
    case other => throw new IllegalArgumentException(
      s"column '$other' is not in the GribSource schema " +
        s"(${GribSource.Schema.fieldNames.mkString(", ")})")
  }

  /** Contiguous message slices over `numPartitions`, WEIGHT-balanced by
    * cell count — shared by the batch scan and every streaming
    * micro-batch. A count-based split is fine for a homogeneous GloFAS
    * day (every message the same grid), but a glob mixing small and huge
    * grids would hand one partition all the big messages and make it the
    * straggler; balancing by points keeps per-partition emit work even.
    * Slices stay CONTIGUOUS (file-ordered), preserving the
    * one-open-stream-per-file reader optimization. */
  def slice(
      messages: Seq[GribMessage], numPartitions: Int, cols: Array[Int],
      conf: SerializableHadoopConf): Array[InputPartition] = {
    if (messages.isEmpty) return Array.empty
    val n = math.max(1, math.min(numPartitions, messages.size))
    val weights = messages.map(_.points.toLong.max(1L))
    val total = weights.sum
    val out = Array.newBuilder[InputPartition]
    var from = 0
    var cum = 0L
    for (p <- 0 until n) {
      var to = from
      val target = (total * (p + 1)) / n
      // take at least one message; keep taking while the cumulative weight
      // is below this slice's absolute boundary (boundaries are cumulative
      // fractions of the total, so overshoot does not compound); leave at
      // least one message per remaining slice
      val cap = messages.size - (n - 1 - p)
      while (to < cap && (to == from || cum < target)) {
        cum += weights(to)
        to += 1
      }
      out += GribPartition(messages.slice(from, to).toArray, cols, conf)
      from = to
    }
    out.result()
  }
}

/** Common shape of a GRIB executor slice; only the step-keyed variant
  * implements `HasPartitionKey`, so an unkeyed partition can never be
  * asked for a key it does not have (the invariant lives in the type). */
private sealed trait GribPartitionBase extends InputPartition {
  def messages: Array[GribMessage]
  def cols: Array[Int]
  def conf: SerializableHadoopConf
}

private final case class GribPartition(
    messages: Array[GribMessage], cols: Array[Int],
    conf: SerializableHadoopConf) extends GribPartitionBase

/** A whole-step slice under `partitionByStep`: carries the `step_hours`
  * key Spark matches against the scan's reported clustering. */
private final case class GribStepPartition(
    messages: Array[GribMessage], cols: Array[Int],
    conf: SerializableHadoopConf, step: Int)
  extends GribPartitionBase
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = {
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    row.setInt(0, step)
    row
  }
}

private class GribReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GribPartitionBase]
    new PartitionReader[InternalRow] {
      private val needValue = p.cols.contains(GribCol.Value)
      // ONE stream per FILE, reopened only when the message sequence moves
      // to the next file — a partition may hold hundreds of messages (a
      // GloFAS day is 1530 across 30 files) and per-message open/close
      // would dominate on object stores; messages are file-ordered, so
      // each file opens at most once per partition
      private var inOpt: Option[FSDataInputStream] = None
      private var openPath: String = null
      private def in(path: String): FSDataInputStream = {
        if (openPath != path) {
          inOpt.foreach(_.close())
          inOpt = Some(FileSystem.get(new Path(path).toUri, p.conf.value)
            .open(new Path(path)))
          openPath = path
        }
        inOpt.get
      }
      private var msgIdx = -1
      private var cell = 0
      private var current: GribMessage = _
      private var bitmap: Array[Byte] = _ // null = all present
      private var values: Array[Double] = _ // decoded, indexed by PRESENT ordinal
      private var presentBefore = 0 // running count of present cells < `cell`

      // ONE mutable row reused across every get() call: the per-cell emit
      // is the scan's hot loop (a GloFAS day is ≈985 M cells), and a fresh
      // boxed Array[Any] + GenericInternalRow per cell would make
      // allocation the scan's dominant cost. Reuse is the InternalRow
      // contract — consumers copy when they buffer. Projected columns are
      // all primitive, so SpecificInternalRow holds them unboxed.
      private val row = new org.apache.spark.sql.catalyst.expressions.SpecificInternalRow(
        p.cols.toIndexedSeq.map {
          case GribCol.Lat | GribCol.Lon | GribCol.Value => DoubleType: DataType
          case GribCol.Number | GribCol.Step => IntegerType
          case GribCol.RefTime => LongType
        })

      private def loadMessage(): Unit = {
        current = p.messages(msgIdx)
        cell = 0
        presentBefore = 0
        // the bitmap only drives `value` decode and NULL-ing — every grid
        // cell emits a row either way — so a value-pruned scan (count(),
        // metadata queries) skips the bitmap read AND its O(points)
        // consistency walk entirely
        bitmap =
          if (!needValue || current.bitmapOffset < 0) null
          else readBytes(current.bitmapOffset, (current.points + 7) / 8)
        if (bitmap != null) {
          // the bitmap popcount and section 5's nPresent both size the
          // packed payload; a corrupt mismatch must fail naming the file,
          // not as an index error deep in the emit loop
          var pc = 0
          var c = 0
          while (c < current.points) { if (present(c)) pc += 1; c += 1 }
          require(pc == current.nPresent,
            s"${current.path}: bitmap marks $pc present cells but section 5 " +
              s"declares ${current.nPresent}")
        }
        values =
          if (!needValue) null
          else if (current.ieeePrecision > 0) {
            // IEEE floating point (5.4): section 7 is raw big-endian
            // float32/float64 samples over the present cells — no R/E/D
            // scaling. Both widths widen to Double bit-exactly.
            val width = if (current.ieeePrecision == 1) 4 else 8
            require(current.dataLen >= current.nPresent.toLong * width,
              s"${current.path}: IEEE section 7 holds ${current.dataLen} " +
                s"bytes but ${current.nPresent} ${width * 8}-bit samples " +
                s"need ${current.nPresent.toLong * width}")
            val body = readBytes(current.dataOffset, current.nPresent.toLong * width)
            val bb = java.nio.ByteBuffer.wrap(body) // big-endian by default
            val out = new Array[Double](current.nPresent)
            var i = 0
            if (width == 4) while (i < out.length) { out(i) = bb.getFloat(); i += 1 }
            else while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
            out
          }
          else if (current.png && current.nbits > 0)
            // PNG packing (5.41): the whole section-7 body is one PNG
            // stream whose raster bytes ARE the packed value stream
            decode(decodePngRaster(
              readBytes(current.dataOffset, current.dataLen.toLong), current),
              current)
          else if (current.j2k && current.nbits > 0) {
            // JPEG 2000 packing (5.40, lossless): EBCOT/MQ decode to the
            // packed X stream, then the shared Y = (R + X*2^E) / 10^D
            val xs = J2kDecoder.decode(
              readBytes(current.dataOffset, current.dataLen.toLong),
              current.nPresent, current.nbits, current.path)
            val out = new Array[Double](current.nPresent)
            val r = current.refValue.toDouble
            val twoE = math.pow(2.0, current.binScale)
            val tenD = math.pow(10.0, current.decScale)
            var i = 0
            while (i < out.length) {
              out(i) = (r + xs(i) * twoE) / tenD
              i += 1
            }
            out
          }
          else if (current.ccsds.isDefined && current.nbits > 0) {
            // CCSDS/AEC (5.42): entropy-decode to the packed X stream,
            // then the shared Y = (R + X·2^E) / 10^D scaling
            val cp = current.ccsds.get
            val xs = CcsdsDecoder.decode(
              readBytes(current.dataOffset, current.dataLen.toLong),
              current.nPresent, current.nbits, cp.flags, cp.blockSize,
              cp.rsi, current.path)
            val out = new Array[Double](current.nPresent)
            val r = current.refValue.toDouble
            val twoE = math.pow(2.0, current.binScale)
            val tenD = math.pow(10.0, current.decScale)
            var i = 0
            while (i < out.length) {
              out(i) = (r + xs(i) * twoE) / tenD
              i += 1
            }
            out
          } else current.complex match {
            case Some(cp) =>
              // complex packing has a variable-length payload (group
              // descriptors + per-group widths): read the whole
              // section-7 body as indexed
              decodeComplex(readBytes(current.dataOffset, current.dataLen.toLong),
                current, cp)
            case None =>
              val packed = readBytes(current.dataOffset,
                (current.nPresent.toLong * current.nbits + 7) / 8)
              decode(packed, current)
          }
        // message-invariant columns are written ONCE here, not per cell
        var c = 0
        while (c < p.cols.length) {
          p.cols(c) match {
            case GribCol.Number => current.number match {
              case Some(n) => row.setInt(c, n)
              case None => row.setNullAt(c)
            }
            case GribCol.Step => row.setInt(c, current.stepHours)
            case GribCol.RefTime => row.setLong(c, current.refEpoch)
            case _ => ()
          }
          c += 1
        }
      }

      private def readBytes(at: Long, len: Long): Array[Byte] = {
        require(len >= 0 && len <= Int.MaxValue, // a corrupt header (negative
          // nPresent, or nPresent·nbits/8 wrapping) must fail naming the
          // file, not as an obscure NegativeArraySizeException
          s"${current.path}: payload read of $len bytes at offset $at out of range")
        val s = in(current.path)
        s.seek(at)
        val b = new Array[Byte](len.toInt)
        s.readFully(b)
        b
      }

      /** Simple packing: Y = (R + X·2^E) / 10^D; X is an MSB-first nbits
        * unsigned stream over the PRESENT cells only. */
      private def decode(packed: Array[Byte], m: GribMessage): Array[Double] = {
        val out = new Array[Double](m.nPresent)
        val r = m.refValue.toDouble
        val twoE = math.pow(2.0, m.binScale)
        val tenD = math.pow(10.0, m.decScale)
        var acc = 0L
        var accBits = 0
        var bytePos = 0
        var i = 0
        while (i < m.nPresent) {
          while (accBits < m.nbits) {
            acc = (acc << 8) | (packed(bytePos) & 0xFFL)
            accBits += 8
            bytePos += 1
          }
          val x = (acc >>> (accBits - m.nbits)) & ((1L << m.nbits) - 1)
          accBits -= m.nbits
          out(i) = (r + x * twoE) / tenD
          i += 1
        }
        out
      }

      /** PNG packing (DRS 5.41): section 7 is one complete PNG stream;
        * the defiltered raster bytes, scanlines concatenated, are the
        * MSB-first packed value stream `decode` already reads. Practical
        * encoders map the packed width to a whole-byte PNG sample
        * (8/16-bit grayscale, 24-bit RGB, 32-bit RGBA — one sample per
        * data point), and lay the points out as either a 1-row strip
        * (g2clib: width = nPresent) or the grid raster (ecCodes:
        * Ni × Nj); both satisfy the one-pixel-per-point contract checked
        * here. Inflate is the JDK zlib; filters are the five standard
        * reconstructions (shared spec with the media decoder at
        * Multimodal.decodePngPixels, but THIS path must reject corrupt
        * input loudly naming the file — the GRIB posture — where the
        * media path degrades to a stub). Interlace, palette, and
        * ancillary-chunk dependence are rejected: no GRIB PNG encoder
        * emits them. */
      private def decodePngRaster(body: Array[Byte], m: GribMessage): Array[Byte] = {
        val path = m.path
        def fail(why: String): Nothing =
          throw new IllegalArgumentException(s"$path: PNG-packed section 7 $why")
        if (body.length < 33 ||
            body(0) != 0x89.toByte || body(1) != 'P' || body(2) != 'N' ||
            body(3) != 'G' || body(4) != 0x0D || body(5) != 0x0A ||
            body(6) != 0x1A || body(7) != 0x0A) fail("lacks a PNG signature")
        def i32(o: Int): Int = java.nio.ByteBuffer.wrap(body, o, 4).getInt
        if (i32(8) != 13 || body(12) != 'I' || body(13) != 'H' ||
            body(14) != 'D' || body(15) != 'R') fail("does not start with IHDR")
        val w = i32(16)
        val h = i32(20)
        val bitDepth = body(24) & 0xFF
        val colorType = body(25) & 0xFF
        if ((body(26) & 0xFF) != 0 || (body(27) & 0xFF) != 0)
          fail("uses a non-zero compression/filter method")
        if ((body(28) & 0xFF) != 0) fail("is interlaced (unsupported)")
        val channels = colorType match {
          case 0 => 1
          case 2 => 3
          case 6 => 4
          case t => fail(s"has PNG color type $t (grayscale/RGB/RGBA only)")
        }
        if (bitDepth != 8 && bitDepth != 16)
          fail(s"has PNG bit depth $bitDepth (8 or 16 only)")
        if (channels * bitDepth != m.nbits)
          fail(s"carries ${channels * bitDepth}-bit samples but section 5 " +
            s"declares ${m.nbits} bits per value")
        if (w <= 0 || h <= 0 || w.toLong * h != m.nPresent)
          fail(s"raster is $w x $h pixels for ${m.nPresent} data points")
        val bytesPerPx = channels * (bitDepth / 8)
        val stride = w * bytesPerPx
        if (h.toLong * (1L + stride) > Int.MaxValue)
          fail(s"raster $w x $h overflows the decode buffer")
        // chunk walk: concatenate IDAT, stop at IEND
        val idat = new java.io.ByteArrayOutputStream()
        var off = 8
        var sawEnd = false
        while (!sawEnd) {
          if (off + 12 > body.length) fail("is truncated mid-chunk")
          val len = i32(off)
          if (len < 0 || len > body.length - off - 12)
            fail(s"chunk at offset $off overruns the section body")
          val tag = new String(body, off + 4, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          tag match {
            case "IDAT" => idat.write(body, off + 8, len)
            case "IEND" => sawEnd = true
            case "PLTE" => fail("is palette-indexed (unsupported)")
            case _ => () // ancillary chunks carry no raster bytes
          }
          off += 12 + len
        }
        val raw = new Array[Byte](h * (1 + stride))
        val inf = new java.util.zip.Inflater()
        try {
          inf.setInput(idat.toByteArray)
          var filled = 0
          while (filled < raw.length && !inf.finished()) {
            val n = inf.inflate(raw, filled, raw.length - filled)
            if (n == 0) fail("has a truncated or dictionary-demanding " +
              "zlib stream")
            filled += n
          }
          if (filled < raw.length)
            fail(s"inflates to $filled of ${raw.length} raster bytes")
          // drive the stream to its end: verifies the zlib adler32
          // trailer (a flipped byte in the compressed data must surface
          // as a loud DataFormatException here, not as wrong values) and
          // rejects streams longer than the declared raster
          if (!inf.finished()) {
            val scratch = new Array[Byte](1)
            val extra = inf.inflate(scratch, 0, 1)
            if (extra > 0 || !inf.finished())
              fail("does not terminate cleanly at the declared raster size")
          }
        } catch {
          case _: java.util.zip.DataFormatException =>
            fail("has a corrupt zlib stream")
        } finally inf.end()
        // reconstruct the five standard filters; emit scanlines packed
        val out = new Array[Byte](h * stride)
        var y = 0
        while (y < h) {
          val ft = raw(y * (1 + stride)) & 0xFF
          val ro = y * (1 + stride) + 1
          val oo = y * stride
          val po = oo - stride
          var i = 0
          while (i < stride) {
            val x = raw(ro + i) & 0xFF
            val a = if (i >= bytesPerPx) out(oo + i - bytesPerPx) & 0xFF else 0
            val up = if (y > 0) out(po + i) & 0xFF else 0
            val ul = if (y > 0 && i >= bytesPerPx) out(po + i - bytesPerPx) & 0xFF else 0
            val v = ft match {
              case 0 => x
              case 1 => x + a
              case 2 => x + up
              case 3 => x + ((a + up) >> 1)
              case 4 =>
                val p = a + up - ul
                val pa = math.abs(p - a)
                val pb = math.abs(p - up)
                val pc = math.abs(p - ul)
                x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else ul)
              case t => fail(s"row $y uses unknown PNG filter type $t")
            }
            out(oo + i) = (v & 0xFF).toByte
            i += 1
          }
          y += 1
        }
        out
      }

      /** Complex packing (DRS 5.2) and complex packing with spatial
        * differencing (5.3), WMO FM 92 §7.2/7.3 — the encoding
        * operational CDS/GloFAS GRIB2 commonly ships where the fixture
        * path uses simple packing. Layout of the section-7 body:
        * (5.3 only) sign-magnitude initial value(s) + overall minimum,
        * `extraOctets` bytes each; then NG group reference values
        * (`nbits` each), NG group widths (`groupWidthBits` each, offset
        * by `refGroupWidth`), NG scaled group lengths (`groupLenBits`
        * each, `refGroupLen + lenInc·x`, last group overridden by
        * `lastGroupLen`) — each sequence zero-padded to a byte
        * boundary — then each group's values at its own width, added to
        * its reference. 5.3 then reconstructs first/second-order
        * differences (the first `order` field values are the literal
        * initial values) before the shared Y=(R+X·2^E)/10^D scaling. */
      private def decodeComplex(
          packed: Array[Byte], m: GribMessage, cp: ComplexParams): Array[Double] = {
        val n = m.nPresent
        val out = new Array[Double](n)
        if (n == 0) return out
        val br = new GribBitReader(packed, m.path)
        var iv1, iv2, dmin = 0L
        if (cp.spatialOrder > 0) {
          iv1 = br.readSignMagnitude(cp.extraOctets)
          if (cp.spatialOrder == 2) iv2 = br.readSignMagnitude(cp.extraOctets)
          dmin = br.readSignMagnitude(cp.extraOctets)
          // descriptors are whole octets — already byte-aligned
        }
        val ng = cp.ng
        val refs = new Array[Long](ng)
        var g = 0
        while (g < ng) { refs(g) = br.read(m.nbits); g += 1 }
        br.align()
        val widths = new Array[Int](ng)
        g = 0
        while (g < ng) {
          widths(g) = cp.refGroupWidth + br.read(cp.groupWidthBits).toInt
          require(widths(g) <= 32,
            s"${m.path}: group $g width ${widths(g)} bits unsupported")
          g += 1
        }
        br.align()
        val lens = new Array[Long](ng)
        g = 0
        while (g < ng) {
          lens(g) = cp.refGroupLen + cp.lenInc.toLong * br.read(cp.groupLenBits)
          g += 1
        }
        br.align()
        if (ng > 0) lens(ng - 1) = cp.lastGroupLen.toLong
        var totalLen = 0L
        g = 0
        while (g < ng) { totalLen += lens(g); g += 1 }
        require(totalLen == n, // group lengths and section 5/bitmap must agree
          s"${m.path}: complex-packing group lengths sum $totalLen but " +
            s"$n data points are present")
        val fld = new Array[Long](n)
        var i = 0
        g = 0
        while (g < ng) {
          val w = widths(g)
          val ref = refs(g)
          var k = 0L
          while (k < lens(g)) { fld(i) = ref + br.read(w); i += 1; k += 1 }
          g += 1
        }
        if (cp.spatialOrder == 1) {
          fld(0) = iv1
          i = 1
          while (i < n) { fld(i) = fld(i) + dmin + fld(i - 1); i += 1 }
        } else if (cp.spatialOrder == 2) {
          fld(0) = iv1
          if (n > 1) fld(1) = iv2
          i = 2
          while (i < n) {
            fld(i) = fld(i) + dmin + 2 * fld(i - 1) - fld(i - 2)
            i += 1
          }
        }
        val r = m.refValue.toDouble
        val twoE = math.pow(2.0, m.binScale)
        val tenD = math.pow(10.0, m.decScale)
        i = 0
        while (i < n) { out(i) = (r + fld(i) * twoE) / tenD; i += 1 }
        out
      }

      private def present(c: Int): Boolean =
        bitmap == null || ((bitmap(c >> 3) >> (7 - (c & 7))) & 1) == 1

      override def next(): Boolean = {
        if (current != null && cell + 1 < current.points) {
          if (present(cell)) presentBefore += 1
          cell += 1
          true
        } else {
          msgIdx += 1
          if (msgIdx >= p.messages.length) false
          else { loadMessage(); current.points > 0 || next() }
        }
      }

      override def get(): InternalRow = {
        val m = current
        val j = cell / m.ni
        val i = cell % m.ni
        val latMicro =
          if (m.jAscending) m.latFirstMicro + j.toLong * m.djMicro
          else m.latFirstMicro - j.toLong * m.djMicro
        val lonMicro = m.lonFirstMicro + i.toLong * m.diMicro
        val isPresent = present(cell)
        var c = 0
        while (c < p.cols.length) {
          p.cols(c) match {
            case GribCol.Lat => row.setDouble(c, latMicro / 1e6)
            case GribCol.Lon => row.setDouble(c, lonMicro / 1e6)
            case GribCol.Value =>
              if (isPresent && values != null) row.setDouble(c, values(presentBefore))
              else row.setNullAt(c) // bitmap-missing, or value pruned
            case _ => () // number/step_hours/ref_time: set once per message
          }
          c += 1
        }
        row
      }

      override def close(): Unit = inOpt.foreach(_.close())
    }
  }
}
