package graft.sources

import java.io.DataInputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{And, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSourceV2: NetCDF classic (CDF-1 / CDF-2) rasters as a TABLE —
  * the S2 ingestion boundary the reference crosses in Python
  * (`flood/etl/utils.py:8-14` opens threshold/upstream rasters with the
  * netcdf4 engine; `databricks/threshold-data-conversion.py:58-65`
  * pre-converts them to parquet before Spark ever sees them). This source
  * removes that pre-conversion hop: Spark reads the raster directly, and
  * the S3 raster→table flattening (`flood/etl/raster_converter.py:55-85`,
  * `to_dataframe().reset_index()`) IS the scan — long-form rows over the
  * dimension cross product, one column per coordinate + one per data
  * variable, `_FillValue` cells surfaced as SQL NULLs (the reference's
  * post-flatten `dropna` becomes an ordinary pushable `IS NOT NULL`).
  *
  * Built from the public Unidata "NetCDF Classic Format Specification"
  * only — big-endian header (magic `CDF\x01|\x02`, dim/gatt/var lists,
  * padded names) and contiguous row-major fixed-variable data.
  *
  * Scale shape (the reason this is a DSv2 source and not a driver loop):
  *  - the HEADER (KBs) is parsed once on the driver; bulk data is never
  *    driver-materialized;
  *  - partitions slice the OUTERMOST dimension; each executor seeks
  *    directly to `begin + outerIdx·stride` and reads only its byte
  *    range of each variable — a 3600×7200 float raster splits into 32
  *    independent ~3 MB ranged reads per variable, the same access
  *    pattern a parquet row-group scan does;
  *  - column pruning reaches the I/O layer: an unprojected variable's
  *    bytes are never read (`SupportsPushDownRequiredColumns`);
  *  - coordinate range predicates on the outer dimension become index
  *    bounds BEFORE any row exists (`SupportsPushDownFilters`, asc or
  *    desc coordinates — GloFAS latitude is descending), so an ROI slice
  *    (P10) reads only the matching stripe of the file.
  *
  * Record (unlimited-dimension) variables — the most common real-world
  * NetCDF shape (time-series rasters) — are supported as of round 11: the
  * record dimension is always outermost (spec rule), so it doubles as the
  * partitioning dimension; record slabs interleave on disk (record r of
  * variable v at `begin_v + r·recsize`), so an executor's ranged read
  * becomes one strided read PER RECORD of exactly its variable's slab —
  * column pruning still never touches an unprojected variable's bytes.
  * For raster-shaped records (MB slabs) that is the same access pattern
  * as the fixed layout; a file of scalar record vars (tiny slabs) reads
  * correctly but seek-bound, which is the format's own trade-off.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.NetcdfSource")
  *   .option("path", "/data/thresholds.nc")
  *   .option("variables", "threshold_2y,upstream_area")  // optional
  *   .option("numPartitions", "32")
  *   .load()   // → (lat, lon, threshold_2y, upstream_area)
  * }}}
  */
class NetcdfSource extends TableProvider {
  // inferSchema needs only the header (one small read); the coordinate
  // arrays are read once, in getTable, where pushdown needs them.
  // The container is detected from the file's magic: classic CDF-1/CDF-2
  // parses here, HDF5-backed NetCDF-4 (the reference's engine="netcdf4"
  // aux rasters) dispatches to the from-spec HDF5 path in
  // [[Netcdf4Source.scala]] — one format string, both containers.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (Netcdf4TableModel.isHdf5(options)) Netcdf4TableModel.resolve(options).schema
    else NetcdfTableModel.resolve(options).schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val o = new CaseInsensitiveStringMap(properties)
    if (Netcdf4TableModel.isHdf5(o)) new Netcdf4Table(Netcdf4TableModel.fromOptions(o))
    else new NetcdfTable(NetcdfTableModel.fromOptions(o))
  }
}

// ---------------------------------------------------------------- header model

private[sources] final case class NcDim(name: String, length: Int) // 0 = record dim
private[sources] final case class NcAtt(name: String, ncType: Int, nums: Seq[Double], text: String)
private[sources] final case class NcVar(
    name: String, dimIds: Seq[Int], atts: Seq[NcAtt], ncType: Int, begin: Long) {
  def fillValue: Option[Double] = atts.find(_.name == "_FillValue").flatMap(_.nums.headOption)
}
private[sources] final case class NcHeader(
    version: Int, numRecs: Int, dims: Seq[NcDim], gatts: Seq[NcAtt], vars: Seq[NcVar])

/** Big-endian CDF-1/CDF-2 header parser (public spec layout). */
private[sources] object NcHeaderParser {
  val NcDimension = 10
  val NcVariable = 11
  val NcAttribute = 12

  def typeSize(ncType: Int): Int = ncType match {
    case 1 | 2 => 1 // byte, char
    case 3 => 2 // short
    case 4 | 5 => 4 // int, float
    case 6 => 8 // double
    case t => throw new IllegalArgumentException(s"unknown nc_type $t")
  }

  /** `fileLen` bounds every length/count field read from the file: header
    * integers are UNTRUSTED, and a corrupt negative or multi-GB name
    * length must fail as a named malformed-header error, not as a
    * NegativeArraySizeException / driver OOM mid-allocation. */
  def parse(in: DataInputStream, fileLen: Long): NcHeader = {
    // every checked entity occupies at least one byte of file, so any
    // legitimate length or element count is < fileLen
    def checked(n: Int, what: String): Int = {
      require(n >= 0 && n < fileLen,
        s"malformed header: $what $n out of bounds for a $fileLen-byte file")
      n
    }
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(magic(0) == 'C' && magic(1) == 'D' && magic(2) == 'F',
      "not a NetCDF classic file (bad magic)")
    val version = magic(3).toInt
    require(version == 1 || version == 2,
      s"unsupported NetCDF version byte $version (classic CDF-1/CDF-2 only; " +
        "CDF-5 and HDF5-based NetCDF-4 are out of scope)")
    val numRecs = in.readInt()

    def readName(): String = {
      val n = checked(in.readInt(), "name length")
      val b = new Array[Byte](n)
      in.readFully(b)
      in.skipBytes((4 - n % 4) % 4)
      new String(b, StandardCharsets.UTF_8)
    }

    def readTagged(expected: Int): Int = {
      val tag = in.readInt()
      val n = in.readInt()
      require(tag == expected || (tag == 0 && n == 0),
        s"malformed header: tag $tag (expected $expected or ABSENT)")
      checked(n, s"tag-$expected element count")
    }

    def readAtts(): Seq[NcAtt] = (0 until readTagged(NcAttribute)).map { _ =>
      val nm = readName()
      val t = in.readInt()
      val n = checked(in.readInt(), s"attribute '$nm' value count")
      if (t == 2) { // char → one string
        val b = new Array[Byte](n)
        in.readFully(b)
        in.skipBytes((4 - n % 4) % 4)
        NcAtt(nm, t, Nil, new String(b, StandardCharsets.UTF_8))
      } else {
        val nums = (0 until n).map { _ =>
          t match {
            case 1 => in.readByte().toDouble
            case 3 => in.readShort().toDouble
            case 4 => in.readInt().toDouble
            case 5 => in.readFloat().toDouble
            case 6 => in.readDouble()
            case other => throw new IllegalArgumentException(s"unknown attr nc_type $other")
          }
        }
        in.skipBytes((4 - (n * typeSize(t)) % 4) % 4)
        NcAtt(nm, t, nums, "")
      }
    }

    val dims = (0 until readTagged(NcDimension)).map(_ => NcDim(readName(), in.readInt()))
    val gatts = readAtts()
    val vars = (0 until readTagged(NcVariable)).map { _ =>
      val nm = readName()
      val dimIds = (0 until checked(in.readInt(), s"variable '$nm' rank")).map(_ => in.readInt())
      val atts = readAtts()
      val t = in.readInt()
      in.readInt() // vsize — recomputed from dims, per spec it may also be a rounded value
      val begin = if (version == 1) in.readInt().toLong else in.readLong()
      NcVar(nm, dimIds, atts, t, begin)
    }
    NcHeader(version, numRecs, dims, gatts, vars)
  }
}

// ---------------------------------------------------------------- table model

/** Driver-side resolution: which vars are data columns, which dims span the
  * grid, the coordinate arrays (read eagerly — 1-D, KBs), the output schema. */
private[sources] final case class NetcdfTableModel(
    path: String,
    numPartitions: Int,
    maxBytesPerPartition: Long,
    header: NcHeader,
    dataVars: Seq[NcVar],
    gridDimIds: Seq[Int],
    recSize: Long, // byte stride between records (0 = fixed-layout scan)
    coords: Map[Int, Array[Double]], // dimId → coordinate values (or indices)
    conf: SerializableHadoopConf) {

  /** Dimension length with the record dimension resolved to the record
    * count — every shape/cardinality computation uses this, never the raw
    * header length (0 for the record dim). */
  def dimLength(id: Int): Int =
    if (header.dims(id).length == 0) header.numRecs else header.dims(id).length

  def gridDims: Seq[NcDim] =
    gridDimIds.map(id => header.dims(id).copy(length = dimLength(id)))

  def sparkType(ncType: Int): DataType = ncType match {
    case 1 => ByteType
    case 3 => ShortType
    case 4 => IntegerType
    case 5 => FloatType
    case 6 => DoubleType
    case t => throw new IllegalArgumentException(
      s"nc_type $t has no tabular mapping (char variables are not data columns)")
  }

  def schema: StructType = StructType(
    gridDims.map(d => StructField(d.name, DoubleType, nullable = false)) ++
      dataVars.map(v => StructField(v.name, sparkType(v.ncType), nullable = v.fillValue.isDefined)))
}

private[sources] object NetcdfTableModel {

  /** Header parse + variable/dimension resolution — everything the SCHEMA
    * needs, one small read, no coordinate I/O. */
  def resolve(o: CaseInsensitiveStringMap): NetcdfTableModel = {
    val path = Option(o.get("path")).getOrElse(
      throw new IllegalArgumentException("NetcdfSource requires option 'path'"))
    val numPartitions = Option(o.get("numpartitions")).map(_.toInt).getOrElse(8)
    // per-partition byte ceiling on the LARGEST projected variable's slice
    // (default 1 GiB): partition count is count-based up to this bound,
    // then grows so a huge raster never hits the 2 GiB ranged-read limit
    // (and executor slices stay memory-sized) regardless of numPartitions
    val maxBytes = Option(o.get("maxbytesperpartition")).map(_.toLong)
      .getOrElse(1L << 30)
    require(maxBytes > 0, s"maxBytesPerPartition must be > 0, got $maxBytes")
    val wanted = Option(o.get("variables")).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

    val conf = HadoopConf.session()
    val fs = FileSystem.get(new Path(path).toUri, conf)
    val fileLen = fs.getFileStatus(new Path(path)).getLen
    val in = new DataInputStream(fs.open(new Path(path)))
    val header = try NcHeaderParser.parse(in, fileLen) finally in.close()

    val coordVars: Map[String, NcVar] = header.vars
      .filter(v => v.dimIds.size == 1 && header.dims(v.dimIds.head).name == v.name)
      .map(v => v.name -> v).toMap

    val candidates = header.vars.filterNot(v => coordVars.contains(v.name))
      .filter(v => v.dimIds.nonEmpty && v.ncType != 2)
    val selected = wanted match {
      case Some(names) =>
        val byName = candidates.map(v => v.name -> v).toMap
        names.map(n => byName.getOrElse(n, throw new IllegalArgumentException(
          s"variable '$n' not found (have: ${candidates.map(_.name).mkString(", ")})")))
      case None => candidates
    }
    require(selected.nonEmpty, s"no data variables in $path")
    val gridDimIds = selected.head.dimIds
    selected.foreach { v =>
      require(v.dimIds == gridDimIds,
        s"variable '${v.name}' spans dims ${v.dimIds.map(header.dims(_).name)} but " +
          s"'${selected.head.name}' spans ${gridDimIds.map(header.dims(_).name)}; " +
          "select one dimension tuple per scan via option 'variables'")
    }
    // record (unlimited) dimension: header length 0; per spec it may only
    // be a variable's FIRST dimension
    gridDimIds.tail.foreach { id =>
      require(header.dims(id).length > 0,
        s"$path: dimension '${header.dims(id).name}' is the record dimension " +
          "but not outermost — malformed classic file")
    }

    // Record stride: one record's interleaved slabs across ALL record
    // variables in the file (not just the selected ones — unselected vars
    // still occupy their bytes), each padded to 4; the spec's special case
    // (exactly one record variable) drops the padding.
    val recordVars = header.vars
      .filter(v => v.dimIds.headOption.exists(header.dims(_).length == 0))
    def slab(v: NcVar): Long =
      v.dimIds.tail.map(header.dims(_).length.toLong).product *
        NcHeaderParser.typeSize(v.ncType)
    val recSize =
      if (recordVars.isEmpty) 0L
      else if (recordVars.size == 1) slab(recordVars.head)
      else recordVars.map { v => val s = slab(v); s + ((4 - s % 4) % 4) }.sum

    // numrecs = 0xFFFFFFFF (STREAMING: the writer was still appending) —
    // derive the actual count from the file length, like the C library
    val fixedHeader =
      if (header.numRecs >= 0) header
      else {
        require(recordVars.nonEmpty && recSize > 0,
          s"$path: STREAMING record count but no record variables")
        val recStart = recordVars.map(_.begin).min
        val derived = (fileLen - recStart) / recSize
        require(derived >= 0 && derived <= Int.MaxValue,
          s"$path: STREAMING record count derives to $derived (file length " +
            s"$fileLen, record section at $recStart, record size $recSize) " +
            "— file truncated or corrupt")
        header.copy(numRecs = derived.toInt)
      }

    val scanIsRecord = fixedHeader.dims(gridDimIds.head).length == 0
    NetcdfTableModel(path, numPartitions, maxBytes, fixedHeader, selected,
      gridDimIds, if (scanIsRecord) recSize else 0L,
      Map.empty, new SerializableHadoopConf(conf))
  }

  /** [[resolve]] plus the coordinate arrays (read once, for pushdown). */
  def fromOptions(o: CaseInsensitiveStringMap): NetcdfTableModel = {
    val model = resolve(o)
    val header = model.header
    val fs = FileSystem.get(new Path(model.path).toUri, model.conf.value)
    val coordVars: Map[String, NcVar] = header.vars
      .filter(v => v.dimIds.size == 1 && header.dims(v.dimIds.head).name == v.name)
      .map(v => v.name -> v).toMap
    // Coordinate values per grid dim: the 1-D coordinate variable if one
    // exists, else the plain index. 1-D → small → read on the driver. A
    // RECORD coordinate var (time(time)) is interleaved with the other
    // record slabs, so its values come from one strided pass.
    val coords = model.gridDimIds.map { id =>
      val dim = header.dims(id)
      val len = model.dimLength(id)
      val arr = coordVars.get(dim.name) match {
        case Some(cv) if dim.length == 0 =>
          val size = NcHeaderParser.typeSize(cv.ncType)
          val in = fs.open(new Path(model.path))
          try Array.tabulate(len) { r =>
            in.seek(cv.begin + r * model.recSize)
            val b = new Array[Byte](size)
            in.readFully(b)
            readAs(ByteBuffer.wrap(b), 0, cv.ncType)
          } finally in.close()
        case Some(cv) =>
          val size = NcHeaderParser.typeSize(cv.ncType)
          val buf = readRange(fs, model.path, cv.begin, len.toLong * size)
          Array.tabulate(len)(i => readAs(buf, i * size, cv.ncType))
        case None => Array.tabulate(len)(_.toDouble)
      }
      id -> arr
    }.toMap
    model.copy(coords = coords)
  }

  def readRange(fs: FileSystem, path: String, at: Long, len: Long): ByteBuffer = {
    require(len <= Int.MaxValue, s"range read of $len bytes exceeds buffer limit")
    val in = fs.open(new Path(path))
    try {
      in.seek(at)
      val b = new Array[Byte](len.toInt)
      in.readFully(b)
      ByteBuffer.wrap(b) // big-endian by default, matching the format
    } finally in.close()
  }

  /** Gather read: one `slabSize`-byte slab every `stride` bytes, for outer
    * indices [from, to) — the record-variable access pattern — returned as
    * one contiguous buffer the reader indexes exactly like a fixed range. */
  def readStrided(fs: FileSystem, path: String, begin: Long, stride: Long,
      slabSize: Long, from: Int, to: Int): ByteBuffer = {
    val total = (to - from).toLong * slabSize
    require(total >= 0 && total <= Int.MaxValue,
      s"strided read of $total bytes exceeds buffer limit")
    val out = new Array[Byte](total.toInt)
    val in = fs.open(new Path(path))
    try {
      var r = from
      var off = 0
      while (r < to) {
        in.seek(begin + r * stride)
        in.readFully(out, off, slabSize.toInt)
        r += 1
        off += slabSize.toInt
      }
    } finally in.close()
    ByteBuffer.wrap(out)
  }

  def readAs(buf: ByteBuffer, off: Int, ncType: Int): Double = ncType match {
    case 1 => buf.get(off).toDouble
    case 3 => buf.getShort(off).toDouble
    case 4 => buf.getInt(off).toDouble
    case 5 => buf.getFloat(off).toDouble
    case 6 => buf.getDouble(off)
    case t => throw new IllegalArgumentException(s"unreadable nc_type $t")
  }
}

// ---------------------------------------------------------------- DSv2 plumbing

private class NetcdfTable(model: NetcdfTableModel) extends Table with SupportsRead {
  override def name(): String =
    s"netcdf(${model.path}: ${model.gridDims.map(d => s"${d.name}=${d.length}").mkString("x")})"
  override def schema(): StructType = model.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NetcdfScanBuilder(model)
}

/** Prunes variables (I/O-level column pruning) and turns range predicates on
  * the OUTER coordinate into outer-index bounds. Coordinates need not be
  * sorted ascending: each pushed predicate is evaluated against the
  * driver-held coordinate array and the surviving contiguous index range is
  * what executors read (monotonic asc/desc both yield contiguous ranges;
  * a non-monotonic coordinate just keeps the full range plus Spark's
  * post-filter, because non-accepted filters are returned unpushed). */
private class NetcdfScanBuilder(model: NetcdfTableModel)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val outerDimId = model.gridDimIds.head
  private val outerName = model.header.dims(outerDimId).name
  private val outerCoords = model.coords(outerDimId)
  private var keep: Array[Boolean] = Array.fill(outerCoords.length)(true)
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = model.schema

  private val monotonic: Boolean = {
    val n = outerCoords.length
    n < 2 || (1 until n).forall(i => outerCoords(i) > outerCoords(i - 1)) ||
      (1 until n).forall(i => outerCoords(i) < outerCoords(i - 1))
  }

  private def applyOne(f: Filter): Boolean = f match {
    case GreaterThanOrEqual(`outerName`, v: Number) =>
      mask(_ >= v.doubleValue()); true
    case GreaterThan(`outerName`, v: Number) =>
      mask(_ > v.doubleValue()); true
    case LessThanOrEqual(`outerName`, v: Number) =>
      mask(_ <= v.doubleValue()); true
    case LessThan(`outerName`, v: Number) =>
      mask(_ < v.doubleValue()); true
    case And(l, r) => applyOne(l) && applyOne(r)
    case _ => false
  }
  private def mask(p: Double => Boolean): Unit =
    keep = keep.zip(outerCoords).map { case (k, c) => k && p(c) }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    if (!monotonic) return filters // ranges would not be contiguous; push nothing
    val (accepted, rejected) = filters.partition(applyOne)
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = {
    val lo = keep.indexOf(true) match { case -1 => 0 case i => i }
    val hi = keep.lastIndexOf(true) + 1 // -1+1 = 0 → empty scan
    new NetcdfScan(model, required, math.min(lo, hi), hi)
  }
}

private class NetcdfScan(
    model: NetcdfTableModel, required: StructType, outerLo: Int, outerHi: Int)
  extends Scan with Batch with SupportsReportStatistics {

  private val readVars = model.dataVars.filter(v => required.fieldNames.contains(v.name))

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"NetcdfScan(${model.path}, ${model.gridDims.head.name}Idx=[$outerLo,$outerHi), " +
      s"vars=[${readVars.map(_.name).mkString(",")}])"

  /** Exact post-pruning cardinality (a raster's size is fully determined by
    * its header + the pushed slice) — lets Catalyst/AQE broadcast a small
    * threshold raster against a big fact scan instead of shuffling both. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = (outerHi - outerLo).toLong *
      model.gridDimIds.tail.map(model.dimLength(_).toLong).product
    private val rowBytes = required.fields.map(_.dataType.defaultSize.toLong).sum
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(rows * rowBytes)
    override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(0, outerHi - outerLo)
    // Byte-bounded partitioning: count-based up to the configured ceiling,
    // then split finer so the WIDEST projected variable's slice stays
    // under maxBytesPerPartition — a 460×1400 threshold raster reads as 8
    // ranged slices, a 100 GB raster as however many ~1 GiB slices it
    // takes, never tripping the Int.MaxValue buffer limit. A single outer
    // row wider than the ceiling is the floor (inner dims are contiguous
    // on disk and not splittable without a different layout).
    val innerCount = model.gridDimIds.tail.map(model.dimLength(_).toLong).product
    val widestVar = readVars.map(v => innerCount * NcHeaderParser.typeSize(v.ncType))
      .foldLeft(0L)(math.max)
    // bound the MAXIMUM partition, not the average: contiguous splitting
    // hands some partitions ceil(span/n) rows, so derive n from the row
    // budget per partition (floor) — every partition then reads at most
    // rowsPerPart·widestVar ≤ maxBytes, not just the mean
    val minParts =
      if (widestVar <= 0 || span <= 0) 1
      else {
        val rowsPerPart = math.max(1L, model.maxBytesPerPartition / widestVar)
        ((span + rowsPerPart - 1) / rowsPerPart).toInt
      }
    val n = math.max(1, math.min(math.max(model.numPartitions, minParts), math.max(1, span)))
    val cols: Array[NcColumnSpec] = required.fields.map { f =>
      val dimPos = model.gridDims.indexWhere(_.name == f.name)
      if (dimPos >= 0) {
        val id = model.gridDimIds(dimPos)
        NcColumnSpec(f.name, isDim = true, dimPos = dimPos, ncType = 0, begin = 0,
          fillBits = None, coords = model.coords(id))
      } else {
        val v = readVars.find(_.name == f.name).get
        // outer-step byte stride: the variable's own slab for the fixed
        // layout, the whole interleaved record for a record scan
        val slabSize = innerCount * NcHeaderParser.typeSize(v.ncType)
        NcColumnSpec(f.name, isDim = false, dimPos = -1, ncType = v.ncType, begin = v.begin,
          stride = if (model.recSize > 0) model.recSize else slabSize,
          fillBits = v.fillValue, coords = Array.empty)
      }
    }
    val dimLengths = model.gridDimIds.map(model.dimLength).toArray
    (0 until n).map { p =>
      val from = outerLo + (span * p) / n
      val to = outerLo + (span * (p + 1)) / n
      NetcdfPartition(model.path, from, to, innerCount, dimLengths, cols,
        model.conf): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new NetcdfReaderFactory
}

/** One output column: a grid-dimension coordinate (dimPos ≥ 0, values in
  * `coords` — outer dim included in full, the reader offsets by outer index)
  * or a data variable (file begin offset + fill value for NULL mapping). */
private final case class NcColumnSpec(
    name: String, isDim: Boolean, dimPos: Int, ncType: Int, begin: Long,
    stride: Long = 0L, fillBits: Option[Double] = None,
    coords: Array[Double] = Array.empty)

private final case class NetcdfPartition(
    path: String, outerFrom: Int, outerTo: Int, innerCount: Long,
    dimLengths: Array[Int], cols: Array[NcColumnSpec],
    conf: SerializableHadoopConf) extends InputPartition

private class NetcdfReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[NetcdfPartition]
    new PartitionReader[InternalRow] {
      private val rows: Long = (p.outerTo - p.outerFrom).toLong * p.innerCount
      private var cell: Long = -1
      // Ranged read per projected variable: [begin + outerFrom·stride,
      // begin + outerTo·stride) — executors touch only their slice's
      // bytes. A record variable (stride > its own slab: other variables'
      // records interleave) gathers one slab per record instead; either
      // way the buffer holds ONLY this variable's cells, contiguous.
      private lazy val buffers: Array[ByteBuffer] = {
        val fs = FileSystem.get(new Path(p.path).toUri, p.conf.value)
        p.cols.map { c =>
          if (c.isDim) null
          else {
            val slabSize = p.innerCount * NcHeaderParser.typeSize(c.ncType)
            if (c.stride == slabSize)
              NetcdfTableModel.readRange(fs, p.path, c.begin + p.outerFrom * c.stride,
                (p.outerTo - p.outerFrom) * slabSize)
            else
              NetcdfTableModel.readStrided(fs, p.path, c.begin, c.stride, slabSize,
                p.outerFrom, p.outerTo)
          }
        }
      }

      override def next(): Boolean = { cell += 1; cell < rows }

      // Per-column loop constants, resolved ONCE per partition so the
      // per-cell emit does no per-column stride recomputation:
      //  - dim columns: row-major stride (product of lengths after dimPos,
      //    dim 0's length = the partition's outer slice), modulus, and the
      //    coordinate base offset (outer dim starts at outerFrom);
      //  - data columns: element byte size and the fill-value bit patterns.
      private val dimStride: Array[Long] = p.cols.map { c =>
        if (!c.isDim) 0L
        else {
          var s = 1L
          var d = p.dimLengths.length - 1
          while (d > c.dimPos) { s *= p.dimLengths(d).toLong; d -= 1 }
          s
        }
      }
      private val dimLen: Array[Long] = p.cols.map { c =>
        if (!c.isDim) 0L
        else if (c.dimPos == 0) (p.outerTo - p.outerFrom).toLong
        else p.dimLengths(c.dimPos).toLong
      }
      private val coordBase: Array[Int] = p.cols.map(c =>
        if (c.isDim && c.dimPos == 0) p.outerFrom else 0)
      private val elemSize: Array[Int] = p.cols.map(c =>
        if (c.isDim) 0 else NcHeaderParser.typeSize(c.ncType))
      private val fillLong: Array[Long] = p.cols.map(c => // int types + raw double bits
        if (c.isDim) 0L
        else c.ncType match {
          case 6 => c.fillBits.map(java.lang.Double.doubleToRawLongBits).getOrElse(0L)
          case _ => c.fillBits.map(_.toLong).getOrElse(0L)
        })
      private val fillFloat: Array[Int] = p.cols.map(c =>
        if (!c.isDim && c.ncType == 5)
          c.fillBits.map(f => java.lang.Float.floatToRawIntBits(f.toFloat)).getOrElse(0)
        else 0)
      private val hasFill: Array[Boolean] = p.cols.map(c => !c.isDim && c.fillBits.isDefined)

      // ONE mutable row reused across every get() call — the raster flatten
      // is the scan's hot loop (a 3600×7200 grid is 26 M cells per
      // variable) and a fresh boxed Array[Any] + GenericInternalRow per
      // cell would make allocation its dominant cost. Reuse is the
      // InternalRow contract; all columns are primitive, so
      // SpecificInternalRow holds them unboxed.
      private val row = new org.apache.spark.sql.catalyst.expressions.SpecificInternalRow(
        p.cols.toIndexedSeq.map { c =>
          if (c.isDim) DoubleType: DataType
          else c.ncType match {
            case 1 => ByteType
            case 3 => ShortType
            case 4 => IntegerType
            case 5 => FloatType
            case 6 => DoubleType
          }
        })

      override def get(): InternalRow = {
        var i = 0
        while (i < p.cols.length) {
          val c = p.cols(i)
          if (c.isDim) {
            // Row-major decomposition: idx_d = (cell / stride_d) % len_d
            val idx = ((cell / dimStride(i)) % dimLen(i)).toInt
            row.setDouble(i, c.coords(coordBase(i) + idx))
          } else {
            val off = (cell * elemSize(i)).toInt
            val buf = buffers(i)
            c.ncType match {
              case 1 =>
                val v = buf.get(off)
                if (hasFill(i) && v.toLong == fillLong(i)) row.setNullAt(i)
                else row.setByte(i, v)
              case 3 =>
                val v = buf.getShort(off)
                if (hasFill(i) && v.toLong == fillLong(i)) row.setNullAt(i)
                else row.setShort(i, v)
              case 4 =>
                val v = buf.getInt(off)
                if (hasFill(i) && v.toLong == fillLong(i)) row.setNullAt(i)
                else row.setInt(i, v)
              case 5 =>
                val v = buf.getFloat(off)
                if (hasFill(i) && java.lang.Float.floatToRawIntBits(v) == fillFloat(i))
                  row.setNullAt(i)
                else row.setFloat(i, v)
              case 6 =>
                val v = buf.getDouble(off)
                if (hasFill(i) && java.lang.Double.doubleToRawLongBits(v) == fillLong(i))
                  row.setNullAt(i)
                else row.setDouble(i, v)
            }
          }
          i += 1
        }
        row
      }

      override def close(): Unit = ()
    }
  }
}
