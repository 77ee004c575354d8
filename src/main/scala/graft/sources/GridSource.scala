package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSourceV2: the regular lat/lon cell grid as a TABLE.
  *
  * The reference materializes its 0.05° grids driver-side with NumPy
  * (test/data/data_generation.py:16-29; ROI config
  * databricks/config.json:24-26); at 100 TB scale a cell universe must be
  * GENERATED on executors, not broadcast from the driver. This source
  * plans the latitude index range into `numPartitions` slices, each
  * partition generating its rows locally — zero input I/O, zero driver
  * materialization — and pushes lat/lon range predicates into the
  * generator, so `grid.filter(lat between ...)` prunes index ranges
  * before a single row exists.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.GridSource")
  *   .option("latMin", "-6").option("latMax", "17")
  *   .option("lonMin", "-18").option("lonMax", "52")
  *   .option("resolution", "0.05").option("numPartitions", "32")
  *   .load()                       // → (latitude, longitude), cell centers
  * }}}
  */
class GridSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GridSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    // properties arrive with the caller's original key case; normalize
    new GridTable(GridSpec.fromOptions(new CaseInsensitiveStringMap(properties)))
}

object GridSource {
  val Schema: StructType = StructType(Seq(
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false)))
}

/** Grid geometry: cell centers at `min + (i + 0.5) * resolution`, rounded
  * to 3 decimals (the engine's canonical cell key precision). */
final case class GridSpec(
    latMin: Double, latMax: Double,
    lonMin: Double, lonMax: Double,
    resolution: Double,
    numPartitions: Int) {
  def nLat: Int = math.max(0, math.round((latMax - latMin) / resolution).toInt)
  def nLon: Int = math.max(0, math.round((lonMax - lonMin) / resolution).toInt)
  def latAt(i: Int): Double = round3(latMin + (i + 0.5) * resolution)
  def lonAt(j: Int): Double = round3(lonMin + (j + 0.5) * resolution)
  private def round3(x: Double): Double = math.rint(x * 1000) / 1000
}

object GridSpec {
  def fromOptions(o: util.Map[String, String]): GridSpec = {
    def d(k: String, default: Double) = Option(o.get(k)).map(_.toDouble).getOrElse(default)
    GridSpec(
      latMin = d("latmin", -6.0), latMax = d("latmax", 17.0),
      lonMin = d("lonmin", -18.0), lonMax = d("lonmax", 52.0),
      resolution = d("resolution", 0.05),
      numPartitions = Option(o.get("numpartitions")).map(_.toInt).getOrElse(8))
  }
}

private class GridTable(spec: GridSpec) extends Table with SupportsRead {
  override def name(): String = s"grid(${spec.nLat}x${spec.nLon})"
  override def schema(): StructType = GridSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(spec)
}

/** Pushes lat/lon range predicates into the generator's index bounds.
  * Anything else stays a post-scan filter (we return it as unpushed). */
private class GridScanBuilder(spec: GridSpec) extends ScanBuilder with SupportsPushDownFilters {
  private var latLo = 0
  private var latHi = spec.nLat // exclusive
  private var lonLo = 0
  private var lonHi = spec.nLon
  private var pushed: Array[Filter] = Array.empty

  // smallest i with center(i) >= v  /  smallest i with center(i) > v
  private def lower(v: Double, min: Double, strict: Boolean): Int = {
    val raw = (v - min) / spec.resolution - 0.5
    val i = math.ceil(raw).toInt
    if (strict && math.abs(min + (i + 0.5) * spec.resolution - v) < 1e-9) i + 1 else i
  }
  // one past the largest i with center(i) <= v (strict: < v)
  private def upper(v: Double, min: Double, strict: Boolean): Int = {
    val raw = (v - min) / spec.resolution - 0.5
    val i = math.floor(raw).toInt
    val exactHit = math.abs(min + (i + 0.5) * spec.resolution - v) < 1e-9
    if (strict && exactHit) i else i + 1
  }

  private def applyOne(f: Filter): Boolean = f match {
    case GreaterThanOrEqual("latitude", v: Number) =>
      latLo = math.max(latLo, lower(v.doubleValue(), spec.latMin, strict = false)); true
    case GreaterThan("latitude", v: Number) =>
      latLo = math.max(latLo, lower(v.doubleValue(), spec.latMin, strict = true)); true
    case LessThanOrEqual("latitude", v: Number) =>
      latHi = math.min(latHi, upper(v.doubleValue(), spec.latMin, strict = false)); true
    case LessThan("latitude", v: Number) =>
      latHi = math.min(latHi, upper(v.doubleValue(), spec.latMin, strict = true)); true
    case GreaterThanOrEqual("longitude", v: Number) =>
      lonLo = math.max(lonLo, lower(v.doubleValue(), spec.lonMin, strict = false)); true
    case GreaterThan("longitude", v: Number) =>
      lonLo = math.max(lonLo, lower(v.doubleValue(), spec.lonMin, strict = true)); true
    case LessThanOrEqual("longitude", v: Number) =>
      lonHi = math.min(lonHi, upper(v.doubleValue(), spec.lonMin, strict = false)); true
    case LessThan("longitude", v: Number) =>
      lonHi = math.min(lonHi, upper(v.doubleValue(), spec.lonMin, strict = true)); true
    case And(l, r) => applyOne(l) && applyOne(r)
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition(applyOne)
    pushed = accepted
    rejected // Spark re-applies these after the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new GridScan(spec, latLo, math.max(latLo, latHi), lonLo, math.max(lonLo, lonHi))
}

private class GridScan(spec: GridSpec, latLo: Int, latHi: Int, lonLo: Int, lonHi: Int)
  extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = GridSource.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GridScan(latIdx=[$latLo,$latHi), lonIdx=[$lonLo,$lonHi))"

  /** Exact generated cardinality (post-pruning) so Catalyst can broadcast a
    * small ROI grid instead of shuffling it. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = (latHi - latLo).toLong * (lonHi - lonLo).toLong
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(rows * 16L)
    override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, math.min(spec.numPartitions, math.max(1, latHi - latLo)))
    val span = latHi - latLo
    (0 until n).map { p =>
      val from = latLo + (span * p) / n
      val to = latLo + (span * (p + 1)) / n
      GridPartition(from, to, lonLo, lonHi): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GridReaderFactory(spec)
}

private final case class GridPartition(latFrom: Int, latTo: Int, lonLo: Int, lonHi: Int)
  extends InputPartition

private class GridReaderFactory(spec: GridSpec) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GridPartition]
    new PartitionReader[InternalRow] {
      private var i = p.latFrom
      private var j = p.lonLo - 1
      override def next(): Boolean = {
        j += 1
        if (j >= p.lonHi) { j = p.lonLo; i += 1 }
        i < p.latTo && j < p.lonHi && p.lonLo < p.lonHi
      }
      override def get(): InternalRow = InternalRow(spec.latAt(i), spec.lonAt(j))
      override def close(): Unit = ()
    }
  }
}
