package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** NetCDF classic source: checked against the COMMITTED python-generated
  * fixture (`tools/make_netcdf_fixture.py` writes the bytes from the public
  * spec with struct.pack — an implementation independent of the Scala
  * parser, so a shared misreading of the spec can't self-certify), plus
  * Scala-written CDF-2 / typed / degenerate files for the edge cases. */
class NetcdfSourceSpec extends SparkSpec {

  private val fixture = new File("data/netcdf/thresholds.nc").getAbsolutePath
  private val expected = new File("data/netcdf/thresholds_expected.parquet").getAbsolutePath

  private def nc(path: String = fixture, parts: Int = 3) = spark.read
    .format(classOf[NetcdfSource].getName)
    .option("path", path)
    .option("numPartitions", parts.toString)
    .load()

  test("reads the python-written fixture to the reference's flattened long form") {
    val df = nc()
    assert(df.schema == StructType(Seq(
      StructField("lat", DoubleType, nullable = false),
      StructField("lon", DoubleType, nullable = false),
      StructField("threshold_2y", FloatType, nullable = true),
      StructField("threshold_5y", DoubleType, nullable = false),
      StructField("threshold_20y", DoubleType, nullable = false),
      StructField("upstream_area", IntegerType, nullable = false))))
    val got = df.collect().map(r => (r.getDouble(0), r.getDouble(1),
      Option(r.get(2)), r.getDouble(3), r.getDouble(4), r.getInt(5))).toSet
    val want = spark.read.parquet(expected).collect().map(r => (r.getDouble(0), r.getDouble(1),
      Option(r.get(2)), r.getDouble(3), r.getDouble(4), r.getInt(5))).toSet
    assert(got == want)
    assert(df.count() == 48)
    assert(df.rdd.getNumPartitions == 3)
  }

  test("_FillValue cells surface as SQL NULLs (dropna becomes a plain filter)") {
    assert(nc().filter(col("threshold_2y").isNull).count() == 5)
    assert(nc().na.drop(Seq("threshold_2y")).count() == 43)
  }

  test("column pruning reaches the I/O layer: unprojected variables are not read") {
    val df = nc().select("lat", "threshold_5y")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("vars=[threshold_5y]"), s"expected pruned var list:\n$plan")
    assert(df.collect().length == 48)
  }

  test("outer-coordinate range predicates slice the file (descending lat)") {
    val df = nc().filter(col("lat") >= 17.9) // lat descends 17.975, 17.925, 17.875, …
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("latIdx=[0,2)"), s"expected sliced outer range:\n$plan")
    assert(df.count() == 16)
    // inner-dim predicates are NOT pushed but stay correct via post-filter
    val lonF = nc().filter(col("lon") < -17.9)
    assert(lonF.count() == 12) // 2 of 8 lons × 6 lats
    assert(lonF.queryExecution.executedPlan.toString.contains("latIdx=[0,6)"))
  }

  test("an empty pruned range yields zero rows, not an error") {
    assert(nc().filter(col("lat") > 100.0).count() == 0)
  }

  test("reported statistics reflect the pushed slice (broadcastable rasters)") {
    def rowStats(df: org.apache.spark.sql.DataFrame) = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.head.stats.rowCount
    assert(rowStats(nc()).contains(BigInt(48)))
    assert(rowStats(nc().filter(col("lat") >= 17.9)).contains(BigInt(16)))
  }

  test("option 'variables' selects data vars; unknown names fail loudly") {
    val df = nc().select("upstream_area")
    assert(df.collect().map(_.getInt(0)).sum == (0 until 48).map(_ * 1000 + 7).sum)
    val e = intercept[IllegalArgumentException] {
      spark.read.format(classOf[NetcdfSource].getName)
        .option("path", fixture).option("variables", "nope").load()
    }
    assert(e.getMessage.contains("not found"))
  }

  // ---------------------------------------------------------------- CDF writer
  // Shared spec-conformant writer (TestWriters.scala) for edge-case files.

  private type V = CdfTestWriter.V
  private def V(name: String, dimIds: Seq[Int], ncType: Int, data: Seq[Double],
      fill: Option[Double] = None): CdfTestWriter.V =
    CdfTestWriter.V(name, dimIds, ncType, data, fill)

  private def writeCdf(file: String, version: Int, dims: Seq[(String, Int)], vars: Seq[V],
      numRecs: Int = 0): String =
    CdfTestWriter.write(file, version, dims, vars, numRecs)

  private def tmp(n: String) =
    new File(System.getProperty("java.io.tmpdir"), n).getAbsolutePath

  test("golden bytes: the Scala writer and the spec agree on a minimal file") {
    // one dim t=2, one int var x(t) — header derived by hand from the spec:
    // magic CDF\1 | numrecs 0 | NC_DIMENSION tag 10, 1 dim: name "t" len 2
    // | gatts ABSENT | NC_VARIABLE tag 11, 1 var: name "x", rank 1, dimid 0,
    // atts ABSENT, type 4, vsize 8, begin = header length = 80 (0x50)
    val f = writeCdf(tmp("golden.nc"), 1, Seq("t" -> 2), Seq(V("x", Seq(0), 4, Seq(7, 9))))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
    val expectHex =
      "43444601" + "00000000" +                   // magic, numrecs
      "0000000a" + "00000001" +                   // NC_DIMENSION, 1
      "00000001" + "74000000" + "00000002" +      // "t" (padded), len 2
      "00000000" + "00000000" +                   // gatts ABSENT
      "0000000b" + "00000001" +                   // NC_VARIABLE, 1
      "00000001" + "78000000" +                   // "x" (padded)
      "00000001" + "00000000" +                   // rank 1, dimid 0
      "00000000" + "00000000" +                   // vatts ABSENT
      "00000004" + "00000008" + "00000050" +      // type int, vsize 8, begin 80
      "00000007" + "00000009"                     // data 7, 9
    assert(bytes.map("%02x".format(_)).mkString == expectHex)
  }

  test("CDF-2 (64-bit offsets), short/byte types, and index fallback without coord vars") {
    val f = writeCdf(tmp("v2.nc"), 2, Seq("a" -> 2, "b" -> 3), Seq(
      V("s", Seq(0, 1), 3, Seq(1, 2, 3, 4, 5, 6)),
      V("y", Seq(0, 1), 1, Seq(-1, 0, 1, 2, 3, 4), fill = Some(-1.0))))
    val df = nc(f, parts = 2)
    assert(df.schema == StructType(Seq(
      StructField("a", DoubleType, nullable = false),
      StructField("b", DoubleType, nullable = false),
      StructField("s", ShortType, nullable = false),
      StructField("y", ByteType, nullable = true))))
    val rows = df.collect().map(r =>
      (r.getDouble(0), r.getDouble(1), r.getShort(2), Option(r.get(3)))).toSet
    val want = (for (i <- 0 until 2; j <- 0 until 3) yield {
      val c = i * 3 + j
      (i.toDouble, j.toDouble, (c + 1).toShort,
        if (c == 0) None else Some((c - 1).toByte.asInstanceOf[Any]))
    }).toSet
    assert(rows == want)
  }

  test("record (unlimited) dimension: committed fixture reads to the mirror, " +
    "time slicing pushes to record bounds") {
    val f = new File("data/netcdf/timeseries.nc").getAbsolutePath
    val mirror = new File("data/netcdf/timeseries_expected.parquet").getAbsolutePath
    val df = spark.read.format(classOf[NetcdfSource].getName)
      .option("path", f)
      .option("variables", "discharge,temp")
      .option("numPartitions", "3")
      .load()
    assert(df.schema.fieldNames.toSeq == Seq("time", "lat", "lon", "discharge", "temp"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), Option(r.get(3)), r.getDouble(4))
    assert(df.collect().map(key).toSet ==
      spark.read.parquet(mirror).collect().map(key).toSet)
    assert(df.count() == 4L * 6 * 8)
    // record-coordinate range predicate → outer (record) index bounds: the
    // sliced scan reads records 2..3 only
    val sliced = df.filter(col("time") >= 86400.0 * 3)
    assert(sliced.count() == 2L * 6 * 8)
    val scanDesc = sliced.queryExecution.executedPlan.toString()
    assert(scanDesc.contains("timeIdx=[2,4)"), s"expected pushed record bounds in: $scanDesc")
  }

  test("record layout: single record variable uses the spec's no-padding special case") {
    // v(t, x) int16 with x=3 → 6-byte record slab; with ONE record var the
    // slabs pack WITHOUT padding to 4, so record r starts at begin + r*6 —
    // a padded-stride reader would misread records past the first
    val f = writeCdf(tmp("rec1.nc"), 1, Seq("t" -> 0, "x" -> 3),
      Seq(V("v", Seq(0, 1), 3, Seq(1, 2, 3, 4, 5, 6, 7, 8, 9))), numRecs = 3)
    val rows = nc(f).collect().map(r => (r.getDouble(0), r.getDouble(1), r.getShort(2))).toSet
    val want = (for (t <- 0 until 3; x <- 0 until 3)
      yield (t.toDouble, x.toDouble, (t * 3 + x + 1).toShort)).toSet
    assert(rows == want)
  }

  test("record layout: STREAMING numrecs (0xFFFFFFFF) derives the count from the file length") {
    // two record vars (padded interleave) so the stride math is non-trivial
    val f = writeCdf(tmp("recstream.nc"), 1, Seq("t" -> 0, "x" -> 2), Seq(
      V("a", Seq(0, 1), 3, Seq(1, 2, 3, 4, 5, 6)),           // i16, slab 4 → padded 4
      V("b", Seq(0, 1), 6, Seq(10, 20, 30, 40, 50, 60))),    // f8, slab 16
      numRecs = 3)
    // patch numrecs to the STREAMING sentinel
    val raf = new java.io.RandomAccessFile(f, "rw")
    try { raf.seek(4); raf.writeInt(-1) } finally raf.close()
    val df = nc(f)
    assert(df.count() == 3L * 2)
    assert(df.agg(sum(col("a")), sum(col("b"))).collect().head.toSeq == Seq(21L, 210.0))
  }

  test("a record dimension that is not outermost is rejected loudly") {
    val f = writeCdf(tmp("recbad.nc"), 1, Seq("x" -> 2, "t" -> 0),
      Seq(V("v", Seq(0, 1), 4, Seq(1, 2, 3, 4))), numRecs = 2)
    val e = intercept[IllegalArgumentException] { nc(f).collect() }
    assert(e.getMessage.contains("not outermost"))
  }

  test("maxBytesPerPartition bounds the LARGEST partition, not the average") {
    // fixture: 6 outer rows × 8 lons; widest projected var is threshold_5y
    // (f8 → 64 bytes/outer row). A 100-byte ceiling admits floor(100/64)=1
    // row per partition → 6 partitions even though numPartitions=2 (an
    // average-based ceil(384/100)=4 would give ceil(6/4)=2-row partitions
    // reading 128 > 100 bytes); row content is unchanged.
    val df = spark.read.format(classOf[NetcdfSource].getName)
      .option("path", fixture)
      .option("variables", "threshold_5y")
      .option("numPartitions", "2")
      .option("maxBytesPerPartition", "100")
      .load()
    assert(df.rdd.getNumPartitions == 6)
    assert(df.count() == 48)
    // a 2-row budget (128 bytes) → 3 partitions of exactly 2 rows each
    val two = spark.read.format(classOf[NetcdfSource].getName)
      .option("path", fixture)
      .option("variables", "threshold_5y")
      .option("numPartitions", "2")
      .option("maxBytesPerPartition", "128")
      .load()
    assert(two.rdd.getNumPartitions == 3)
    // and the explicit count still wins when it is the FINER split
    assert(nc(parts = 3).rdd.getNumPartitions == 3)
  }

  test("corrupt header lengths fail as named errors, not allocation blowups") {
    // header integers are UNTRUSTED: a multi-GB or negative name length
    // must raise the malformed-header error, not NegativeArraySizeException
    // or a driver OOM mid-allocation
    val base = writeCdf(tmp("corrupt_base.nc"), 1, Seq("t" -> 2),
      Seq(V("x", Seq(0), 4, Seq(7, 9))))
    def patched(name: String, nameLen: Int): String = {
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(base))
      // dim name length sits at offset 16: magic(4) numrecs(4) tag(4) ndims(4)
      java.nio.ByteBuffer.wrap(bytes, 16, 4).putInt(nameLen)
      val f = java.nio.file.Paths.get(tmp(name))
      java.nio.file.Files.write(f, bytes)
      f.toString
    }
    for (bad <- Seq(Int.MaxValue, -4)) {
      val e = intercept[IllegalArgumentException] {
        nc(patched(s"corrupt_$bad.nc", bad)).collect()
      }
      assert(e.getMessage.contains("out of bounds"), e.getMessage)
    }
  }

  test("mixed dimension tuples require an explicit 'variables' pick") {
    val f = writeCdf(tmp("mixed.nc"), 1, Seq("a" -> 2, "b" -> 3), Seq(
      V("u", Seq(0), 4, Seq(5, 6)),
      V("w", Seq(0, 1), 4, (1 to 6).map(_.toDouble))))
    val e = intercept[IllegalArgumentException] { nc(f).collect() }
    assert(e.getMessage.contains("dimension tuple"))
    val u = spark.read.format(classOf[NetcdfSource].getName)
      .option("path", f).option("variables", "u").load()
    assert(u.collect().map(r => (r.getDouble(0), r.getInt(1))).toSet ==
      Set((0.0, 5), (1.0, 6)))
  }
}
