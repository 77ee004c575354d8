package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CI-OPTIONAL differential against REAL libhdf5 output: every committed
  * NetCDF-4 fixture is written by this repo's independent from-spec
  * Python writer, so a shared misreading of the H5EA/H5B2/H5FA geometry
  * by both sides would pass the committed mirrors undetected. When
  * `tools/make_libhdf5_fixture.py` can run (h5py installed) — or
  * `GRAFT_LIBHDF5_DIR` points at pre-generated files — this spec
  * cross-reads libhdf5's own extensible-array / v2-B-tree / fixed-array
  * chunk indexes through the production source and re-derives every
  * cell from the generator's documented formula. Without h5py the
  * tests CANCEL (not pass): the differential is optional, never faked. */
class Netcdf4LibCrossSpec extends SparkSpec {

  private lazy val dir: Option[String] = {
    val preset = sys.env.get("GRAFT_LIBHDF5_DIR").filter(d =>
      new File(d, "libhdf5_cross_ea.nc").isFile)
    preset.orElse {
      val tmp = java.nio.file.Files.createTempDirectory("libhdf5-cross").toString
      val gen = new File("tools/make_libhdf5_fixture.py").getAbsolutePath
      val rc = scala.sys.process.Process(Seq("python3", gen, tmp)).!(
        scala.sys.process.ProcessLogger(_ => ()))
      if (rc == 0) Some(tmp) else None // rc 2 = no h5py here
    }
  }

  private def nc(name: String) = spark.read
    .format(classOf[NetcdfSource].getName)
    .option("path", new File(dir.get, name).getAbsolutePath)
    .option("numPartitions", "3")
    .load()

  private def crossRead(file: String, varName: String, nT: Int, nY: Int)(
      expect: (Int, Int) => Double): Unit = {
    assume(dir.nonEmpty, "h5py/libhdf5 not installed and GRAFT_LIBHDF5_DIR unset")
    val df = nc(file)
    assert(df.columns.sorted.toSeq == Seq("t", varName, "y"))
    val rows = df.select(col("t"), col("y"), col(varName).cast("double"))
      .collect()
      .map(r => (math.round(r.getDouble(0) / 10).toInt,
        math.round(r.getDouble(1) / 10).toInt, r.getDouble(2)))
    assert(rows.length == nT * nY, s"$file: ${rows.length} rows")
    for ((t, y, v) <- rows)
      assert(v == expect(t, y), s"$file[$t,$y] = $v, want ${expect(t, y)}")
  }

  test("libhdf5-written EXTENSIBLE-ARRAY index cross-reads cell-exactly") {
    crossRead("libhdf5_cross_ea.nc", "v_ea", 30, 11)((t, y) => t * 1000.0 + y)
  }

  test("libhdf5-written V2-B-TREE index (two unlimited dims) cross-reads") {
    crossRead("libhdf5_cross_bt2.nc", "v_bt2", 12, 7)((t, y) => t * 37.0 - y * 5.0)
  }

  test("libhdf5-written FIXED-ARRAY index cross-reads cell-exactly") {
    crossRead("libhdf5_cross_fa.nc", "v_fixed", 10, 6)(
      (t, y) => (t * 13.0 + y * 7.0) % 100.0)
  }
}
