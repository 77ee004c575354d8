package graft.sources

import java.io.File
import java.nio.file.Files
import scala.sys.process._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential fuzz of the NetCDF classic reader against the
  * INDEPENDENT python generator (`tools/make_netcdf_fuzz.py`): every
  * structural parameter randomizes from the seed — CDF-1/CDF-2, grid
  * dims (incl. 1-wide), coordinate direction, variable count and types
  * (f4/f8/i4/i2), _FillValue masks, random-length attributes — and the
  * reader must reproduce the generator's own per-variable non-fill
  * count and integer checksum. Values land on the 1/8 grid so
  * `round(value·1000)` is engine-exact. Truncations assert loud
  * rejection. */
class NetcdfFuzzSpec extends SparkSpec {

  private val generator = new File("tools/make_netcdf_fuzz.py").getAbsolutePath

  private def generate(out: String, seed: Int): Seq[(String, Long, Long)] = {
    val buf = new StringBuilder
    val rc = Process(Seq("python3", generator, out, seed.toString))
      .!(ProcessLogger(l => buf.append(l).append('\n')))
    assert(rc == 0, s"generator failed:\n$buf")
    "EXPECT (\\S+) (\\d+) (-?\\d+)".r.findAllMatchIn(buf.toString)
      .map(m => (m.group(1), m.group(2).toLong, m.group(3).toLong)).toSeq
  }

  private def read(path: String) = spark.read
    .format(classOf[NetcdfSource].getName)
    .option("path", path).option("numPartitions", "3").load()

  test("seeded random CDF-1/CDF-2 files decode to the generator's checksums") {
    val dir = Files.createTempDirectory("nc-fuzz").toString
    for (seed <- Seq(1, 7, 42, 1234, 99999)) {
      val f = s"$dir/fuzz_$seed.nc"
      val expects = generate(f, seed)
      assert(expects.nonEmpty)
      val df = read(f)
      for ((vn, n, sum) <- expects) {
        val r = df.agg(
          count(col(vn)).as("n"),
          coalesce(sum_(round(col(vn) * 1000).cast("long")), lit(0L)).as("s")).head
        assert(r.getLong(0) == n && r.getLong(1) == sum,
          s"seed=$seed $vn: got (${r.getLong(0)}, ${r.getLong(1)}), " +
            s"expected ($n, $sum)")
      }
    }
  }

  private def sum_(c: org.apache.spark.sql.Column) = sum(c)

  test("truncated NetCDF files are rejected loudly, never read short") {
    val dir = Files.createTempDirectory("nc-fuzz-bad").toString
    val f = s"$dir/good.nc"
    generate(f, 5)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(f))
    // cut inside the data region: reads must fail, not return fewer rows
    Files.write(java.nio.file.Paths.get(s"$dir/trunc.nc"),
      java.util.Arrays.copyOf(bytes, (bytes.length * 0.7).toInt))
    intercept[Throwable] {
      read(s"$dir/trunc.nc").agg(count(lit(1))).head
    }
    // cut inside the header
    Files.write(java.nio.file.Paths.get(s"$dir/trunc2.nc"),
      java.util.Arrays.copyOf(bytes, 40))
    intercept[Throwable] { read(s"$dir/trunc2.nc").count() }
  }
}
