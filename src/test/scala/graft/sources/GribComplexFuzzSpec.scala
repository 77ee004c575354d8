package graft.sources

import java.io.File
import java.nio.file.Files
import scala.sys.process._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential fuzz of the complex-packing (DRS 5.2/5.3) decode path
  * against the INDEPENDENT python encoder: the spec drives
  * `tools/make_grib_complex_fixture.py` in big mode with seeded random
  * fields and randomized grid dims, captures the generator's own
  * expected checksum (sum of value·20, an exact integer for the chosen
  * E/D), and asserts the Scala reader reproduces it bit-exactly. This
  * exercises the uniform-width encoding variant (widthBits=0) the
  * committed fixture does not, all three spatial-differencing orders
  * (the member index cycles 0/1/2), and short last groups. Corruption
  * cases assert LOUD rejection, never wrong rows. */
class GribComplexFuzzSpec extends SparkSpec {

  private val generator = new File("tools/make_grib_complex_fixture.py").getAbsolutePath

  private def generate(out: String, seed: Int, ni: Int, nj: Int,
      members: Int, steps: Int): Long = {
    val cmd = Seq("python3", generator, out)
    val env = Seq("GC_BIG" -> "1", "GC_SEED" -> seed.toString,
      "GC_NI" -> ni.toString, "GC_NJ" -> nj.toString,
      "GC_MEMBERS" -> members.toString, "GC_STEPS" -> steps.toString)
    val buf = new StringBuilder
    val rc = Process(cmd, None, env: _*).!(ProcessLogger(l => buf.append(l).append('\n')))
    assert(rc == 0, s"generator failed:\n$buf")
    val m = "expected sum_scaled over file: (-?\\d+)".r.findFirstMatchIn(buf.toString)
    m.getOrElse(fail(s"no checksum line in generator output:\n$buf")).group(1).toLong
  }

  private def read(path: String) = spark.read
    .format(classOf[GribSource].getName)
    .option("path", path).option("numPartitions", "3").load()

  test("seeded random complex-packed files decode to the generator's checksum") {
    val dir = Files.createTempDirectory("grib-fuzz").toString
    // three seeds x varied dims: odd widths, glen-divisible and short
    // last groups, single-row and single-column grids
    val cases = Seq((1, 30, 20, 3, 2), (2, 64, 1, 2, 1), (3, 17, 23, 4, 2))
    for (((seed, ni, nj, mem, st), ix) <- cases.zipWithIndex) {
      val f = s"$dir/fuzz_$ix.grib2"
      val expected = generate(f, seed, ni, nj, mem, st)
      val df = read(f)
      val got = df.agg(sum(round(col("value") * 20).cast("long"))).head.getLong(0)
      assert(got == expected,
        s"case $ix (seed=$seed ${ni}x$nj): decoded checksum $got != $expected")
      assert(df.count() == mem.toLong * st * ni * nj)
    }
  }

  /** Offset of the first section with this number in the first message. */
  private def sectionOffset(bytes: Array[Byte], num: Int): Int = {
    def u32(o: Int) = ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
      ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
    var at = 16
    while (at < bytes.length - 4) {
      if ((bytes(at + 4) & 0xFF) == num) return at
      at += u32(at)
    }
    fail(s"section $num not found")
  }

  test("truncated and corrupted complex payloads are rejected loudly") {
    val dir = Files.createTempDirectory("grib-fuzz-bad").toString
    val good = s"$dir/good.grib2"
    generate(good, 7, 24, 8, 1, 1)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(good))

    // file cut mid-payload: the declared message length overruns EOF —
    // must fail at INDEX time (a value-pruned count never reads the
    // payload, so decode-time detection alone would pass truncation)
    Files.write(java.nio.file.Paths.get(s"$dir/trunc.grib2"),
      java.util.Arrays.copyOf(bytes, (bytes.length * 0.6).toInt))
    val e0 = intercept[Throwable] { read(s"$dir/trunc.grib2").count() }
    assert(exceptionChain(e0).exists(_.contains("truncated drop")),
      s"wanted the truncation diagnostic, got: ${exceptionChain(e0).mkString(" | ")}")

    // implausible group count (NG at section-5 body offset 26): the
    // driver-side index walk must refuse before sizing arrays from it
    val ngCorrupt = bytes.clone()
    val s5 = sectionOffset(ngCorrupt, 5)
    ngCorrupt(s5 + 5 + 26) = 0x7F.toByte
    Files.write(java.nio.file.Paths.get(s"$dir/ng.grib2"), ngCorrupt)
    val e1 = intercept[Throwable] { read(s"$dir/ng.grib2").count() }
    assert(exceptionChain(e1).exists(_.contains("implausible group count")),
      s"wanted the group-count diagnostic, got: ${exceptionChain(e1).mkString(" | ")}")

    // wrong true-length-of-last-group (body offset 37): group lengths no
    // longer sum to the data-point count — decode must fail, not misread
    val lenCorrupt = bytes.clone()
    lenCorrupt(s5 + 5 + 40) = (lenCorrupt(s5 + 5 + 40) + 1).toByte
    Files.write(java.nio.file.Paths.get(s"$dir/len.grib2"), lenCorrupt)
    // a value DECODE (count alone never reads the payload) must fail
    val e2 = intercept[Throwable] {
      read(s"$dir/len.grib2").agg(sum(col("value"))).head
    }
    assert(exceptionChain(e2).exists(_.contains("group lengths sum")),
      s"wanted the group-length diagnostic, got: ${exceptionChain(e2).mkString(" | ")}")
  }

  private def exceptionChain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq
}
