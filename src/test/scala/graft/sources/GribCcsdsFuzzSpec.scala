package graft.sources

import java.io.File
import java.nio.file.Files
import scala.sys.process._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential fuzz of the CCSDS/AEC (DRS 5.42) decode path against the
  * from-spec python encoder: the spec drives
  * `tools/make_grib_ccsds_fixture.py` in CC_FUZZ mode with seeded random
  * fields and parameters, captures the generator's expected checksum
  * (sum of value·20, an exact integer for the chosen E/D), and asserts
  * the Scala reader reproduces it bit-exactly. The randomized grids are
  * large enough to reach the f ≥ 5 zero-run codeword and RSIs beyond 64
  * (the remainder-of-segment 64-block-boundary rule) that the small
  * committed fixture cannot. Corruption cases assert LOUD rejection:
  * AEC streams carry no integrity check, so the decoder's own range/
  * bounds validation is the only defense against wrong rows. */
class GribCcsdsFuzzSpec extends SparkSpec {

  private val generator = new File("tools/make_grib_ccsds_fixture.py").getAbsolutePath

  private def generate(out: String, seed: Int): Long = {
    val buf = new StringBuilder
    val rc = Process(Seq("python3", generator, out, seed.toString), None,
      "CC_FUZZ" -> "1").!(ProcessLogger(l => buf.append(l).append('\n')))
    assert(rc == 0, s"generator failed:\n$buf")
    val m = "expected sum_scaled over file: (-?\\d+)".r.findFirstMatchIn(buf.toString)
    m.getOrElse(fail(s"no checksum line in generator output:\n$buf")).group(1).toLong
  }

  private def read(path: String) = spark.read
    .format(classOf[GribSource].getName)
    .option("path", path).option("numPartitions", "3").load()

  test("seeded random CCSDS-packed files decode to the generator's checksum") {
    val dir = Files.createTempDirectory("grib-ccsds-fuzz").toString
    for (seed <- Seq(1, 2, 3, 7, 11)) {
      val f = s"$dir/fuzz_$seed.grib2"
      val expected = generate(f, seed)
      val got = read(f).agg(sum(round(col("value") * 20).cast("long")))
        .head.getLong(0)
      assert(got == expected,
        s"seed $seed: decoded checksum $got != $expected")
    }
  }

  private def u32At(bytes: Array[Byte], o: Int) =
    ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
      ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)

  /** (msgStart, msgEnd, sec5 offset, sec7 offset) of the first message
    * whose section 5 declares a nonzero packed width — constant fields
    * (nbits 0) never reach the entropy decoder, so corruption there
    * would be invisible. */
  private def dataMessage(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    var ms = 0
    while (ms < bytes.length - 4) {
      val total = java.nio.ByteBuffer.wrap(bytes, ms + 8, 8).getLong.toInt
      var at = ms + 16
      var s5 = -1
      var s7 = -1
      while (at < ms + total - 4) {
        val num = bytes(at + 4) & 0xFF
        if (num == 5) s5 = at
        if (num == 7) s7 = at
        at += u32At(bytes, at)
      }
      assert(s5 >= 0 && s7 >= 0, s"message at $ms lacks section 5/7")
      if ((bytes(s5 + 5 + 14) & 0xFF) != 0) return (ms, ms + total, s5, s7)
      ms += total
    }
    fail("no message with a nonzero packed width")
  }

  test("truncated and corrupted CCSDS payloads are rejected loudly") {
    val dir = Files.createTempDirectory("grib-ccsds-bad").toString
    val good = s"$dir/good.grib2"
    generate(good, 5)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(good))
    val (msgStart, msgEnd, s5, s7) = dataMessage(bytes)

    // file cut mid-payload: must fail at INDEX time
    Files.write(java.nio.file.Paths.get(s"$dir/trunc.grib2"),
      java.util.Arrays.copyOf(bytes, (bytes.length * 0.6).toInt))
    val e0 = intercept[Throwable] { read(s"$dir/trunc.grib2").count() }
    assert(exceptionChain(e0).exists(_.contains("truncated drop")),
      s"wanted the truncation diagnostic, got: ${exceptionChain(e0).mkString(" | ")}")

    // signed-data flag (template octet 22, body offset 16): semantics the
    // decoder does not implement must reject at index time, not misread
    val signed = bytes.clone()
    signed(s5 + 5 + 16) = (signed(s5 + 5 + 16) | 1).toByte
    Files.write(java.nio.file.Paths.get(s"$dir/signed.grib2"), signed)
    val e1 = intercept[Throwable] {
      read(s"$dir/signed.grib2").agg(sum(col("value"))).head
    }
    assert(exceptionChain(e1).exists(_.contains("signed-data")),
      s"wanted the signed-mode diagnostic, got: ${exceptionChain(e1).mkString(" | ")}")

    // an unsupported block size (octet 23) rejects at index time
    val badBlock = bytes.clone()
    badBlock(s5 + 5 + 17) = 13.toByte
    Files.write(java.nio.file.Paths.get(s"$dir/block.grib2"), badBlock)
    val e2 = intercept[Throwable] { read(s"$dir/block.grib2").count() }
    assert(exceptionChain(e2).exists(_.contains("block size")),
      s"wanted the block-size diagnostic, got: ${exceptionChain(e2).mkString(" | ")}")

    // section 7 cut short but the file structurally valid: the bit
    // reader must exhaust loudly, never fabricate samples. Rebuild the
    // data message alone with a shortened section 7 and patched lengths.
    val s7len = u32At(bytes, s7)
    val cut = math.max(6, s7len / 2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, msgStart, s7 - msgStart)
    val shortSec = java.util.Arrays.copyOfRange(bytes, s7, s7 + cut)
    java.nio.ByteBuffer.wrap(shortSec, 0, 4).putInt(cut)
    out.write(shortSec)
    out.write("7777".getBytes)
    val one = out.toByteArray
    java.nio.ByteBuffer.wrap(one, 8, 8).putLong(one.length.toLong)
    Files.write(java.nio.file.Paths.get(s"$dir/short7.grib2"), one)
    val e3 = intercept[Throwable] {
      read(s"$dir/short7.grib2").agg(sum(col("value"))).head
    }
    assert(exceptionChain(e3).exists(m => m.contains("exhausted") ||
      m.contains("CCSDS")),
      s"wanted a loud decode failure, got: ${exceptionChain(e3).mkString(" | ")}")
  }

  private def exceptionChain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq
}
