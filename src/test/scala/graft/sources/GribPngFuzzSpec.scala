package graft.sources

import java.io.File
import java.nio.file.Files
import scala.sys.process._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential fuzz of the PNG-packing (DRS 5.41) decode path against
  * the from-spec python encoder: `tools/make_grib_png_fixture.py` in
  * PNG_FUZZ mode emits seeded random messages — all four whole-byte
  * sample widths (8/16-bit gray, 24-bit RGB, 32-bit RGBA) plus
  * constants, random per-scanline filters, random raster factorizations
  * of the present-point count, sparse bitmaps, split IDAT, negative
  * reference values — and prints the exact `sum(round(value·20))`
  * checksum the reader must reproduce (the committed fixture pins only
  * fixed examples; 16/24/32-bit filters operate on multi-byte pixels,
  * where the `bpp`-offset left neighbor is easy to get wrong). The
  * corruption cases pin the LOUD-rejection contract: GRIB carries no
  * integrity check for section 7, so the decoder's own validation — and
  * the zlib adler32 trailer it insists on draining — is the only
  * defense against wrong rows. */
class GribPngFuzzSpec extends SparkSpec {

  private val generator = new File("tools/make_grib_png_fixture.py").getAbsolutePath

  private def generate(out: String, seed: Int): Long = {
    val buf = new StringBuilder
    val rc = Process(Seq("python3", generator, out, seed.toString), None,
      "PNG_FUZZ" -> "1").!(ProcessLogger(l => buf.append(l).append('\n')))
    assert(rc == 0, s"generator failed:\n$buf")
    val m = "expected sum_scaled over file: (-?\\d+)".r.findFirstMatchIn(buf.toString)
    m.getOrElse(fail(s"no checksum line in generator output:\n$buf")).group(1).toLong
  }

  private def read(path: String) = spark.read
    .format(classOf[GribSource].getName)
    .option("path", path).option("numPartitions", "3").load()

  test("seeded random PNG-packed files decode to the generator's checksum") {
    val dir = Files.createTempDirectory("grib-png-fuzz").toString
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

  /** (sec5 offset, sec7 offset) of the first message whose section 5
    * declares a nonzero packed width (constant fields have no PNG). */
  private def dataMessage(bytes: Array[Byte]): (Int, Int) = {
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
      if ((bytes(s5 + 5 + 14) & 0xFF) != 0) return (s5, s7)
      ms += total
    }
    fail("no message with a nonzero packed width")
  }

  /** Offset of the first IDAT chunk's DATA bytes inside section 7 (the
    * zlib CMF/FLG header lives there). */
  private def firstIdatData(bytes: Array[Byte], s7: Int): Int = {
    var off = s7 + 5 + 8 // past section header + PNG signature
    while (true) {
      val len = u32At(bytes, off)
      val tag = new String(bytes, off + 4, 4, "US-ASCII")
      if (tag == "IDAT") return off + 8
      assert(tag != "IEND", "no IDAT before IEND")
      off += 12 + len
    }
    -1 // unreachable
  }

  test("truncated and corrupted PNG payloads are rejected loudly") {
    val dir = Files.createTempDirectory("grib-png-bad").toString
    val good = s"$dir/good.grib2"
    generate(good, 5)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(good))
    val (s5, s7) = dataMessage(bytes)

    // file cut mid-message: must fail at INDEX time
    Files.write(java.nio.file.Paths.get(s"$dir/trunc.grib2"),
      java.util.Arrays.copyOf(bytes, (bytes.length * 0.6).toInt))
    val e0 = intercept[Throwable] { read(s"$dir/trunc.grib2").count() }
    assert(exceptionChain(e0).exists(_.contains("truncated drop")),
      s"wanted the truncation diagnostic, got: ${exceptionChain(e0).mkString(" | ")}")

    // section 5 declaring a different sample width than the PNG carries:
    // a non-whole-byte width rejects at INDEX time; a legal-but-wrong
    // width rejects at decode with the declares-mismatch diagnostic
    val badBits = bytes.clone()
    badBits(s5 + 5 + 14) = 7.toByte // never a whole-byte PNG width
    Files.write(java.nio.file.Paths.get(s"$dir/bits.grib2"), badBits)
    val e1 = intercept[Throwable] { read(s"$dir/bits.grib2").count() }
    assert(exceptionChain(e1).exists(_.contains("7 bits per value")),
      s"wanted the width rejection, got: ${exceptionChain(e1).mkString(" | ")}")
    val wrongBits = bytes.clone()
    val depth = bytes(s5 + 5 + 14) & 0xFF
    wrongBits(s5 + 5 + 14) = (if (depth == 8) 16 else 8).toByte
    Files.write(java.nio.file.Paths.get(s"$dir/wrongbits.grib2"), wrongBits)
    val e1b = intercept[Throwable] {
      read(s"$dir/wrongbits.grib2").agg(sum(col("value"))).head
    }
    assert(exceptionChain(e1b).exists(m =>
      m.contains("declares") || m.contains("raster is")),
      s"wanted the width-mismatch diagnostic, got: ${exceptionChain(e1b).mkString(" | ")}")

    // interlaced IHDR (offset: sec body + sig 8 + chunk hdr 8 + 12)
    val inter = bytes.clone()
    inter(s7 + 5 + 8 + 8 + 12) = 1.toByte
    Files.write(java.nio.file.Paths.get(s"$dir/inter.grib2"), inter)
    val e2 = intercept[Throwable] {
      read(s"$dir/inter.grib2").agg(sum(col("value"))).head
    }
    assert(exceptionChain(e2).exists(_.contains("interlaced")),
      s"wanted the interlace diagnostic, got: ${exceptionChain(e2).mkString(" | ")}")

    // corrupt zlib header (FLG check bits): the inflater must refuse —
    // wrong values may never come out of a damaged stream
    val flg = bytes.clone()
    val zh = firstIdatData(bytes, s7)
    flg(zh + 1) = (flg(zh + 1) ^ 0x10).toByte
    Files.write(java.nio.file.Paths.get(s"$dir/zlib.grib2"), flg)
    val e3 = intercept[Throwable] {
      read(s"$dir/zlib.grib2").agg(sum(col("value"))).head
    }
    assert(exceptionChain(e3).exists(m => m.contains("zlib") ||
      m.contains("truncated or dictionary")),
      s"wanted a loud zlib failure, got: ${exceptionChain(e3).mkString(" | ")}")
  }

  private def exceptionChain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq
}
