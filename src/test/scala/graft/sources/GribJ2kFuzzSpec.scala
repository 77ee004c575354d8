package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}
import scala.sys.process._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DRS 5.40 (JPEG 2000 lossless) decode: the committed fixture against its
  * independently-computed parquet mirror, plus a differential fuzz against
  * the from-spec python encoder (`tools/make_grib_j2k_fixture.py` in
  * J2K_FUZZ mode — seeded random grids, depths 4-16, 1-4 decomposition
  * levels, random code-block shapes, bitmap variants; every emitted
  * codestream is already round-tripped through the generator's OWN
  * independent decoder before it reaches this spec, so the Scala reader is
  * a third implementation of the same public spec). Corruption cases
  * assert LOUD rejection — a JPEG 2000 codestream carries no payload
  * integrity check, so the decoder's range/bounds/structure validation is
  * the only defense against wrong rows. */
class GribJ2kFuzzSpec extends SparkSpec {

  private val generator = new File("tools/make_grib_j2k_fixture.py").getAbsolutePath

  private def generate(out: String, seed: Int): Long = {
    val buf = new StringBuilder
    val rc = Process(Seq("python3", generator, out, seed.toString), None,
      "J2K_FUZZ" -> "1").!(ProcessLogger(l => buf.append(l).append('\n')))
    assert(rc == 0, s"generator failed:\n$buf")
    val m = "expected sum_scaled over file: (-?\\d+)".r.findFirstMatchIn(buf.toString)
    m.getOrElse(fail(s"no checksum line in generator output:\n$buf")).group(1).toLong
  }

  private def read(path: String) = spark.read
    .format(classOf[GribSource].getName)
    .option("path", path).option("numPartitions", "3").load()

  test("the committed 5.40 fixture decodes to the independent mirror") {
    val f = new File("data/grib/j2k.grib2").getAbsolutePath
    val exp = new File("data/grib/j2k_expected.parquet").getAbsolutePath
    val cols = Seq("latitude", "longitude", "number", "step_hours", "value")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect()
        .map(r => (r.getDouble(0), r.getDouble(1),
          Option(r.get(2)), r.getInt(3), r.getDouble(4))).toSet
    // bitmap-missing cells surface as NULL values on BOTH sides (the
    // source contract, mirrored including NULL rows for the oracle);
    // compare the present cells exactly and the NULL counts
    val got = rows(read(f).na.drop(Seq("value")))
    val want = rows(spark.read.parquet(exp).na.drop(Seq("value")))
    assert(got == want)
    assert(read(f).filter(col("value").isNull).count() ==
      spark.read.parquet(exp).filter(col("value").isNull).count())
    // the bitmap message really is sparse: fewer present cells
    assert(read(f).filter(col("step_hours") === 48 &&
      col("value").isNotNull).count() <
      read(f).filter(col("step_hours") === 24 && col("number") === 1).count())
  }

  test("seeded random 5.40 files decode to the generator's checksum") {
    val dir = Files.createTempDirectory("grib-j2k-fuzz").toString
    for (seed <- Seq(1, 2, 3, 7, 11, 42)) {
      val f = s"$dir/fuzz_$seed.grib2"
      val expected = generate(f, seed)
      val got = read(f).agg(sum(round(col("value") * 1000).cast("long")))
        .head.getLong(0)
      assert(got == expected, s"seed $seed: decoded checksum $got != $expected")
    }
  }

  test("corrupt codestreams reject loudly, never emit wrong rows") {
    val f = new File("data/grib/j2k.grib2").getAbsolutePath
    val bytes = Files.readAllBytes(Paths.get(f))
    val dir = Files.createTempDirectory("grib-j2k-bad").toString
    val baseline = read(f)
      .agg(sum(round(col("value") * 1000).cast("long"))).head.getLong(0)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // flip one byte inside each message's section-7 payload region (skip
    // the first bytes, which are markers whose corruption also rejects)
    var rejected = 0
    var silent = 0
    for (off <- Seq(bytes.length / 3, bytes.length / 2, 2 * bytes.length / 3)) {
      val bad = bytes.clone()
      bad(off) = (bad(off) ^ 0x5A).toByte
      val p = s"$dir/bad_$off.grib2"
      Files.write(Paths.get(p), bad)
      try {
        val got = read(p)
          .agg(sum(round(col("value") * 1000).cast("long"))).head.getLong(0)
        // an arithmetic-coded flip CAN decode to in-range values — but it
        // must never silently reproduce the ORIGINAL checksum while
        // claiming success on different bytes
        if (got == baseline) silent += 1
      } catch {
        case e: Throwable =>
          rejected += 1
          assert(messages(e).nonEmpty, s"empty failure at $off: $e")
      }
    }
    assert(silent == 0, "a corrupted payload reproduced the original checksum")
    // truncation inside the codestream must reject by name
    val cut = java.util.Arrays.copyOf(bytes, bytes.length / 2)
    Files.write(Paths.get(s"$dir/trunc.grib2"), cut)
    val e = intercept[Throwable] { read(s"$dir/trunc.grib2").count() }
    assert(messages(e).nonEmpty)
  }

  test("lossy 5.40 still rejects at index time with the escape hatch") {
    // the regenerated jpeg2000.grib2 fixture now carries compression
    // type 1 (lossy): no exact integer reconstruction exists, so the
    // reject names the cause and the grib_set conversion
    val f = new File("data/grib/jpeg2000.grib2").getAbsolutePath
    val e = intercept[Exception] { read(f).count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val msg = messages(e).mkString("\n")
    assert(msg.contains("5.40") && msg.contains("LOSSY") &&
      msg.contains("grib_set"), msg)
  }
}
