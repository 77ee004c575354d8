package graft.sources

import java.nio.file.Files
import scala.sys.process._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential fuzz of the WARC reader against the INDEPENDENT python
  * generator (`tools/make_warc_fuzz.py`): randomized record types,
  * header order/folding, binary bodies, and all four HTTP framings
  * (Content-Length, chunked with extensions + trailers, gzip,
  * chunked+gzip), checked record for record on BOTH layout twins; plus
  * corruption cases that must be rejected loudly. */
class WarcFuzzSpec extends SparkSpec {

  private val generator =
    new java.io.File("tools/make_warc_fuzz.py").getAbsolutePath

  private def generate(prefix: String, seed: Int,
      corrupt: Boolean = false): Seq[String] = {
    val buf = new StringBuilder
    val args = Seq("python3", generator, prefix, seed.toString) ++
      (if (corrupt) Seq("corrupt") else Nil)
    val rc = Process(args).!(ProcessLogger(l => buf.append(l).append('\n')))
    assert(rc == 0, s"generator failed:\n$buf")
    buf.toString.linesIterator.toSeq
  }

  private def readOne(path: String) = spark.read
    .format(classOf[WarcSource].getName)
    .option("path", path).load()
    .select(col("record_idx"), col("record_type"), col("http_status"),
      col("payload_len"), md5(col("payload")).as("m"))
    .collect()
    .map(r => r.getLong(0) -> (r.getString(1),
      if (r.isNullAt(2)) "-" else r.getInt(2).toString,
      r.getLong(3), r.getString(4)))
    .toMap

  test("seeded random streams decode to the generator's expectations, both layouts") {
    val dir = Files.createTempDirectory("warcfuzz").toString
    for (seed <- Seq(7, 42, 1234, 9001)) {
      val prefix = s"$dir/f$seed"
      val expects = generate(prefix, seed).collect {
        case l if l.startsWith("EXPECT ") =>
          val p = l.split(" ")
          p(1).toLong -> (p(2), p(3), p(4).toLong, p(5))
      }.toMap
      assert(expects.nonEmpty)
      for (path <- Seq(s"$prefix.warc", s"$prefix.warc.gz")) {
        val got = readOne(path)
        assert(got.keySet == expects.keySet, s"$path: row set")
        for ((idx, e) <- expects)
          assert(got(idx) == e, s"$path record $idx: got ${got(idx)}, want $e")
      }
    }
  }

  test("corrupted streams are rejected loudly, never misparsed") {
    val dir = Files.createTempDirectory("warcfuzzbad").toString
    val fails = generate(s"$dir/c", 1, corrupt = true).collect {
      case l if l.startsWith("EXPECTFAIL ") => l.stripPrefix("EXPECTFAIL ")
    }
    assert(fails.size == 3)
    for (path <- fails) {
      val e = intercept[Throwable] {
        spark.read.format(classOf[WarcSource].getName)
          .option("path", path).load().count()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("WarcSource") ||
        m.contains("truncated") || m.contains("version") ||
        m.contains("Content-Length") || m.contains("NumberFormat") ||
        m.contains("For input string")),
        s"$path: unexpected failure ${msgs(e).mkString(" | ")}")
    }
  }
}
