package graft.functions

import java.nio.file.Files
import scala.sys.process._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential fuzz of the GRAFT-HTML-TEXT v1 scanner against python's
  * stdlib html.parser (`tools/make_html_fuzz.py` — the independent
  * tokenizer that also produced the committed crawl expectations):
  * seeded random documents over the contract space — nested tags with
  * random case/whitespace/attributes (quoted '>' included), the
  * decodable entity set plus verbatim leftovers, literal '<'/'&' text,
  * comments/doctypes/PIs, raw-text script/style with failed-close bait,
  * suppressed template/noscript, void and unclosed elements. */
class GraftHtmlFuzzSpec extends SparkSpec {

  private val generator =
    new java.io.File("tools/make_html_fuzz.py").getAbsolutePath

  test("random contract-space documents extract identically to html.parser") {
    for (seed <- Seq(7, 99, 31337)) {
      val dir = Files.createTempDirectory(s"htmlfuzz$seed").toString
      val buf = new StringBuilder
      val rc = Process(Seq("python3", generator, dir, seed.toString, "120"))
        .!(ProcessLogger(l => buf.append(l).append('\n')))
      assert(rc == 0, s"generator failed:\n$buf")
      val rows = spark.read.parquet(s"$dir/html.parquet")
        .select(col("doc_id"),
          GraftHtmlOps.htmlTextCol(col("html")).as("got"),
          col("expected"), col("html"))
        .collect()
      assert(rows.length == 120)
      rows.foreach { r =>
        assert(r.getString(1) == r.getString(2),
          s"seed=$seed doc=${r.getLong(0)} diverges\n--- html\n${r.getString(3)}\n" +
            s"--- scala\n${r.getString(1)}\n--- python\n${r.getString(2)}")
      }
    }
  }
}
