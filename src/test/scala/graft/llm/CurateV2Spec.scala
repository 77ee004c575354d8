package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Five-gate curation verdict: gate precedence, per-gate firing, and
  * the keep flag. */
class CurateV2Spec extends SparkSpec {
  import spark.implicits._

  // A healthy doc needs: unique text, quality >= 0.4, accepted label,
  // plausible bigrams, and no smaller-id near-duplicate.
  private val good = "the quick brown fox jumps over a lazy dog of the north valley"

  private def verdicts(rows: (Long, String, String)*): Map[Long, (Boolean, String)] =
    Curation.curateV2(rows.toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", acceptLabels = Set("en"),
      minAvgLpMicros = -5000000L)
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("each gate fires and the first failing gate names the reason") {
    val out = verdicts(
      (1L, good, "en"),
      (2L, good, "en"), // exact dup of 1 -> exact_dup (before near_duplicate)
      (3L, good + " extra word", "en"), // near-dup of 1, not exact
      (4L, "aa aa aa aa aa aa aa aa aa aa aa aa", "en"), // degenerate -> low_quality
      // off-label doc with DISJOINT vocabulary (a tiny self-trained NB
      // would otherwise assign shared words higher likelihood under the
      // rare label's small denominator)
      (5L, "zonk blip zork vex nim quux zonk blip zork vex nim quux", "zz"))
    assert(out(1L) == ((true, "kept")))
    assert(out(2L) == ((false, "exact_dup")))
    assert(out(3L) == ((false, "near_duplicate")))
    assert(out(4L)._2 == "low_quality")
    assert(out(5L) == ((false, "off_label")))
  }

  test("LM floor rejects scrambled-bigram docs that pass every other gate") {
    // train distribution: 'aa bb' dominates; doc 20 is all unobserved
    // in-vocab bigrams -> average log-prob far below the floor
    val docs = Seq(
      (1L, "aa bb aa bb aa bb cc dd ee ff gg hh", "en"),
      (2L, "aa bb aa bb cc dd ee ff gg hh ii jj", "en"),
      (20L, "bb aa ff ee dd cc hh gg jj ii bb aa", "en")).toDF("doc_id", "text", "lang")
    // minJaccard = 0.99 disables the near-dup gate (char shingles of a
    // scrambled doc still overlap heavily) so the test isolates the floor
    val out = Curation.curateV2(docs, "doc_id", "text", "lang",
      acceptLabels = Set("en"), minAvgLpMicros = -1600000L, minJaccard = 0.99)
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> r._3).toMap
    assert(out(1L) == "kept" && out(2L) == "kept")
    assert(out(20L) == "low_lp")
  }

  test("verdict covers every input exactly once") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val v = Curation.curateV2(docs, "doc_id", "text", "lang",
      acceptLabels = Set("en", "de", "fr"))
    assert(v.count() == docs.count())
    assert(v.select("doc_id").distinct().count() == docs.count())
    assert(v.filter(col("keep") =!= (col("reason") === "kept")).count() == 0)
  }
}
