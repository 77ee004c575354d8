package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** UAX #15 kernel pins + the GRAFT-CLEAN v1 composition. */
class GraftUnicodeOpsSpec extends SparkSpec {

  private def nfc(s: String): String = GraftUnicodeOps.nfc(UTF8String.fromString(s)).toString
  private def nfkc(s: String): String = GraftUnicodeOps.nfkc(UTF8String.fromString(s)).toString

  test("nfc composes combining marks and singleton decompositions") {
    assert(nfc("cafe\u0301") == "caf\u00E9")
    assert(nfc("\u0041\u030A") == "\u00C5")   // A + combining ring
    assert(nfc("\u212B") == "\u00C5")          // ANGSTROM SIGN singleton
    assert(nfc("abc") == "abc")                // ASCII fast path
    assert(nfc("\uFB01le \uFF21") == "\uFB01le \uFF21") // compatibility kept
  }

  test("nfkc additionally folds compatibility characters") {
    assert(nfkc("\uFB01le") == "file")          // fi-ligature
    assert(nfkc("\uFF21") == "A")               // fullwidth A
    assert(nfkc("cafe\u0301") == "caf\u00E9")  // canonical part identical
  }

  test("already-normalized input returns the SAME UTF8String (no copy)") {
    val u = UTF8String.fromString("plain ascii text")
    assert(GraftUnicodeOps.nfc(u) eq u)
    assert(GraftUnicodeOps.nfkc(u) eq u)
  }

  test("cleanText: NFC + C0 strip, changed flag, null-safe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cafe\u0301 time"),                     // normalization fires
      (2L, "bell\u0007 and\u000B vt\u007F"),       // controls + DEL stripped
      (3L, "tab\tand\nnewline survive"),           // kept whitespace
      (4L, "plain"),                               // unchanged
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = graft.llm.TextAnalysis.cleanText(docs, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(2) == "caf\u00E9 time" && out(1L).getBoolean(3))
    assert(out(2L).getString(2) == "bell and vt" && out(2L).getBoolean(3))
    assert(out(3L).getString(2) == "tab\tand\nnewline survive" && !out(3L).getBoolean(3))
    assert(out(4L).getString(2) == "plain" && !out(4L).getBoolean(3))
    assert(out(5L).isNullAt(2) && !out(5L).getBoolean(3))
  }
}
