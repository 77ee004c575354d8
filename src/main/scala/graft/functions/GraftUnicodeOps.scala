package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernels — the fix-the-bytes pass a web corpus
  * runs before ANY hashing, shingling, or tokenization: the same text
  * arriving precomposed (`é`) and decomposed (`e`+U+0301) must dedup,
  * fingerprint, and tokenize identically, so everything downstream keys
  * on the NFC form.
  *
  * `nfc` is Unicode Normalization Form C (canonical decomposition +
  * canonical composition); `nfkc` additionally applies compatibility
  * folding (ligatures, full-width forms — the aggressive variant used
  * for match keys, not for display text). Both delegate to
  * `java.text.Normalizer` — the JDK's conformant implementation of
  * UAX #15 — via `StaticInvoke`, so they ride whole-stage codegen with a
  * fast-path skip for text that is already normalized
  * (`Normalizer.isNormalized` is O(n) with no allocation; real corpus
  * text is overwhelmingly already-NFC ASCII).
  *
  * Cross-engine note: the oracle mirrors `nfc` with DuckDB's
  * `nfc_normalize` (utf8proc). Both are conformant UAX #15
  * implementations, so they agree on every ASSIGNED codepoint; divergence
  * is possible only for codepoints newer than one engine's Unicode data
  * tables — not a property real corpus text exercises.
  */
object GraftUnicodeOps {

  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }

  def nfkc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFKC))
  }

  private def call(name: String, c: Column): Column =
    ColumnBridge.column(StaticInvoke(
      GraftUnicodeOps.getClass, StringType, name,
      Seq(ColumnBridge.expression(c)),
      propagateNull = true, returnNullable = false))

  def nfcCol(text: Column): Column = call("nfc", text)
  def nfkcCol(text: Column): Column = call("nfkc", text)
}
