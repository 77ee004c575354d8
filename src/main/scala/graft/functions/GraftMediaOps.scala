package graft.functions

import graft.llm.{MediaRecord, Multimodal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** StaticInvoke surface for the media header decoders of
  * [[graft.llm.Multimodal]] — lets plain SQL sniff and parse binary media
  * columns (`graft_media_meta(payload).width`) with the same magic-byte
  * dispatch, spec-exact parsing, and stub fallback as the Dataset
  * operators. */
object GraftMediaOps {

  /** Header-decode one payload: returns (decoder, width, height,
    * n_channels, sample_rate, n_frames, checksum) — the
    * [[Multimodal.decodeOne]] result minus the id/media-type plumbing
    * SQL callers carry themselves. */
  def mediaMeta(payload: Array[Byte]): InternalRow = {
    val d = Multimodal.decodeOne(MediaRecord(0L, payload, ""))
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(d.decoder),
      d.width.map(Int.box).orNull,
      d.height.map(Int.box).orNull,
      d.n_channels.map(Int.box).orNull,
      d.sample_rate.map(Int.box).orNull,
      d.n_frames,
      d.checksum))
  }
}
