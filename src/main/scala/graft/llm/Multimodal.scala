package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A media payload as it would arrive from an object store: opaque bytes
  * plus typed metadata. */
final case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)

/** Decoded-media features. Width/height/frame fields are what a real
  * decoder would emit; here they come from [[Multimodal.fakeDecode]]. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    checksum: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded per-partition.
  *
  * The decode itself is STUBBED — this container has no image/audio
  * codecs — with [[fakeDecode]], a deterministic function of the bytes, so
  * every piece of Spark-side plumbing (binary schema, partition-wise batch
  * decode via `mapPartitions`, feature schema, frame sampling) is real and
  * testable. A production deployment swaps `fakeDecode` for a JNI/javacv
  * call without touching the dataflow: the decode runs inside
  * `mapPartitions` precisely so codec state (decoder contexts, thread-local
  * buffers) is initialized once per partition, not per row — the shape that
  * survives 100 TB of media.
  *
  * SQL-expressible metadata (byte length, magic bytes, checksum) also
  * exists as a pure-column projection ([[metadata]]) so the driver's
  * DuckDB oracle can check the binary-column path end-to-end.
  */
object Multimodal {

  /** Wrap a text table as binary payloads (the testdata has no real media;
    * UTF-8 bytes stand in for the opaque payload). */
  def payloadsFromText(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      when(pmod(col(idCol), lit(3)) === 0, "image/png")
        .when(pmod(col(idCol), lit(3)) === 1, "image/jpeg")
        .otherwise("video/mp4").as("media_type"))

  /** Deterministic stand-in for a real decoder: derives plausible
    * dimensions and a checksum from the payload bytes alone. */
  def fakeDecode(r: MediaRecord): MediaFeatures = {
    var checksum = 7L
    var i = 0
    while (i < r.payload.length) {
      checksum = (checksum * 31 + (r.payload(i) & 0xff)) % TextHash.Prime
      i += 1
    }
    MediaFeatures(
      doc_id = r.doc_id,
      media_type = r.media_type,
      n_bytes = r.payload.length.toLong,
      width = (64 + checksum % 512).toInt,
      height = (64 + (checksum / 512) % 512).toInt,
      n_frames = (r.payload.length / 256 + 1),
      checksum = checksum)
  }

  /** Partition-wise decode: one decoder "context" per partition. */
  def decodeFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // real impl: open codec context here, close via CompletionIterator
      it.map(fakeDecode)
    }
  }

  /** Resized-media features: [[decodeFeatures]] followed by a bounded-box
    * resize of the decoded dimensions (aspect-preserving integer scale to
    * fit `maxDim`, the thumbnailing math every vision-data pipeline runs
    * before feature extraction). The scale itself is pure integer
    * arithmetic on the decoded dims — the real byte-level resample is the
    * codec stub's concern; the partitioning, schema, and dataflow are the
    * production shape. */
  def resize(records: Dataset[MediaRecord], maxDim: Int = 128): DataFrame =
    decodeFeatures(records)
      .select(col("doc_id"), col("media_type"), col("width"), col("height"))
      .withColumn("max_side", greatest(col("width"), col("height")))
      // integer percent scale: DIV keeps the math engine-exact (the
      // decoded dims are themselves integer functions of the checksum,
      // so the whole resize plan is oracle-checkable)
      .withColumn("scale_pct",
        when(col("max_side") <= maxDim, lit(100L))
          .otherwise(expr(s"CAST(${maxDim * 100} AS BIGINT) DIV max_side")))
      .select(
        col("doc_id"), col("media_type"),
        col("width"), col("height"),
        expr("CAST(width * scale_pct AS BIGINT) DIV 100").cast("int").as("out_width"),
        expr("CAST(height * scale_pct AS BIGINT) DIV 100").cast("int").as("out_height"))

  /** Frame sampling: every `stride`-th 256-byte window of the payload as
    * its own binary "frame" (a real video path samples decoded frames the
    * same way — explode over a sequence of offsets, slice per element).
    * Returns (doc_id, frame_idx, frame binary). */
  def sampleFrames(payloads: DataFrame, stride: Int = 4, frameBytes: Int = 256): DataFrame =
    payloads
      .select(
        col("doc_id"),
        explode(sequence(lit(0), expr(s"(octet_length(payload) - 1) DIV ${frameBytes * stride}")))
          .as("frame_idx"),
        col("payload"))
      .select(
        col("doc_id"),
        col("frame_idx"),
        expr(s"substring(payload, frame_idx * ${frameBytes * stride} + 1, $frameBytes)")
          .as("frame"))

  /** Pure-column metadata over the binary payload — the SQL-expressible
    * subset of [[decodeFeatures]] (same checksum arithmetic: for UTF-8
    * payloads the byte-wise fold of [[fakeDecode]] equals the char-wise
    * [[TextHash.polyHash]] of the decoded string), oracle-checked in
    * DuckDB. */
  def metadata(payloads: DataFrame): DataFrame =
    payloads.select(
      col("doc_id"),
      col("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      upper(substring(hex(col("payload")), 1, 8)).as("magic_hex"),
      graft.functions.HashFunctions.polyHash(decode(col("payload"), "UTF-8")).as("checksum"))
}
