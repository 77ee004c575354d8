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

/** Header-decoded media metadata (real byte parsing — see
  * [[Multimodal.decodeMedia]]). Image rows carry width/height/channels
  * with a null sample_rate; audio rows carry channels/sample_rate/frame
  * count with null dims; payloads with no recognized magic fall back to
  * the documented checksum stub with `decoder = "stub"`. */
final case class DecodedMedia(
    doc_id: Long,
    media_type: String,
    decoder: String,
    n_bytes: Long,
    width: Option[Int],
    height: Option[Int],
    n_channels: Option[Int],
    sample_rate: Option[Int],
    n_frames: Long,
    checksum: Long)

/** Pixel/sample-decoded media features (see [[Multimodal.pixelStats]]):
  * images carry dims/channels with pixel-byte stats over the normalized
  * top-down RGB/gray/RGBA array; audio carries channel/rate with
  * canonical-sample stats; unsupported payloads fall back to raw-byte
  * stats with `decoder = "stub"`. */
final case class MediaPixels(
    doc_id: Long,
    decoder: String,
    width: Option[Int],
    height: Option[Int],
    n_channels: Option[Int],
    sample_rate: Option[Int],
    n_units: Long,
    sum_abs: Long,
    peak: Long, // 32-bit PCM peaks reach 2^31 — beyond Int
    checksum_px: Long)

/** A really-resampled image (see [[Multimodal.resizePixels]]): output
  * dims plus sum/checksum of the nearest-neighbor-resampled pixel
  * array. */
final case class ResizedMedia(
    doc_id: Long,
    width: Int,
    height: Int,
    out_width: Int,
    out_height: Int,
    sum_resized: Long,
    checksum_resized: Long)

/** Perceptual image hash (see [[Multimodal.pHash]]): integer grayscale
  * mean plus aHash/dHash bits as signed longs. */
final case class MediaPHash(
    doc_id: Long,
    width: Int,
    height: Int,
    gray_mean: Int,
    ahash: Long,
    dhash: Long)

/** Energy-envelope audio fingerprint (see
  * [[Multimodal.audioFingerprint]]). */
final case class AudioFingerprint(
    doc_id: Long,
    n_frames: Long,
    sample_rate: Int,
    energy_total: Long,
    afp: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded per-partition.
  *
  * Header decoding is REAL for the container-friendly formats: BMP
  * (BITMAPINFOHEADER, 54-byte fixed header), PNG (IHDR chunk), and
  * RIFF/WAVE PCM (chunk walk to `fmt `/`data`) are parsed byte-for-byte
  * from the public specs in [[decodeMedia]] — no native codec needed for
  * the metadata every media pipeline partitions and filters on. Payloads
  * with no recognized magic fall back to [[fakeDecode]], a deterministic
  * function of the bytes, so the pipeline shape stays total. Pixel/sample
  * DECODING (inflate, resample) would be a JNI/javacv call swapped in at
  * the same seam: the decode runs inside `mapPartitions` precisely so
  * codec state (decoder contexts, thread-local buffers) is initialized
  * once per partition, not per row — the shape that survives 100 TB of
  * media.
  *
  * SQL-expressible metadata (byte length, magic bytes, checksum) also
  * exists as a pure-column projection ([[metadata]]) so the driver's
  * DuckDB oracle can check the binary-column path end-to-end; the real
  * header decode is oracle-checked against a committed spec-written
  * fixture (tools/make_media_fixture.py, q_multimodal_decode).
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

  /** Polynomial payload checksum (byte-wise [[TextHash.polyHash]]). */
  def byteChecksum(payload: Array[Byte]): Long = {
    var checksum = 7L
    var i = 0
    while (i < payload.length) {
      checksum = (checksum * 31 + (payload(i) & 0xff)) % TextHash.Prime
      i += 1
    }
    checksum
  }

  /** Deterministic stand-in for a real decoder: derives plausible
    * dimensions and a checksum from the payload bytes alone. */
  def fakeDecode(r: MediaRecord): MediaFeatures = {
    val checksum = byteChecksum(r.payload)
    MediaFeatures(
      doc_id = r.doc_id,
      media_type = r.media_type,
      n_bytes = r.payload.length.toLong,
      width = (64 + checksum % 512).toInt,
      height = (64 + (checksum / 512) % 512).toInt,
      n_frames = (r.payload.length / 256 + 1),
      checksum = checksum)
  }

  // ------------------------------------------------------ real header decode

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)
  private def i32be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) |
      (b(o + 3) & 0xff)

  /** BMP: `BM` magic, BITMAPINFOHEADER width/height (biHeight < 0 means
    * top-down row order — dimension is its magnitude), channels from bit
    * depth. Returns (width, height, channels). */
  private[llm] def parseBmp(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M')
      Some((i32le(b, 18), math.abs(i32le(b, 22)), math.max(1, u16le(b, 28) / 8)))
    else None

  /** PNG: 8-byte signature then the IHDR chunk (always first, per spec):
    * big-endian width/height, channels from the color type.
    * Returns (width, height, channels). */
  private[llm] def parsePng(b: Array[Byte]): Option[(Int, Int, Int)] = {
    val sig = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ok = b.length >= 26 && sig.indices.forall(i => (b(i) & 0xff) == sig(i)) &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'
    if (!ok) None
    else {
      val channels = (b(25) & 0xff) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 3 // palette: indices DECODE to RGB triples
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return None
      }
      Some((i32be(b, 16), i32be(b, 20), channels))
    }
  }

  /** JPEG: marker walk from SOI to the first frame header (SOF0–SOF15,
    * excluding the DHT/DAC/JPG markers that share the range) — width,
    * height and component count come from the SOF payload. Pixel decode
    * for BASELINE and PROGRESSIVE frames lives in [[JpegDecoder]]
    * (round 17); arithmetic-coded frames stay metadata-only.
    * Returns (width, height, components). */
  private[llm] def parseJpeg(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xFF || (b(1) & 0xff) != 0xD8) return None
    var off = 2
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) != 0xFF) return None // lost marker sync
      var mOff = off + 1
      while (mOff < b.length && (b(mOff) & 0xff) == 0xFF) mOff += 1 // fill bytes
      if (mOff >= b.length) return None
      val marker = b(mOff) & 0xff
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) off = mOff + 1
      else if (marker == 0xD9 || marker == 0xDA) return None // EOI/SOS before any SOF
      else {
        if (mOff + 2 >= b.length) return None
        val len = ((b(mOff + 1) & 0xff) << 8) | (b(mOff + 2) & 0xff)
        if (len < 2 || mOff + 1 + len > b.length) return None
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (len < 8) return None
          val h = ((b(mOff + 4) & 0xff) << 8) | (b(mOff + 5) & 0xff)
          val w = ((b(mOff + 6) & 0xff) << 8) | (b(mOff + 7) & 0xff)
          val nc = b(mOff + 8) & 0xff
          if (w <= 0 || h <= 0 || nc <= 0) return None
          return Some((w, h, nc))
        }
        off = mOff + 1 + len
      }
    }
    None
  }

  /** RIFF/WAVE PCM: walks chunks (chunks are even-padded per RIFF) to the
    * `fmt ` and `data` chunks — no fixed-offset assumption, so files with
    * LIST/INFO chunks before `data` parse correctly.
    * Returns (channels, sampleRate, frameCount = dataBytes / blockAlign). */
  private[llm] def parseWav(b: Array[Byte]): Option[(Int, Int, Long)] = {
    val isRiff = b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    if (!isRiff) return None
    var off = 12
    var channels = 0
    var sampleRate = 0
    var blockAlign = 0
    var dataBytes = -1L
    while (off + 8 <= b.length && (channels == 0 || dataBytes < 0)) {
      val size = i32le(b, off + 4)
      // subtraction form — the addition overflows for sizes near Int.MaxValue
      if (size < 0 || size > b.length - off - 8) return None
      val tag = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (tag == "fmt " && size >= 16) {
        channels = u16le(b, off + 10)
        sampleRate = i32le(b, off + 12)
        blockAlign = u16le(b, off + 20)
      } else if (tag == "data") {
        dataBytes = size.toLong
      }
      off += 8 + size + (size & 1) // RIFF chunks pad to even length
    }
    if (channels > 0 && blockAlign > 0 && dataBytes >= 0)
      Some((channels, sampleRate, dataBytes / blockAlign))
    else None
  }

  /** ISO BMFF (MP4, ISO 14496-12) metadata: walk the top-level boxes to
    * `moov`, read `mvhd` (timescale + movie duration, versions 0 and 1,
    * incl. the 64-bit largesize box form) and each `trak`'s `tkhd`
    * (16.16 fixed-point presentation dims — the first track with nonzero
    * dims supplies width/height; audio-only movies carry none). Returns
    * (dims, trackCount, timescale, duration) with the WAV invariant
    * `duration / timescale = seconds` riding the (sample_rate, n_frames)
    * columns. Malformed box trees (overrunning sizes, missing mvhd)
    * return None — decode stays total, never wrong. */
  private[llm] def parseMp4(
      b: Array[Byte]): Option[(Option[(Int, Int)], Int, Int, Long)] = {
    if (b.length < 16) return None
    def u32(o: Long): Long = (i32be(b, o.toInt).toLong) & 0xFFFFFFFFL
    def u64(o: Long): Long =
      (u32(o) << 32) | u32(o + 4)
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None

    /** (payloadStart, boxEnd, type) of the box at `off`, or None. */
    def box(off: Long, limit: Long): Option[(Long, Long, String)] = {
      if (off + 8 > limit) return None
      var size = u32(off)
      var hdr = 8L
      if (size == 1L) {
        if (off + 16 > limit) return None
        size = u64(off + 8); hdr = 16L
      } else if (size == 0L) size = limit - off
      if (size < hdr || size > limit - off) return None
      Some((off + hdr, off + size, new String(b, off.toInt + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)))
    }

    var timescale = -1
    var duration = -1L
    var tracks = 0
    var dims: Option[(Int, Int)] = None
    var off = 0L
    while (off < b.length) {
      val (p, end, tpe) = box(off, b.length.toLong).getOrElse(return None)
      if (tpe == "moov") {
        var o = p
        while (o < end) {
          val (cp, cend, ct) = box(o, end).getOrElse(return None)
          ct match {
            case "mvhd" if cend - cp >= 20 =>
              val v = b(cp.toInt) & 0xFF
              if (v == 1 && cend - cp >= 32) {
                timescale = u32(cp + 20).toInt
                duration = u64(cp + 24)
              } else if (v == 0) {
                timescale = u32(cp + 12).toInt
                duration = u32(cp + 16)
              }
            case "trak" =>
              tracks += 1
              var t = cp
              while (t < cend) {
                val (tp, tend, tt) = box(t, cend).getOrElse(return None)
                if (tt == "tkhd") {
                  val v = b(tp.toInt) & 0xFF
                  val woff = tp + (if (v == 1) 88 else 76)
                  if (woff + 8 <= tend) {
                    val w = (u32(woff) >> 16).toInt
                    val h = (u32(woff + 4) >> 16).toInt
                    if (dims.isEmpty && w > 0 && h > 0) dims = Some((w, h))
                  }
                }
                t = tend
              }
            case _ => ()
          }
          o = cend
        }
      }
      off = end
    }
    if (timescale > 0 && duration >= 0) Some((dims, tracks, timescale, duration))
    else None
  }

  // ------------------------------------------------- full pixel/sample decode
  //
  // Pure-JVM decoders from the public specs — no native codec: BMP pixel
  // rows are raw BGR with 4-byte padding, PNG inflates with the JDK's
  // zlib (java.util.zip.Inflater) and defilters per the W3C spec, WAV PCM
  // samples are fixed-layout integers. Each returns None for any layout
  // it does not fully support (compressed BMP, arithmetic-coded
  // JPEG), and
  // [[pixelStatsOne]] degrades to raw-byte stats — decode is total,
  // never wrong. PNG coverage is complete for real-world stills: gray/
  // RGB/alpha at depths 8 AND 16 (high-byte reduction), palette depths
  // 1/2/4/8, and Adam7 interlacing (round 17).

  /** 24-bit uncompressed BMP → (w, h, 3, top-down row-major RGB bytes).
    * Bottom-up storage (positive biHeight) is row-reversed; BGR→RGB. */
  private[llm] def decodeBmpPixels(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (!(b.length >= 54 && b(0) == 'B' && b(1) == 'M')) return None
    val dataOff = i32le(b, 10)
    val w = i32le(b, 18)
    val hRaw = i32le(b, 22)
    // Long abs: math.abs(Int.MinValue) is negative
    val hL = math.abs(hRaw.toLong)
    val bits = u16le(b, 28)
    val comp = i32le(b, 30)
    if (bits != 24 || comp != 0 || w <= 0 || hL == 0) return None
    // all size arithmetic in Long: corrupt headers with w ~ 800M overflow
    // the Int forms, wrap negative, and bypass the bounds check below
    val stride = (w.toLong * 3 + 3) & ~3L
    if (dataOff < 54 || dataOff > b.length ||
        stride * hL > b.length - dataOff ||
        w.toLong * hL * 3 > Int.MaxValue) return None
    val h = hL.toInt
    val strideI = stride.toInt // bounded by b.length above
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (hRaw < 0) y else h - 1 - y // normalize to top-down
      val ro = dataOff + srcRow * strideI
      var o = y * w * 3
      var x = 0
      while (x < w) {
        out(o) = b(ro + x * 3 + 2)     // R
        out(o + 1) = b(ro + x * 3 + 1) // G
        out(o + 2) = b(ro + x * 3)     // B
        o += 3
        x += 1
      }
      y += 1
    }
    Some((w, h, 3, out))
  }

  /** PNG → (w, h, channels, row-major 8-bit channel bytes): IDAT chunks
    * concatenated, inflated with the JDK zlib, rows reconstructed through
    * the five standard filters (None/Sub/Up/Average/Paeth), Adam7
    * INTERLACED images de-interlaced pass by pass (each pass is its own
    * independently filtered sub-image per the spec). Gray/RGB/gray+alpha/
    * RGBA at depths 8 AND 16 (16-bit samples reduce to their high byte —
    * the standard 16→8 tone reduction, so downstream stats stay 8-bit);
    * PALETTE images at index depths 1/2/4/8 — packed indices defilter at
    * byte granularity (bpp = 1 per spec) and expand through the PLTE
    * table to RGB. tRNS palette alpha is not applied (decodes as opaque
    * RGB). Anything else → None (stub), never a wrong pixel. */
  private[llm] def decodePngPixels(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    val (w, h, _) = parsePng(b).getOrElse(return None)
    // parsePng guarantees 26 bytes; the interlace byte at 28 needs more —
    // a PNG truncated inside IHDR must stub-fall-back, not crash
    if (b.length < 29) return None
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (interlace != 0 && interlace != 1) return None
    val palette = colorType == 3
    if (!palette && bitDepth != 8 && bitDepth != 16) return None
    if (palette && bitDepth != 1 && bitDepth != 2 && bitDepth != 4 && bitDepth != 8)
      return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    val sb = if (palette) 1 else bitDepth / 8 // bytes per sample
    // corrupt IHDR dims: negative, zero, or raster sizes whose Int
    // arithmetic would overflow (or whose allocation a 4-byte header
    // edit could bomb to gigabytes) all degrade to the stub
    if (w <= 0 || h <= 0 ||
        h.toLong * (1L + w.toLong * math.max(channels * sb, 3)) > Int.MaxValue ||
        (palette && (w.toLong * bitDepth + 7) / 8 > Int.MaxValue)) return None

    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var off = 8
    var sawEnd = false
    while (!sawEnd && off + 12 <= b.length) {
      val len = i32be(b, off)
      // subtraction form: `off + 12 + len` overflows Int for len near
      // Int.MaxValue and would bypass this check
      if (len < 0 || len > b.length - off - 12) return None
      val tag = new String(b, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (tag == "IDAT") idat.write(b, off + 8, len)
      if (tag == "PLTE") plte = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + len)
      if (tag == "IEND") sawEnd = true
      off += 12 + len
    }
    if (palette && (plte == null || plte.length % 3 != 0 || plte.isEmpty)) return None

    // sub-images: the whole image (non-interlaced) or the 7 Adam7 passes
    // (each independently filtered); stride in bytes for a given width
    def strideOf(pw: Int): Int =
      if (palette) ((pw.toLong * bitDepth + 7) / 8).toInt else pw * channels * sb
    val xs = Array(0, 4, 0, 2, 0, 1, 0)
    val ys = Array(0, 0, 4, 0, 2, 0, 1)
    val xt = Array(8, 8, 4, 4, 2, 2, 1)
    val yt = Array(8, 8, 8, 4, 4, 2, 2)
    val passes: Seq[(Int, Int, Int)] = // (passIndex, passW, passH)
      if (interlace == 0) Seq((-1, w, h))
      else (0 until 7).map { p =>
        val pw = if (w > xs(p)) (w - xs(p) + xt(p) - 1) / xt(p) else 0
        val ph = if (h > ys(p)) (h - ys(p) + yt(p) - 1) / yt(p) else 0
        (p, pw, ph)
      }.filter(t => t._2 > 0 && t._3 > 0)
    val rawLen = passes.map(t => t._3.toLong * (1L + strideOf(t._2))).sum
    if (rawLen > Int.MaxValue) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var filled = 0
      while (filled < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, filled, raw.length - filled)
        // any stall — truncated stream (needsInput) or a preset-dictionary
        // demand (needsDictionary, FDICT bit) — must bail, not spin
        if (n == 0) return None
        filled += n
      }
      if (filled < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    // filter reconstruction of one sub-image, in place into `out`
    def defilter(rawOff: Int, rows: Int, stride: Int, bpp: Int,
        out: Array[Byte]): Boolean = {
      var y = 0
      while (y < rows) {
        val ft = raw(rawOff + y * (1 + stride)) & 0xff
        val ro = rawOff + y * (1 + stride) + 1
        val oo = y * stride
        val po = oo - stride
        var i = 0
        while (i < stride) {
          val x = raw(ro + i) & 0xff
          val a = if (i >= bpp) out(oo + i - bpp) & 0xff else 0
          val up = if (y > 0) out(po + i) & 0xff else 0
          val ul = if (y > 0 && i >= bpp) out(po + i - bpp) & 0xff else 0
          val v = ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + up
            case 3 => x + ((a + up) >> 1)
            case 4 =>
              val p = a + up - ul
              val pa = math.abs(p - a)
              val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else ul)
            case _ => return false
          }
          out(oo + i) = (v & 0xff).toByte
          i += 1
        }
        y += 1
      }
      true
    }

    val bpp = if (palette) 1 else channels * sb
    // assembled full image: palette → one index byte per pixel;
    // non-palette → channels·sb bytes per pixel (row-major)
    val assembled =
      if (palette) new Array[Byte](w * h)
      else new Array[Byte](w * h * channels * sb)
    var rawOff = 0
    passes.foreach { case (p, pw, ph) =>
      val stride = strideOf(pw)
      val sub = new Array[Byte](ph * stride)
      if (!defilter(rawOff, ph, stride, bpp, sub)) return None
      rawOff += ph * (1 + stride)
      // scatter the pass pixels into the assembled image (identity map
      // for the non-interlaced single pass)
      var yy = 0
      while (yy < ph) {
        val destY = if (p < 0) yy else ys(p) + yy * yt(p)
        var xx = 0
        while (xx < pw) {
          val destX = if (p < 0) xx else xs(p) + xx * xt(p)
          if (palette) {
            val bitPos = xx.toLong * bitDepth
            val byteI = yy * stride + (bitPos >> 3).toInt
            val shift = 8 - bitDepth - (bitPos & 7).toInt
            val idx = (sub(byteI) >> shift) & ((1 << bitDepth) - 1)
            if (idx * 3 >= plte.length) return None // past the palette: corrupt
            assembled(destY * w + destX) = idx.toByte
          } else {
            System.arraycopy(sub, (yy * pw + xx) * channels * sb,
              assembled, (destY * w + destX) * channels * sb, channels * sb)
          }
          xx += 1
        }
        yy += 1
      }
    }

    if (palette) {
      // expand the assembled indices through the PLTE table
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val idx = assembled(i) & 0xff
        rgb(i * 3) = plte(idx * 3)
        rgb(i * 3 + 1) = plte(idx * 3 + 1)
        rgb(i * 3 + 2) = plte(idx * 3 + 2)
        i += 1
      }
      Some((w, h, 3, rgb))
    } else if (sb == 2) {
      // 16-bit samples (big-endian per spec) reduce to the high byte
      val out = new Array[Byte](w * h * channels)
      var i = 0
      while (i < out.length) {
        out(i) = assembled(i * 2)
        i += 1
      }
      Some((w, h, channels, out))
    } else Some((w, h, channels, assembled))
  }

  /** WAV → (channels, sampleRate, interleaved canonical samples).
    * Formats: PCM (code 1) at 8/16/24/32 bits and IEEE float (code 3) at
    * 32 or 64 bits, both directly and wrapped in WAVE_FORMAT_EXTENSIBLE
    * (0xFFFE — the container 24-bit tooling actually writes; the
    * subformat GUID's tail is validated, unknown subformats → None).
    * Canonical integer samples: 16-bit as stored; 8-bit stored − 128;
    * 24/32-bit PCM sign-extended as stored; float via
    * `Math.round(f·32767)` (floor(x+0.5) — the rule the differential
    * generator mirrors; the product is exact in double for every
    * finite f, so both sides agree even exactly at .5). Anything
    * else → None. */
  private[llm] def decodeWavSamples(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val isRiff = b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    if (!isRiff) return None
    var off = 12
    var fmtCode = 0
    var channels = 0
    var rate = 0
    var bits = 0
    var dataOff = -1
    var dataBytes = -1
    while (off + 8 <= b.length && (channels == 0 || dataOff < 0)) {
      val size = i32le(b, off + 4)
      // subtraction form: `off + 8 + size` overflows Int for sizes near
      // Int.MaxValue and would bypass this check, then wrap off negative
      if (size < 0 || size > b.length - off - 8) return None
      val tag = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (tag == "fmt " && size >= 16) {
        var code = u16le(b, off + 8)
        channels = u16le(b, off + 10)
        rate = i32le(b, off + 12)
        bits = u16le(b, off + 22)
        if (code == 0xFFFE) { // WAVE_FORMAT_EXTENSIBLE: code in the GUID
          if (size < 40) return None
          val g = off + 8 + 24
          // KSDATAFORMAT_SUBTYPE GUID = <u16 code> 00 00 + fixed tail
          val tail = Array(0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
            0x00, 0x38, 0x9B, 0x71)
          if ((b(g + 2) & 0xff) != 0 || (b(g + 3) & 0xff) != 0) return None
          var k = 0
          while (k < 12) {
            if ((b(g + 4 + k) & 0xff) != tail(k)) return None
            k += 1
          }
          code = u16le(b, g)
        }
        fmtCode = code
      } else if (tag == "data") {
        dataOff = off + 8
        dataBytes = size
      }
      off += 8 + size + (size & 1) // RIFF chunks pad to even length; the
      // bound above keeps off + 8 + size <= b.length, so no overflow
    }
    if (channels <= 0 || dataOff < 0) return None
    (fmtCode, bits) match {
      case (1, 16) =>
        val n = dataBytes / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = (u16le(b, dataOff + 2 * i) << 16) >> 16 // sign-extend
          i += 1
        }
        Some((channels, rate, out))
      case (1, 8) =>
        val out = new Array[Int](dataBytes)
        var i = 0
        while (i < dataBytes) {
          out(i) = (b(dataOff + i) & 0xff) - 128
          i += 1
        }
        Some((channels, rate, out))
      case (1, 24) =>
        val n = dataBytes / 3
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val o = dataOff + 3 * i
          val v = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)
          out(i) = (v << 8) >> 8 // sign-extend 24 bits
          i += 1
        }
        Some((channels, rate, out))
      case (1, 32) =>
        val n = dataBytes / 4
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = i32le(b, dataOff + 4 * i)
          i += 1
        }
        Some((channels, rate, out))
      case (3, 32) =>
        val n = dataBytes / 4
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val f = java.lang.Float.intBitsToFloat(i32le(b, dataOff + 4 * i))
          if (f.isNaN || f.isInfinite) return None // corrupt float payload
          val r = Math.round(f * 32767.0)
          if (r > Int.MaxValue || r < Int.MinValue) return None // out-of-range finite
          out(i) = r.toInt
          i += 1
        }
        Some((channels, rate, out))
      case (3, 64) =>
        val n = dataBytes / 8
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val o = dataOff + 8 * i
          val bits = (i32le(b, o) & 0xffffffffL) | (i32le(b, o + 4).toLong << 32)
          val f = java.lang.Double.longBitsToDouble(bits)
          if (f.isNaN || f.isInfinite) return None
          val r = Math.round(f * 32767.0)
          if (r > Int.MaxValue || r < Int.MinValue) return None // out-of-range finite
          out(i) = r.toInt
          i += 1
        }
        Some((channels, rate, out))
      case _ => None
    }
  }

  /** Decoder calls answer corrupt input with None, never an exception —
    * the targeted guards above handle every corruption the specs model,
    * and this boundary backstops the contract ("decode is total") against
    * any residual adversarial byte pattern: a decode failure must cost a
    * stub row, not a Spark task. */
  private def safely[T](f: => Option[T]): Option[T] =
    try f catch { case scala.util.control.NonFatal(_) => None }

  /** Image-pixel dispatch (magic-sniffed, like [[decodeOne]]). */
  private[llm] def decodeImagePixels(b: Array[Byte]): Option[(String, Int, Int, Int, Array[Byte])] =
    safely(decodeBmpPixels(b)).map { case (w, h, c, px) => ("bmp", w, h, c, px) }
      .orElse(safely(decodePngPixels(b)).map { case (w, h, c, px) => ("png", w, h, c, px) })
      .orElse(safely(decodeGifPixels(b)).map { case (w, h, c, px) => ("gif", w, h, c, px) })
      .orElse(safely(JpegDecoder.decode(b)).map { case (w, h, c, px) => ("jpeg", w, h, c, px) })

  // --------------------------------------------------------------- GIF
  /** GIF header walk → (frame1 width, frame1 height, 3, frame count) —
    * the per-frame extent (not the logical screen), matching
    * [[decodeGifPixels]]. Counts every image descriptor so animations
    * surface their frame count like MP4 surfaces duration. */
  private[llm] def parseGif(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u16l(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    var off = 13
    val flags = b(10) & 0xff
    if ((flags & 0x80) != 0) off += 3 * (1 << ((flags & 7) + 1))
    var frames = 0L
    var fw = -1
    var fh = -1
    def skipSubBlocks(): Boolean = {
      while (off < b.length && (b(off) & 0xff) != 0) {
        off += 1 + (b(off) & 0xff)
        if (off > b.length) return false
      }
      if (off >= b.length) return false
      off += 1 // block terminator
      true
    }
    while (off < b.length) {
      (b(off) & 0xff) match {
        case 0x3B =>
          return if (frames > 0) Some((fw, fh, 3, frames)) else None
        case 0x21 =>
          if (off + 2 > b.length) return None
          off += 2
          if (!skipSubBlocks()) return None
        case 0x2C =>
          if (off + 10 > b.length) return None
          val iw = u16l(off + 5)
          val ih = u16l(off + 6 + 1)
          if (iw <= 0 || ih <= 0) return None
          if (frames == 0) { fw = iw; fh = ih }
          frames += 1
          val iflags = b(off + 9) & 0xff
          off += 10
          if ((iflags & 0x80) != 0) off += 3 * (1 << ((iflags & 7) + 1))
          off += 1 // LZW minimum code size
          if (off > b.length) return None
          if (!skipSubBlocks()) return None
        case _ => return None
      }
    }
    None // no trailer: truncated
  }

  /** GIF87a/GIF89a pixel decode from the public CompuServe spec (+ the
    * GIF-variant LZW it defines): FIRST image frame at its own extent —
    * later animation frames ride the frame-sampling surface, and
    * compositing disposal methods is out of scope by design. Global or
    * local palette, interlaced (4-pass) or sequential. The GCE
    * transparency index is intentionally IGNORED for pixel values: the
    * palette color is the deterministic ground truth both differential
    * sides mirror. Total — anything malformed, truncated, or out of
    * bounds returns None (stub fallback), never wrong pixels. */
  private[llm] def decodeGifPixels(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u16l(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val flags = b(10) & 0xff
    var off = 13
    var globalPal: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 3 * (1 << ((flags & 7) + 1))
      if (off + n > b.length) return None
      globalPal = java.util.Arrays.copyOfRange(b, off, off + n)
      off += n
    }
    while (off < b.length) {
      (b(off) & 0xff) match {
        case 0x3B => return None // trailer before any image frame
        case 0x21 => // extension (GCE/comment/app): skip by framing
          if (off + 2 > b.length) return None
          off += 2
          while (off < b.length && (b(off) & 0xff) != 0) {
            off += 1 + (b(off) & 0xff)
            if (off > b.length) return None
          }
          if (off >= b.length) return None
          off += 1
        case 0x2C =>
          if (off + 10 > b.length) return None
          val iw = u16l(off + 5)
          val ih = u16l(off + 7)
          val iflags = b(off + 9) & 0xff
          off += 10
          var pal = globalPal
          if ((iflags & 0x80) != 0) {
            val n = 3 * (1 << ((iflags & 7) + 1))
            if (off + n > b.length) return None
            pal = java.util.Arrays.copyOfRange(b, off, off + n)
            off += n
          }
          if (pal == null || iw <= 0 || ih <= 0 ||
            iw.toLong * ih * 3 > Int.MaxValue || iw.toLong * ih > (64 << 20))
            return None
          if (off >= b.length) return None
          val minCode = b(off) & 0xff
          off += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          var blockLen = -1
          while (blockLen != 0) {
            if (off >= b.length) return None
            blockLen = b(off) & 0xff
            off += 1
            if (blockLen > 0) {
              if (off + blockLen > b.length) return None
              data.write(b, off, blockLen)
              off += blockLen
            }
          }
          val idx = gifLzw(data.toByteArray, minCode, iw * ih).getOrElse(return None)
          val nColors = pal.length / 3
          val interlaced = (iflags & 0x40) != 0
          val rgb = new Array[Byte](iw * ih * 3)
          // interlace passes: row starts/steps per the spec's 4 groups
          val starts = Array(0, 4, 2, 1)
          val steps = Array(8, 8, 4, 2)
          var src = 0
          var pass = 0
          var y = 0
          while (src < idx.length) {
            val row = if (interlaced) {
              var r = starts(pass) + y * steps(pass)
              while (r >= ih && pass < 3) { pass += 1; y = 0; r = starts(pass) }
              if (r >= ih) return None
              r
            } else y
            var x = 0
            while (x < iw) {
              val c = idx(src) & 0xff
              if (c >= nColors) return None
              val o = (row * iw + x) * 3
              rgb(o) = pal(3 * c)
              rgb(o + 1) = pal(3 * c + 1)
              rgb(o + 2) = pal(3 * c + 2)
              src += 1
              x += 1
            }
            y += 1
          }
          return Some((iw, ih, 3, rgb))
        case _ => return None
      }
    }
    None
  }

  /** GIF-variant LZW: LSB-first variable-width codes, clear/end codes,
    * dictionary capped at 4096 with the KwKwK case; succeeds only when it
    * produces EXACTLY `nPix` indices. */
  private def gifLzw(data: Array[Byte], minCode: Int, nPix: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val endCode = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](nPix)
    var outN = 0
    var dictSize = endCode + 1
    var codeSize = minCode + 1
    var acc = 0L
    var accBits = 0
    var pos = 0
    def next(): Int = {
      while (accBits < codeSize) {
        if (pos >= data.length) return -1
        acc |= (data(pos) & 0xffL) << accBits
        accBits += 8
        pos += 1
      }
      val c = (acc & ((1L << codeSize) - 1)).toInt
      acc >>>= codeSize
      accBits -= codeSize
      c
    }
    var prev = -1
    var first = 0
    while (outN < nPix) {
      val code = next()
      if (code < 0) return None
      if (code == clear) {
        dictSize = endCode + 1
        codeSize = minCode + 1
        prev = -1
      } else if (code == endCode) {
        return None // end before all pixels decoded
      } else if (prev < 0) {
        if (code >= clear) return None
        first = code
        out(outN) = code.toByte
        outN += 1
        prev = code
      } else {
        if (code > dictSize || dictSize > 4095 && code == dictSize) return None
        var cur = code
        var sp = 0
        if (code == dictSize) { stack(sp) = first.toByte; sp += 1; cur = prev }
        while (cur > endCode) {
          stack(sp) = suffix(cur)
          sp += 1
          cur = prefix(cur)
          if (sp > 4096) return None
        }
        if (cur >= clear) return None // chain must end at a literal
        first = cur
        stack(sp) = cur.toByte
        sp += 1
        while (sp > 0) {
          sp -= 1
          if (outN >= nPix) return None // over-long entry
          out(outN) = stack(sp)
          outN += 1
        }
        if (dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = first.toByte
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  private def byteSum(a: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i) & 0xff; i += 1 }
    s
  }

  private def byteMax(a: Array[Byte]): Int = {
    var m = 0
    var i = 0
    while (i < a.length) { val v = a(i) & 0xff; if (v > m) m = v; i += 1 }
    m
  }

  /** Canonical-sample checksum: the polynomial fold over `s + 32768`.
    * 24/32-bit samples make the shifted term NEGATIVE near the bottom of
    * their range, where JVM `%` yields a negative remainder and Python's
    * (the differential generator's) never does — normalize to the
    * mathematical (non-negative) residue so the two sides agree on the
    * whole sample domain. */
  private def sampleChecksum(samples: Array[Int]): Long = {
    var c = 7L
    var i = 0
    while (i < samples.length) {
      val r = (c * 31 + (samples(i).toLong + 32768)) % TextHash.Prime
      c = if (r < 0) r + TextHash.Prime else r
      i += 1
    }
    c
  }

  /** Full pixel/sample decode of one payload — REAL bytes out: images
    * report stats over the decoded pixel array, audio over the canonical
    * PCM samples, anything unsupported over the raw payload bytes
    * (`decoder = "stub"`). */
  def pixelStatsOne(r: MediaRecord): MediaPixels =
    decodeImagePixels(r.payload).map { case (dec, w, h, c, px) =>
      MediaPixels(r.doc_id, dec, Some(w), Some(h), Some(c), None,
        w.toLong * h, byteSum(px), byteMax(px), byteChecksum(px))
    }.orElse(safely(decodeWavSamples(r.payload)).map { case (ch, rate, samples) =>
      var sum = 0L
      var peak = 0L
      var i = 0
      while (i < samples.length) {
        // Long abs: a 32-bit PCM sample can be Int.MinValue, where the
        // Int abs is its own negative
        val a = math.abs(samples(i).toLong)
        sum += a
        if (a > peak) peak = a
        i += 1
      }
      MediaPixels(r.doc_id, "wav", None, None, Some(ch), Some(rate),
        samples.length.toLong / ch, sum, peak, sampleChecksum(samples))
    }).getOrElse(
      MediaPixels(r.doc_id, "stub", None, None, None, None,
        r.payload.length.toLong, byteSum(r.payload), byteMax(r.payload),
        byteChecksum(r.payload)))

  /** Partition-wise full pixel/sample decode (same per-partition context
    * shape as [[decodeMedia]]). */
  def pixelStats(records: Dataset[MediaRecord]): Dataset[MediaPixels] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(pixelStatsOne))
  }

  /** REAL nearest-neighbor resample of one decodable image: integer
    * percent scale bounded to `maxDim` (same arithmetic as [[resize]]),
    * output dims clamped to >= 1, source index `(out · src) DIV out`.
    * Returns stats of the actually-resampled pixel array. */
  def resizePixelsOne(r: MediaRecord, maxDim: Int): Option[ResizedMedia] =
    decodeImagePixels(r.payload).map { case (_, w, h, c, px) =>
      val ms = math.max(w, h)
      val pct = if (ms <= maxDim) 100L else maxDim * 100L / ms
      val ow = math.max(1, (w * pct / 100).toInt)
      val oh = math.max(1, (h * pct / 100).toInt)
      val out = new Array[Byte](ow * oh * c)
      var y = 0
      while (y < oh) {
        val sy = math.min(h - 1, y * h / oh)
        var x = 0
        while (x < ow) {
          val sx = math.min(w - 1, x * w / ow)
          var ch = 0
          while (ch < c) {
            out((y * ow + x) * c + ch) = px((sy * w + sx) * c + ch)
            ch += 1
          }
          x += 1
        }
        y += 1
      }
      ResizedMedia(r.doc_id, w, h, ow, oh, byteSum(out), byteChecksum(out))
    }

  /** Partition-wise real resample; non-image payloads drop out (the
    * metadata-level [[resize]] covers the planning-only path). */
  def resizePixels(records: Dataset[MediaRecord], maxDim: Int = 32): Dataset[ResizedMedia] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.flatMap(r => resizePixelsOne(r, maxDim)))
  }

  /** Perceptual hash of one decodable image — the image-side near-dup
    * feature (aHash: each cell of an 8×8 grayscale thumbnail vs its
    * mean; dHash: horizontal gradient signs on a 9×8 grid — Krawetz's
    * average/difference hashes). All arithmetic is INTEGER (floor-mean
    * grayscale, the [[resizePixelsOne]] nearest-neighbor index rule,
    * floor mean-of-64) so the hash is bit-deterministic and mirrorable;
    * a near-dup image pair then differs by small hamming distance —
    * `bit_count(ahash ^ ahash2)` — which rides the same bucket-join
    * machinery as SimHash (L3). Bit (y*8+x); packed as signed longs. */
  def pHashOne(r: MediaRecord): Option[MediaPHash] =
    decodeImagePixels(r.payload).map { case (_, w, h, c, px) =>
      def grayAt(sx: Int, sy: Int): Int = {
        val base = (sy * w + sx) * c
        var s = 0
        var ch = 0
        while (ch < c) { s += px(base + ch) & 0xFF; ch += 1 }
        s / c
      }
      def grid(gw: Int, gh: Int): Array[Array[Int]] =
        Array.tabulate(gh, gw)((y, x) =>
          grayAt(math.min(w - 1, x * w / gw), math.min(h - 1, y * h / gh)))
      val g8 = grid(8, 8)
      var sum = 0
      for (y <- 0 until 8; x <- 0 until 8) sum += g8(y)(x)
      val mean = sum / 64
      var ah = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (g8(y)(x) > mean) ah |= 1L << (y * 8 + x)
      val g9 = grid(9, 8)
      var dh = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (g9(y)(x + 1) > g9(y)(x)) dh |= 1L << (y * 8 + x)
      MediaPHash(r.doc_id, w, h, mean, ah, dh)
    }

  /** Partition-wise perceptual hashing; non-image payloads drop out. */
  def pHash(records: Dataset[MediaRecord]): Dataset[MediaPHash] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.flatMap(pHashOne))
  }

  /** Perceptual image NEAR-DUP pairs over [[pHash]] output — the
    * image-side completion of the text near-dup family: byte-different
    * images of the same picture land within a few bits of each other in
    * aHash/dHash space, so pairing is the SimHash L3 recipe verbatim —
    * sub-band blocking (the aHash's 8 bytes as bands: any pair with
    * aHash hamming ≤ 7 shares at least one band — the standard
    * pigeonhole recall guarantee), capped buckets, in-bucket pair
    * expansion, exact combined aHash+dHash hamming verification. No
    * pair expansion ever touches pixels: blocking runs on 16 bytes per
    * image regardless of image size.
    *
    * Returns (doc_a, doc_b, hamming), doc_a < doc_b, combined hamming ≤
    * `maxHamming`. */
  def pHashPairs(
      hashes: DataFrame,
      maxHamming: Int = 8,
      maxBucket: Int = 256): DataFrame = {
    val banded = hashes.select(
      col("doc_id"), col("ahash"), col("dhash"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("ahash"), 8 * b)
            .bitwiseAND(lit(255L)).as("band_val"))): _*)).as("bv"))
      .select(col("doc_id"), col("ahash"), col("dhash"),
        col("bv.band").as("band"), col("bv.band_val").as("band_val"))
    val buckets = banded
      .groupBy(col("band"), col("band_val"))
      .agg(collect_list(struct(col("doc_id"), col("ahash"), col("dhash"))).as("ids"))
    Dedup.bucketPairs(buckets, maxBucket, (x, y) =>
      struct(
        x.getField("doc_id").as("doc_a"),
        y.getField("doc_id").as("doc_b"),
        (bit_count(x.getField("ahash").bitwiseXOR(y.getField("ahash"))) +
          bit_count(x.getField("dhash").bitwiseXOR(y.getField("dhash"))))
          .cast("int").as("hamming")))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.hamming").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Energy-envelope fingerprint of one PCM payload — the audio-side
    * near-dup feature ([[pHashOne]]'s dHash idea on the time axis, the
    * envelope-delta family Shazam-style fingerprints coarsen): the
    * sample frames split into 65 equal windows by the nearest-neighbor
    * boundary rule, per-window energy = Σ|sample| over ALL channels
    * (integer — channel mixing would only rescale the envelope), bit k
    * of the 64-bit fingerprint = energy rises from window k to k+1.
    * Amplitude-scale-sensitive only at sign boundaries; time-shift
    * tolerance comes from the coarse windows. Bit-deterministic and
    * mirrored by the independent Python implementation. */
  def audioFingerprintOne(r: MediaRecord): Option[AudioFingerprint] =
    safely(decodeWavSamples(r.payload)).map { case (ch, rate, samples) =>
      val nf = samples.length / ch
      val F = 65
      val energies = new Array[Long](F)
      var k = 0
      while (k < F) {
        val s0 = k.toLong * nf / F
        val s1 = (k + 1).toLong * nf / F
        var i = s0
        while (i < s1) {
          var c = 0
          while (c < ch) {
            energies(k) += math.abs(samples((i * ch + c).toInt).toLong)
            c += 1
          }
          i += 1
        }
        k += 1
      }
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (energies(b + 1) > energies(b)) fp |= 1L << b
        b += 1
      }
      AudioFingerprint(r.doc_id, nf.toLong, rate, energies.sum, fp)
    }

  /** Partition-wise audio fingerprinting; non-audio payloads drop out. */
  def audioFingerprint(records: Dataset[MediaRecord]): Dataset[AudioFingerprint] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.flatMap(audioFingerprintOne))
  }

  /** Audio near-dup pairs over [[audioFingerprint]] output — the
    * envelope fingerprint is a single 64-bit signature, so pairing is
    * [[pHashPairs]] with the fingerprint as the blocked hash and an
    * empty second hash: byte-band blocking, capped buckets, exact
    * hamming. Returns (doc_a, doc_b, hamming). */
  def afpPairs(
      fingerprints: DataFrame,
      maxHamming: Int = 8,
      maxBucket: Int = 256): DataFrame =
    pHashPairs(
      fingerprints.select(col("doc_id"), col("afp").as("ahash"),
        lit(0L).as("dhash")),
      maxHamming, maxBucket)

  /** Sniff-and-parse one payload (magic bytes, not the declared
    * media_type, drive dispatch — declared types lie at corpus scale). */
  def decodeOne(r: MediaRecord): DecodedMedia = {
    val checksum = byteChecksum(r.payload)
    val n = r.payload.length.toLong
    safely(parseBmp(r.payload)).map { case (w, h, c) =>
      DecodedMedia(r.doc_id, r.media_type, "bmp", n, Some(w), Some(h), Some(c), None, 1L, checksum)
    }.orElse(safely(parsePng(r.payload)).map { case (w, h, c) =>
      DecodedMedia(r.doc_id, r.media_type, "png", n, Some(w), Some(h), Some(c), None, 1L, checksum)
    }).orElse(safely(parseJpeg(r.payload)).map { case (w, h, c) =>
      DecodedMedia(r.doc_id, r.media_type, "jpeg", n, Some(w), Some(h), Some(c), None, 1L, checksum)
    }).orElse(safely(parseGif(r.payload)).map { case (w, h, c, frames) =>
      // animations surface their frame count, like MP4 surfaces duration
      DecodedMedia(r.doc_id, r.media_type, "gif", n, Some(w), Some(h), Some(c), None, frames, checksum)
    }).orElse(safely(parseWav(r.payload)).map { case (ch, rate, frames) =>
      DecodedMedia(r.doc_id, r.media_type, "wav", n, None, None, Some(ch), Some(rate), frames, checksum)
    }).orElse(safely(parseMp4(r.payload)).map { case (dims, tracks, ts, dur) =>
      // video: n_channels = track count, (sample_rate, n_frames) =
      // (timescale, duration) so n_frames / sample_rate = seconds, the
      // same invariant the WAV rows carry
      DecodedMedia(r.doc_id, r.media_type, "mp4", n, dims.map(_._1), dims.map(_._2),
        Some(tracks), Some(ts), dur, checksum)
    }).getOrElse {
      val f = fakeDecode(r)
      DecodedMedia(r.doc_id, r.media_type, "stub", n, Some(f.width), Some(f.height),
        None, None, f.n_frames.toLong, checksum)
    }
  }

  /** Partition-wise REAL header decode (BMP/PNG/WAV; stub fallback for
    * unrecognized payloads). Same per-partition decoder-context shape as
    * [[decodeFeatures]]. */
  def decodeMedia(records: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(decodeOne))
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
