package graft.llm

/** From-spec JPEG pixel decoder (ITU-T T.81): BASELINE sequential (SOF0)
  * and PROGRESSIVE (SOF2 — spectral selection + successive approximation,
  * the mode web encoders actually emit): marker walk (multi-table
  * DQT/DHT, DRI, multiple SOS), canonical-Huffman entropy decode with
  * byte unstuffing and restart-marker resync, per-component coefficient
  * accumulation across scans (DC first/refine, AC band first with EOB
  * runs, AC refine with correction bits — the G.2 algorithms in their
  * canonical structure), dequantization, and the shared 13-bit
  * fixed-point IDCT.
  *
  * Determinism contract (the reason every constant is an integer): the
  * IDCT basis (`IdctB` — `round((c(u)/2)·cos((2x+1)uπ/16)·2^13)`) and the
  * YCbCr→RGB coefficients (`91881/22554/46802/116130`, the usual 16-bit
  * fixed-point forms) are EMBEDDED VERBATIM in both this decoder and the
  * differential generator's ground-truth pipeline
  * (tools/make_media_fixture.py `jpeg_decode_truth`), so the two sides
  * agree bit-for-bit with no libm on either side. No JPEG library exists
  * in this environment (documented in the generator, the CCSDS
  * precedent); the generator self-checks both its baseline and its
  * progressive entropy streams with independent bit-level decoders
  * before a fixture ships, and a progressive file encoding the full
  * coefficient precision must decode IDENTICALLY to the baseline file
  * of the same image (spec-pinned).
  *
  * Supported: 8-bit precision, plus 12-BIT via SOF1 extended sequential
  * or SOF2 progressive (round 20 — 16-bit DQT entries, DC categories to
  * 15, samples level-shifted by 2048, clamped to 4095 and reduced to
  * their HIGH 8 bits exactly like 16-bit PNG, so every color path stays
  * 8-bit);
  * 1 (gray), 3 (YCbCr or, with APP14 transform 0, direct RGB), or 4
  * (CMYK family — round 19) components, sampling factors 1–2, restart
  * intervals, interleaved and single-component scans. The 4-component
  * case follows the Adobe conventions web corpora actually contain:
  * APP14 transform 0 = CMYK with samples stored INVERTED, transform 2 =
  * YCCK (the inverted CMY channels ride the YCbCr transform, K
  * inverted), no APP14 = plain CMYK; output is 3-channel RGB through the
  * documented quick conversion `R = uC·uK/255` on the inverted-ink
  * values (integer floor division — embedded identically in the
  * generator's `jpeg_cmyk_truth`). Everything else (arithmetic coding —
  * T.81 Table D.3's 113-row state machine cannot be reproduced from
  * memory — hierarchical, lossless, 4-component transform 1) returns
  * None — decode is total, wrong pixels are never produced.
  * Chroma upsampling is nearest (index scaling), the documented shared
  * rule.
  */
private[llm] object JpegDecoder {

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Shared fixed-point IDCT basis (see the determinism contract). */
  private val IdctB: Array[Array[Int]] = Array(
    Array(2896, 2896, 2896, 2896, 2896, 2896, 2896, 2896),
    Array(4017, 3406, 2276, 799, -799, -2276, -3406, -4017),
    Array(3784, 1567, -1567, -3784, -3784, -1567, 1567, 3784),
    Array(3406, -799, -4017, -2276, 2276, 4017, 799, -3406),
    Array(2896, -2896, -2896, 2896, 2896, -2896, -2896, 2896),
    Array(2276, -4017, 799, 3406, -3406, -799, 4017, -2276),
    Array(1567, -3784, 3784, -1567, -1567, 3784, -3784, 1567),
    Array(799, -2276, 3406, -4017, 4017, -3406, 2276, -799))

  /** Canonical Huffman table in mincode/maxcode/valptr form. */
  private final class Huff(counts: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private object Bail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  /** Entropy-segment bit reader: unstuffs 0xFF00, surfaces restart
    * markers, bails on anything else. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var hitMarker = -1
    // When a marker is peeked into hitMarker: offset of an 0xFF immediately
    // preceding the marker byte, so the main walk re-reads a clean 2-byte
    // marker even when T.81 B.1.1.2 fill bytes (extra 0xFFs) preceded it.
    private var markerPos = -1

    def nextBit(): Int = {
      if (n == 0) {
        if (hitMarker >= 0) throw Bail
        if (pos >= b.length) throw Bail
        var byte0 = b(pos) & 0xff
        pos += 1
        if (byte0 == 0xff) {
          if (pos >= b.length) throw Bail
          var m = b(pos) & 0xff
          pos += 1
          while (m == 0xff) { // fill bytes before a marker (B.1.1.2)
            if (pos >= b.length) throw Bail
            m = b(pos) & 0xff
            pos += 1
          }
          if (m == 0x00) {
            // stuffed data byte
          } else if ((m >= 0xD0 && m <= 0xD7) || m == 0xD9) {
            hitMarker = m
            markerPos = pos - 2 // byte before the marker byte is an 0xFF
            throw Bail
          } else throw Bail
          byte0 = 0xff
        }
        acc = byte0
        n = 8
      }
      n -= 1
      (acc >> n) & 1
    }

    def restart(expected: Int): Unit = {
      n = 0
      if (hitMarker < 0) {
        if (pos >= b.length || (b(pos) & 0xff) != 0xff) throw Bail
        pos += 1
        while (pos < b.length && (b(pos) & 0xff) == 0xff) pos += 1 // fill
        if (pos >= b.length) throw Bail
        hitMarker = b(pos) & 0xff
        pos += 1
      }
      if (hitMarker != expected) throw Bail
      hitMarker = -1
      markerPos = -1
    }

    /** Byte offset of the next marker after the scan's entropy bytes. */
    def endOffset(): Int = {
      // drop pad bits; pos already sits on the next byte. If a marker was
      // peeked into hitMarker, back up so the main walk re-reads it.
      if (hitMarker >= 0) markerPos else pos
    }

    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    def decodeHuff(h: Huff): Int = {
      if (h == null) throw Bail
      var code = nextBit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l) && code >= h.minCode(l))
          return h.vals(h.valPtr(l) + code - h.minCode(l))
        code = (code << 1) | nextBit()
        l += 1
      }
      throw Bail
    }
  }

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** T.81 F.2.2.1 EXTEND: map `s` received bits to the signed value. */
  private def extend(v: Int, s: Int): Int =
    if (v >= (1 << (s - 1))) v else v - (1 << s) + 1

  /** → (width, height, channels, top-down row-major gray/RGB bytes). */
  def decode(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try decodeOrBail(b)
    catch { case Bail => None case _: IndexOutOfBoundsException => None }

  private def decodeOrBail(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val qt = Array.ofDim[Int](4, 64) // natural order
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var w = 0
    var h = 0
    var nComp = 0
    var progressive = false
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var compIds: Array[Int] = null
    var restartInterval = 0
    var hmax = 1
    var vmax = 1
    var mcux = 0
    var mcuy = 0
    // per component: padded block dims, ceil (non-interleaved) block dims,
    // coefficient store (zigzag order, 64 per block), DC predictors
    var blkWpad: Array[Int] = null
    var blkHpad: Array[Int] = null
    var blkWceil: Array[Int] = null
    var blkHceil: Array[Int] = null
    var coefs: Array[Array[Int]] = null
    var sawScan = false
    var sawEoi = false
    var adobeTransform = -1 // -1 = no APP14 Adobe marker seen
    var precision = 8 // sample bits: 8, or 12 (SOF1); planes reduce to 8

    var off = 2
    while (!sawEoi) {
      if (off >= b.length) return None
      if ((b(off) & 0xff) != 0xff) return None
      while (off < b.length && (b(off) & 0xff) == 0xff) off += 1
      if (off >= b.length) return None
      val marker = b(off) & 0xff
      off += 1
      marker match {
        case 0xd9 => sawEoi = true
        case m if m >= 0xd0 && m <= 0xd7 => return None // RSTn outside a scan
        case 0x01 => // TEM, standalone
        case 0xc0 | 0xc1 | 0xc2 => // SOF0 baseline / SOF1 extended
          // sequential / SOF2 progressive. 12-bit samples ride SOF1 or
          // SOF2 (T.81 limits BASELINE to 8 bits)
          if (nComp != 0) return None // second frame
          progressive = marker == 0xc2
          if (off + 2 > b.length) return None
          val len = u16(b, off)
          if (off + len > b.length || len < 8) return None
          val p = off + 2
          precision = b(p) & 0xff
          if (precision != 8 && !(precision == 12 && marker != 0xc0)) return None
          h = u16(b, p + 1)
          w = u16(b, p + 3)
          nComp = b(p + 5) & 0xff
          if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3 && nComp != 4)) return None
          if (len != 8 + 3 * nComp) return None
          if (w.toLong * h * math.max(nComp, 3) > Int.MaxValue / 4) return None
          compIds = new Array[Int](nComp)
          compH = new Array[Int](nComp)
          compV = new Array[Int](nComp)
          compQ = new Array[Int](nComp)
          var i = 0
          while (i < nComp) {
            compIds(i) = b(p + 6 + 3 * i) & 0xff
            val hv = b(p + 7 + 3 * i) & 0xff
            compH(i) = hv >> 4
            compV(i) = hv & 0xf
            compQ(i) = b(p + 8 + 3 * i) & 0xff
            if (compH(i) < 1 || compH(i) > 2 || compV(i) < 1 || compV(i) > 2 ||
              compQ(i) > 3) return None
            hmax = math.max(hmax, compH(i))
            vmax = math.max(vmax, compV(i))
            i += 1
          }
          mcux = (w + 8 * hmax - 1) / (8 * hmax)
          mcuy = (h + 8 * vmax - 1) / (8 * vmax)
          blkWpad = new Array[Int](nComp)
          blkHpad = new Array[Int](nComp)
          blkWceil = new Array[Int](nComp)
          blkHceil = new Array[Int](nComp)
          coefs = new Array[Array[Int]](nComp)
          i = 0
          while (i < nComp) {
            blkWpad(i) = mcux * compH(i)
            blkHpad(i) = mcuy * compV(i)
            val pxW = (w * compH(i) + hmax - 1) / hmax
            val pxH = (h * compV(i) + vmax - 1) / vmax
            blkWceil(i) = (pxW + 7) / 8
            blkHceil(i) = (pxH + 7) / 8
            val nBlocks = blkWpad(i).toLong * blkHpad(i)
            if (nBlocks * 64 > Int.MaxValue / 8) return None
            coefs(i) = new Array[Int]((nBlocks * 64).toInt)
            i += 1
          }
          off += len
        case m if (m >= 0xc3 && m <= 0xcf) && m != 0xc4 && m != 0xc8 =>
          // other frame types: lossless, hierarchical, and ARITHMETIC-
          // coded (SOF9-SOF11) — the latter stays an honest reject: the
          // QM-coder's 113-row state-transition table (T.81 Table D.3)
          // cannot be reproduced from memory, and a plausible-but-wrong
          // table would poison the exact-hash discipline (same class as
          // WebP's distance table)
          return None
        case 0xdb =>
          if (off + 2 > b.length) return None
          val len = u16(b, off)
          if (off + len > b.length) return None
          var p = off + 2
          val end = off + len
          while (p < end) {
            val pqTq = b(p) & 0xff
            val pq = pqTq >> 4 // 0 = 8-bit entries, 1 = 16-bit (12-bit frames)
            if (pq > 1) return None
            val tq = pqTq & 0xf
            val entryLen = if (pq == 1) 128 else 64
            if (tq > 3 || p + 1 + entryLen > end) return None
            var k = 0
            while (k < 64) {
              qt(tq)(Zigzag(k)) =
                if (pq == 1) u16(b, p + 1 + 2 * k) else b(p + 1 + k) & 0xff
              k += 1
            }
            qtSeen(tq) = true
            p += 1 + entryLen
          }
          off += len
        case 0xc4 =>
          if (off + 2 > b.length) return None
          val len = u16(b, off)
          if (off + len > b.length) return None
          var p = off + 2
          val end = off + len
          while (p < end) {
            val tcTh = b(p) & 0xff
            val tc = tcTh >> 4
            val th = tcTh & 0xf
            if (tc > 1 || th > 3 || p + 17 > end) return None
            val counts = new Array[Int](16)
            var total = 0
            var i = 0
            while (i < 16) { counts(i) = b(p + 1 + i) & 0xff; total += counts(i); i += 1 }
            if (total > 256 || p + 17 + total > end) return None
            val vals = new Array[Int](total)
            i = 0
            while (i < total) { vals(i) = b(p + 17 + i) & 0xff; i += 1 }
            val huff = new Huff(counts, vals)
            if (tc == 0) dcTabs(th) = huff else acTabs(th) = huff
            p += 17 + total
          }
          off += len
        case 0xdd =>
          if (off + 4 > b.length || u16(b, off) != 4) return None
          restartInterval = u16(b, off + 2)
          off += 4
        case 0xda => // SOS: decode the scan's entropy inline
          if (off + 2 > b.length) return None
          val len = u16(b, off)
          if (off + len > b.length || nComp == 0) return None
          val p = off + 2
          val ns = b(p) & 0xff
          if (ns < 1 || ns > nComp || len != 6 + 2 * ns) return None
          val scanComps = new Array[Int](ns)
          val scanDc = new Array[Huff](ns)
          val scanAc = new Array[Huff](ns)
          var i = 0
          while (i < ns) {
            val cs = b(p + 1 + 2 * i) & 0xff
            val ci = compIds.indexOf(cs)
            if (ci < 0) return None
            scanComps(i) = ci
            val tabs = b(p + 2 + 2 * i) & 0xff
            if ((tabs >> 4) > 3 || (tabs & 0xf) > 3) return None
            scanDc(i) = dcTabs(tabs >> 4)
            scanAc(i) = acTabs(tabs & 0xf)
            i += 1
          }
          val ss = b(p + 1 + 2 * ns) & 0xff
          val se = b(p + 2 + 2 * ns) & 0xff
          val ahAl = b(p + 3 + 2 * ns) & 0xff
          val ah = ahAl >> 4
          val al = ahAl & 0xf
          if (progressive) {
            if (ss > 63 || se > 63 || ss > se || al > 13 || ah > 14) return None
            if (ss == 0 && se != 0) return None // DC and AC never share a scan
            if (ss > 0 && ns != 1) return None  // AC scans are single-component
            if (ah != 0 && ah != al + 1) return None // successive approximation
          } else {
            if (ss != 0 || se != 63 || ah != 0 || al != 0 || ns != nComp) return None
          }
          val r = new BitReader(b, off + len)
          decodeScan(r, scanComps, scanDc, scanAc, ss, se, ah, al,
            progressive, restartInterval, nComp, compH, compV, mcux, mcuy,
            blkWpad, blkWceil, blkHceil, coefs, precision)
          sawScan = true
          off = r.endOffset()
        case 0xdc => return None // DNL unsupported
        case 0xee => // APP14: the Adobe color-transform marker — the
          // CMYK-vs-YCCK (and inverted-storage) signal for 4 components
          if (off + 2 > b.length) return None
          val len = u16(b, off)
          if (len < 2 || off + len > b.length) return None
          if (len >= 14 && (b(off + 2) & 0xff) == 'A' && (b(off + 3) & 0xff) == 'd' &&
            (b(off + 4) & 0xff) == 'o' && (b(off + 5) & 0xff) == 'b' &&
            (b(off + 6) & 0xff) == 'e') {
            adobeTransform = b(off + 13) & 0xff
          }
          off += len
        case _ =>
          if (off + 2 > b.length) return None
          val len = u16(b, off)
          if (len < 2 || off + len > b.length) return None
          off += len
      }
    }
    if (!sawScan) return None
    var i = 0
    while (i < nComp) { if (!qtSeen(compQ(i))) return None; i += 1 }

    // dequant + IDCT + assemble. 12-bit frames level-shift by 2048,
    // clamp to 4095 and reduce each sample to its HIGH 8 bits (the same
    // tone reduction as 16-bit PNG), so every downstream color path
    // stays 8-bit — the convention the generator's truth pipeline shares.
    val levelShift = 1 << (precision - 1)
    val maxSample = (1 << precision) - 1
    val sampleShift = precision - 8
    val planeW = new Array[Int](nComp)
    val planes = new Array[Array[Int]](nComp)
    i = 0
    while (i < nComp) {
      planeW(i) = blkWpad(i) * 8
      planes(i) = new Array[Int](planeW(i) * blkHpad(i) * 8)
      val q = qt(compQ(i))
      val deq = new Array[Int](64)
      var by = 0
      while (by < blkHpad(i)) {
        var bx = 0
        while (bx < blkWpad(i)) {
          val base = (by * blkWpad(i) + bx) * 64
          var k = 0
          while (k < 64) {
            deq(Zigzag(k)) = coefs(i)(base + k) * q(Zigzag(k))
            k += 1
          }
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              var acc = 0L
              var u = 0
              while (u < 8) {
                var v = 0
                while (v < 8) {
                  val c = deq(v * 8 + u)
                  if (c != 0) acc += c.toLong * IdctB(u)(x) * IdctB(v)(y)
                  v += 1
                }
                u += 1
              }
              val p0 = (((acc + (1L << 25)) >> 26) + levelShift).toInt
              val p = if (p0 < 0) 0 else if (p0 > maxSample) maxSample else p0
              planes(i)((by * 8 + y) * planeW(i) + bx * 8 + x) = p >> sampleShift
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      i += 1
    }
    if (nComp == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = planes(0)(y * planeW(0) + x).toByte; x += 1 }
        y += 1
      }
      Some((w, h, 1, out))
    } else if (nComp == 3) {
      // APP14 disambiguates the 3-component color space: transform 1 or
      // no marker = YCbCr (the JFIF default), transform 0 = Adobe RGB
      // (Photoshop "save as RGB JPEG" — channels are R,G,B directly, NO
      // inverse), transform 2 (YCCK) is meaningless for 3 components and
      // anything unknown decodes to None — wrong pixels are never
      // produced.
      if (adobeTransform == 2 || adobeTransform > 2) return None
      val rgbDirect = adobeTransform == 0
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val c0 = planes(0)((y * compV(0) / vmax) * planeW(0) + x * compH(0) / hmax)
          val c1 = planes(1)((y * compV(1) / vmax) * planeW(1) + x * compH(1) / hmax)
          val c2 = planes(2)((y * compV(2) / vmax) * planeW(2) + x * compH(2) / hmax)
          val o = (y * w + x) * 3
          if (rgbDirect) {
            out(o) = c0.toByte
            out(o + 1) = c1.toByte
            out(o + 2) = c2.toByte
          } else {
            val cb = c1 - 128
            val cr = c2 - 128
            val r0 = c0 + ((91881 * cr + 32768) >> 16)
            val g0 = c0 - ((22554 * cb + 46802 * cr + 32768) >> 16)
            val b0 = c0 + ((116130 * cb + 32768) >> 16)
            out(o) = (if (r0 < 0) 0 else if (r0 > 255) 255 else r0).toByte
            out(o + 1) = (if (g0 < 0) 0 else if (g0 > 255) 255 else g0).toByte
            out(o + 2) = (if (b0 < 0) 0 else if (b0 > 255) 255 else b0).toByte
          }
          x += 1
        }
        y += 1
      }
      Some((w, h, 3, out))
    } else {
      // 4-component CMYK family (the Photoshop shapes in web corpora).
      // Resolve the four channels into inverted-ink values u ∈ [0,255]:
      //  - transform 2 (YCCK): the fixed-point YCbCr inverse on channels
      //    0-2 yields them directly (they were forward-transformed from
      //    the inverted CMY); K is stored inverted;
      //  - transform 0 (Adobe CMYK): all four channels stored inverted;
      //  - no Adobe marker: plain CMYK, invert here;
      //  - transform 1 is meaningless for 4 components → None (total).
      // Then the quick conversion R = uC·uK/255 (G, B alike) — identical
      // integer math in the generator's jpeg_cmyk_truth.
      if (adobeTransform == 1 || adobeTransform > 2) return None
      val ycck = adobeTransform == 2
      val bare = adobeTransform < 0
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val c0 = planes(0)((y * compV(0) / vmax) * planeW(0) + x * compH(0) / hmax)
          val c1 = planes(1)((y * compV(1) / vmax) * planeW(1) + x * compH(1) / hmax)
          val c2 = planes(2)((y * compV(2) / vmax) * planeW(2) + x * compH(2) / hmax)
          val c3 = planes(3)((y * compV(3) / vmax) * planeW(3) + x * compH(3) / hmax)
          var uc = 0
          var um = 0
          var uy = 0
          var uk = c3
          if (ycck) {
            val cb = c1 - 128
            val cr = c2 - 128
            uc = c0 + ((91881 * cr + 32768) >> 16)
            um = c0 - ((22554 * cb + 46802 * cr + 32768) >> 16)
            uy = c0 + ((116130 * cb + 32768) >> 16)
            if (uc < 0) uc = 0 else if (uc > 255) uc = 255
            if (um < 0) um = 0 else if (um > 255) um = 255
            if (uy < 0) uy = 0 else if (uy > 255) uy = 255
          } else if (bare) {
            uc = 255 - c0; um = 255 - c1; uy = 255 - c2; uk = 255 - c3
          } else {
            uc = c0; um = c1; uy = c2
          }
          val o = (y * w + x) * 3
          out(o) = (uc * uk / 255).toByte
          out(o + 1) = (um * uk / 255).toByte
          out(o + 2) = (uy * uk / 255).toByte
          x += 1
        }
        y += 1
      }
      Some((w, h, 3, out))
    }
  }

  // ------------------------------------------------------------- one scan
  // Coefficients live in ZIGZAG order, 64 per block, blocks row-major at
  // the PADDED dims; single-component scans cover the ceil dims subset.
  private def decodeScan(
      r: BitReader,
      scanComps: Array[Int], scanDc: Array[Huff], scanAc: Array[Huff],
      ss: Int, se: Int, ah: Int, al: Int,
      progressive: Boolean, restartInterval: Int,
      nComp: Int, compH: Array[Int], compV: Array[Int],
      mcux: Int, mcuy: Int,
      blkWpad: Array[Int], blkWceil: Array[Int], blkHceil: Array[Int],
      coefs: Array[Array[Int]], precision: Int): Unit = {
    // DC magnitude categories cap at 11 for 8-bit samples, 15 for 12-bit
    val dcMax = if (precision == 12) 15 else 11
    val ns = scanComps.length
    val pred = new Array[Int](ns)
    var eobrun = 0
    var mcuI = 0
    var rstN = 0

    def blockBase(ci: Int, bx: Int, by: Int): Int = (by * blkWpad(ci) + bx) * 64

    def doRestart(): Unit = {
      r.restart(0xd0 + rstN)
      rstN = (rstN + 1) % 8
      java.util.Arrays.fill(pred, 0)
      eobrun = 0
    }

    // ---- per-block decoders
    def baselineBlock(si: Int, base: Int): Unit = {
      val ci = scanComps(si)
      val c = coefs(ci)
      val s0 = r.decodeHuff(scanDc(si))
      if (s0 > dcMax) throw Bail
      val diff = if (s0 == 0) 0 else extend(r.receive(s0), s0)
      pred(si) += diff
      c(base) = pred(si)
      var k = 1
      var done = false
      while (k < 64 && !done) {
        val rs = r.decodeHuff(scanAc(si))
        if (rs == 0x00) done = true
        else if (rs == 0xf0) k += 16
        else {
          k += rs >> 4
          val s = rs & 0xf
          if (k > 63 || s == 0) throw Bail
          c(base + k) = extend(r.receive(s), s)
          k += 1
        }
      }
    }

    def dcFirstBlock(si: Int, base: Int): Unit = {
      val s0 = r.decodeHuff(scanDc(si))
      if (s0 > dcMax) throw Bail
      val diff = if (s0 == 0) 0 else extend(r.receive(s0), s0)
      pred(si) += diff
      coefs(scanComps(si))(base) = pred(si) << al
    }

    def dcRefineBlock(si: Int, base: Int): Unit =
      if (r.nextBit() != 0) coefs(scanComps(si))(base) |= 1 << al

    def acFirstBlock(si: Int, base: Int): Unit = {
      val c = coefs(scanComps(si))
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = r.decodeHuff(scanAc(si))
        val rr = rs >> 4
        val s = rs & 0xf
        if (s == 0) {
          if (rr == 15) { k += 16 }
          else {
            eobrun = (1 << rr) - 1 + (if (rr > 0) r.receive(rr) else 0)
            return
          }
        } else {
          k += rr
          if (k > se) throw Bail
          c(base + k) = extend(r.receive(s), s) << al
          k += 1
        }
      }
    }

    def acRefineBlock(si: Int, base: Int): Unit = {
      val c = coefs(scanComps(si))
      val p1 = 1 << al
      val m1 = -1 << al
      var k = ss
      if (eobrun == 0) {
        var break0 = false
        while (k <= se && !break0) {
          val rs = r.decodeHuff(scanAc(si))
          var rr = rs >> 4
          val s = rs & 0xf
          var sval = 0
          if (s == 0) {
            if (rr != 15) {
              // EOB run INCLUDES this block: fall through to the handler
              eobrun = (1 << rr) + (if (rr > 0) r.receive(rr) else 0)
              break0 = true
            }
            // rr == 15: ZRL — skip 16 zero-history positions below
          } else {
            if (s != 1) throw Bail
            sval = if (r.nextBit() != 0) p1 else m1
          }
          if (!break0) {
            var advancing = true
            while (advancing) {
              if (c(base + k) != 0) {
                if (r.nextBit() != 0 && (math.abs(c(base + k)) & p1) == 0)
                  c(base + k) += (if (c(base + k) > 0) p1 else m1)
              } else {
                rr -= 1
                if (rr < 0) advancing = false
              }
              if (advancing) {
                k += 1
                if (k > se) advancing = false
              }
            }
            if (sval != 0 && k <= se) c(base + k) = sval
            k += 1
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          if (c(base + k) != 0) {
            if (r.nextBit() != 0 && (math.abs(c(base + k)) & p1) == 0)
              c(base + k) += (if (c(base + k) > 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
    }

    def oneBlock(si: Int, base: Int): Unit =
      if (!progressive) baselineBlock(si, base)
      else if (ss == 0 && ah == 0) dcFirstBlock(si, base)
      else if (ss == 0) dcRefineBlock(si, base)
      else if (ah == 0) acFirstBlock(si, base)
      else acRefineBlock(si, base)

    if (ns == 1) {
      // single-component scan = NON-interleaved per T.81: ceil-dims
      // blocks in raster order (equals the padded grid when the
      // component's sampling matches the frame maximum)
      val ci = scanComps(0)
      var by = 0
      while (by < blkHceil(ci)) {
        var bx = 0
        while (bx < blkWceil(ci)) {
          if (restartInterval > 0 && mcuI > 0 && mcuI % restartInterval == 0)
            doRestart()
          mcuI += 1
          oneBlock(0, blockBase(ci, bx, by))
          bx += 1
        }
        by += 1
      }
    } else {
      // interleaved MCU order over the scan's components
      var my = 0
      while (my < mcuy) {
        var mx = 0
        while (mx < mcux) {
          if (restartInterval > 0 && mcuI > 0 && mcuI % restartInterval == 0)
            doRestart()
          mcuI += 1
          var si = 0
          while (si < ns) {
            val ci = scanComps(si)
            var dy = 0
            while (dy < compV(ci)) {
              var dx = 0
              while (dx < compH(ci)) {
                oneBlock(si, blockBase(ci, mx * compH(ci) + dx, my * compV(ci) + dy))
                dx += 1
              }
              dy += 1
            }
            si += 1
          }
          mx += 1
        }
        my += 1
      }
    }
  }
}
