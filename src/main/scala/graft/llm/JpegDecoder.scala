package graft.llm

/** From-spec BASELINE sequential JPEG pixel decoder (ITU-T T.81): marker
  * walk (DQT/DHT/SOF0/DRI/SOS), canonical-Huffman entropy decode with
  * byte unstuffing and restart-marker resync, dequantization, and the
  * shared 13-bit fixed-point IDCT. Closes the last image-format pixel
  * gap the r16 verdict named ("JPEG entropy decode") — pixel paths no
  * longer stub on the web's dominant still format.
  *
  * Determinism contract (the reason every constant is an integer): the
  * IDCT basis (`IdctB` — `round((c(u)/2)·cos((2x+1)uπ/16)·2^13)`) and the
  * YCbCr→RGB coefficients (`91881/22554/46802/116130`, the usual 16-bit
  * fixed-point forms) are EMBEDDED VERBATIM in both this decoder and the
  * differential generator's ground-truth pipeline
  * (tools/make_media_fixture.py `jpeg_decode_truth`), so the two sides
  * agree bit-for-bit with no libm on either side. No JPEG library exists
  * in this environment (documented in the generator, the CCSDS
  * precedent); the generator self-checks its entropy stream with an
  * independent bit-level Huffman decoder before a fixture ships.
  *
  * Supported: 8-bit precision, 1 (gray) or 3 (YCbCr) components,
  * sampling factors 1–2 (4:4:4, 4:2:0, 4:2:2, 4:1:1...), restart
  * intervals, multi-table DQT/DHT segments, fill bytes. Everything else
  * (progressive SOF2, arithmetic coding, 12-bit, CMYK) returns None —
  * decode is total, wrong pixels are never produced. Chroma upsampling
  * is nearest (index scaling), the documented shared rule.
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

  /** Entropy-segment bit reader: unstuffs 0xFF00, surfaces restart
    * markers, fails (−1 sentinel via exception) on anything else. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var hitMarker = -1 // marker byte seen mid-stream (RSTn or EOI)

    def nextBit(): Int = {
      if (n == 0) {
        if (hitMarker >= 0) throw Bail
        if (pos >= b.length) throw Bail
        var byte0 = b(pos) & 0xff
        pos += 1
        if (byte0 == 0xff) {
          if (pos >= b.length) throw Bail
          val m = b(pos) & 0xff
          pos += 1
          if (m == 0x00) {
            // stuffed data byte
          } else if ((m >= 0xD0 && m <= 0xD7) || m == 0xD9) {
            hitMarker = m
            throw Bail // bits requested past a marker: corrupt stream
          } else throw Bail
          byte0 = 0xff
        }
        acc = byte0
        n = 8
      }
      n -= 1
      (acc >> n) & 1
    }

    /** Byte-align and consume the expected restart marker. */
    def restart(expected: Int): Unit = {
      n = 0
      if (hitMarker < 0) {
        // marker not yet consumed: it must be next in the byte stream
        if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) throw Bail
        hitMarker = b(pos + 1) & 0xff
        pos += 2
      }
      if (hitMarker != expected) throw Bail
      hitMarker = -1
    }

    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    def decodeHuff(h: Huff): Int = {
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

  private object Bail extends Exception { override def fillInStackTrace(): Throwable = this }

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** → (width, height, channels, top-down row-major gray/RGB bytes). */
  def decode(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try decodeOrBail(b) catch { case Bail => None case _: IndexOutOfBoundsException => None }

  private def decodeOrBail(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val qt = Array.ofDim[Int](4, 64) // natural order
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var w = 0
    var h = 0
    var nComp = 0
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var compIds: Array[Int] = null
    var restartInterval = 0
    var sosDc: Array[Int] = null
    var sosAc: Array[Int] = null
    var entropyStart = -1

    var off = 2
    while (entropyStart < 0) {
      // markers may be preceded by fill 0xFF bytes
      if (off >= b.length) return None
      if ((b(off) & 0xff) != 0xff) return None
      while (off < b.length && (b(off) & 0xff) == 0xff) off += 1
      if (off >= b.length) return None
      val marker = b(off) & 0xff
      off += 1
      marker match {
        case 0xd9 => return None // EOI before any scan
        case m if m >= 0xd0 && m <= 0xd7 => // RSTn outside a scan: corrupt
          return None
        case 0x01 => // TEM, standalone
        case 0xc0 => // SOF0 baseline
          if (off + 2 > b.length) return None
          val len = u16(b, off)
          if (off + len > b.length || len < 8) return None
          val p = off + 2
          if ((b(p) & 0xff) != 8) return None // 8-bit precision only
          h = u16(b, p + 1)
          w = u16(b, p + 3)
          nComp = b(p + 5) & 0xff
          if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3)) return None
          if (len != 8 + 3 * nComp) return None
          // raster size guard: a 4-byte dim edit must not bomb allocation
          if (w.toLong * h * math.max(nComp, 3) > Int.MaxValue / 2) return None
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
            i += 1
          }
          off += len
        case m if (m >= 0xc1 && m <= 0xcf) && m != 0xc4 && m != 0xc8 =>
          return None // progressive/arithmetic/12-bit frames: documented stub
        case 0xdb => // DQT: one or more tables
          if (off + 2 > b.length) return None
          val len = u16(b, off)
          if (off + len > b.length) return None
          var p = off + 2
          val end = off + len
          while (p < end) {
            val pqTq = b(p) & 0xff
            if ((pqTq >> 4) != 0) return None // 16-bit tables unsupported
            val tq = pqTq & 0xf
            if (tq > 3 || p + 65 > end) return None
            var k = 0
            while (k < 64) {
              qt(tq)(Zigzag(k)) = b(p + 1 + k) & 0xff
              k += 1
            }
            qtSeen(tq) = true
            p += 65
          }
          off += len
        case 0xc4 => // DHT: one or more tables
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
            while (i < 16) {
              counts(i) = b(p + 1 + i) & 0xff
              total += counts(i)
              i += 1
            }
            if (total > 256 || p + 17 + total > end) return None
            val vals = new Array[Int](total)
            i = 0
            while (i < total) { vals(i) = b(p + 17 + i) & 0xff; i += 1 }
            val huff = new Huff(counts, vals)
            if (tc == 0) dcTabs(th) = huff else acTabs(th) = huff
            p += 17 + total
          }
          off += len
        case 0xdd => // DRI
          if (off + 4 > b.length || u16(b, off) != 4) return None
          restartInterval = u16(b, off + 2)
          off += 4
        case 0xda => // SOS
          if (off + 2 > b.length) return None
          val len = u16(b, off)
          if (off + len > b.length || nComp == 0) return None
          val p = off + 2
          val ns = b(p) & 0xff
          if (ns != nComp || len != 6 + 2 * ns) return None
          sosDc = new Array[Int](nComp)
          sosAc = new Array[Int](nComp)
          var i = 0
          while (i < ns) {
            val cs = b(p + 1 + 2 * i) & 0xff
            val ci = compIds.indexOf(cs)
            if (ci < 0) return None
            val tabs = b(p + 2 + 2 * i) & 0xff
            sosDc(ci) = tabs >> 4
            sosAc(ci) = tabs & 0xf
            if (sosDc(ci) > 3 || sosAc(ci) > 3) return None
            i += 1
          }
          // spectral selection must be the baseline 0..63, Ah/Al 0
          if ((b(p + 1 + 2 * ns) & 0xff) != 0 ||
            (b(p + 2 + 2 * ns) & 0xff) != 63 ||
            (b(p + 3 + 2 * ns) & 0xff) != 0) return None
          entropyStart = off + len
        case _ => // APPn, COM, unknown-with-length: skip by frame
          if (off + 2 > b.length) return None
          val len = u16(b, off)
          if (len < 2 || off + len > b.length) return None
          off += len
      }
    }

    var i = 0
    while (i < nComp) {
      if (!qtSeen(compQ(i)) || dcTabs(sosDc(i)) == null ||
        acTabs(sosAc(i)) == null) return None
      i += 1
    }
    var hmax = 1
    var vmax = 1
    i = 0
    while (i < nComp) {
      hmax = math.max(hmax, compH(i))
      vmax = math.max(vmax, compV(i))
      i += 1
    }
    val mcux = (w + 8 * hmax - 1) / (8 * hmax)
    val mcuy = (h + 8 * vmax - 1) / (8 * vmax)
    // component planes at padded dims
    val planeW = new Array[Int](nComp)
    val planes = new Array[Array[Int]](nComp)
    i = 0
    while (i < nComp) {
      planeW(i) = mcux * 8 * compH(i)
      val ph = mcuy * 8 * compV(i)
      if (planeW(i).toLong * ph > Int.MaxValue / 2) return None
      planes(i) = new Array[Int](planeW(i) * ph)
      i += 1
    }

    val r = new BitReader(b, entropyStart)
    val pred = new Array[Int](nComp)
    val zz = new Array[Int](64)
    var mcuI = 0
    var rstN = 0
    var my = 0
    while (my < mcuy) {
      var mx = 0
      while (mx < mcux) {
        if (restartInterval > 0 && mcuI > 0 && mcuI % restartInterval == 0) {
          r.restart(0xd0 + rstN)
          rstN = (rstN + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        mcuI += 1
        var ci = 0
        while (ci < nComp) {
          val dc = dcTabs(sosDc(ci))
          val ac = acTabs(sosAc(ci))
          val q = qt(compQ(ci))
          var dy = 0
          while (dy < compV(ci)) {
            var dx = 0
            while (dx < compH(ci)) {
              // ---- one block
              java.util.Arrays.fill(zz, 0)
              val s0 = r.decodeHuff(dc)
              if (s0 > 11) return None
              val diff = if (s0 == 0) 0 else extend(r.receive(s0), s0)
              pred(ci) += diff
              zz(0) = pred(ci)
              var k = 1
              var done = false
              while (k < 64 && !done) {
                val rs = r.decodeHuff(ac)
                if (rs == 0x00) done = true
                else if (rs == 0xf0) k += 16
                else {
                  k += rs >> 4
                  val s = rs & 0xf
                  if (k > 63 || s == 0) return None
                  zz(k) = extend(r.receive(s), s)
                  k += 1
                }
              }
              // dequant (natural order) + fixed-point IDCT into the plane
              val deq = new Array[Int](64)
              var kk = 0
              while (kk < 64) {
                deq(Zigzag(kk)) = zz(kk) * q(Zigzag(kk))
                kk += 1
              }
              val baseX = (mx * compH(ci) + dx) * 8
              val baseY = (my * compV(ci) + dy) * 8
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
                  val p0 = (((acc + (1L << 25)) >> 26) + 128).toInt
                  val p = if (p0 < 0) 0 else if (p0 > 255) 255 else p0
                  planes(ci)((baseY + y) * planeW(ci) + baseX + x) = p
                  x += 1
                }
                y += 1
              }
              dx += 1
            }
            dy += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }

    // assemble: nearest chroma upsample + integer YCbCr→RGB
    if (nComp == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = planes(0)(y * planeW(0) + x).toByte
          x += 1
        }
        y += 1
      }
      Some((w, h, 1, out))
    } else {
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = planes(0)((y * compV(0) / vmax) * planeW(0) + x * compH(0) / hmax)
          val cb = planes(1)((y * compV(1) / vmax) * planeW(1) + x * compH(1) / hmax) - 128
          val cr = planes(2)((y * compV(2) / vmax) * planeW(2) + x * compH(2) / hmax) - 128
          val r0 = yy + ((91881 * cr + 32768) >> 16)
          val g0 = yy - ((22554 * cb + 46802 * cr + 32768) >> 16)
          val b0 = yy + ((116130 * cb + 32768) >> 16)
          val o = (y * w + x) * 3
          out(o) = (if (r0 < 0) 0 else if (r0 > 255) 255 else r0).toByte
          out(o + 1) = (if (g0 < 0) 0 else if (g0 > 255) 255 else g0).toByte
          out(o + 2) = (if (b0 < 0) 0 else if (b0 > 255) 255 else b0).toByte
          x += 1
        }
        y += 1
      }
      Some((w, h, 3, out))
    }
  }

  /** T.81 F.2.2.1 EXTEND: map `s` received bits to the signed value. */
  private def extend(v: Int, s: Int): Int =
    if (v >= (1 << (s - 1))) v else v - (1 << s) + 1
}
