package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** From-spec JPEG 2000 (ITU-T T.800 / ISO 15444-1) LOSSLESS decoder for
  * GRIB2 DRS 5.40 payloads — the one ecCodes packing this source
  * previously rejected. No JPEG 2000 library exists in this environment,
  * so this is an independent reading of the public spec, differentially
  * compared against the in-repo python encoder/decoder pair
  * (`tools/make_grib_j2k_fixture.py`) through the committed fixture, the
  * DuckDB oracle (`q_grib_jpeg`), and the seeded fuzz (`GribJ2kFuzzSpec`).
  *
  * Supported subset — exactly what GRIB encoders (g2clib jpcpack, ecCodes
  * via jasper/openjpeg at lossless settings) emit: one tile covering the
  * image, one unsigned component, reversible 5/3 wavelet (Annex F), no
  * quantization (Sqcd style 0), ONE quality layer, LRCP progression, no
  * precinct subdivision, code-block style 0 (single MQ codeword segment
  * per block), no SOP/EPH. Anything else — extra components, tiles,
  * irreversible 9/7, multiple layers, other progressions, coder options —
  * rejects loudly naming the feature; a truncated or corrupt stream fails
  * a named require, never yields silently wrong values (every length and
  * count is untrusted input).
  *
  * Internals per the spec: MQ arithmetic decoder (Annex C software
  * conventions, the 47-state Qe table), EBCOT Tier-1 three-pass bit-plane
  * decoding with the Annex D context tables (zero coding per subband
  * orientation, sign coding with XOR flip, magnitude refinement,
  * run-length + UNIFORM cleanup), tag-tree and packet headers per
  * Annex B (inclusion/zero-bitplane trees, pass-count codewords, LBlock
  * length signalling, 0xFF bit-stuffing), inverse 5/3 lifting with
  * whole-sample symmetric extension, DC level shift restore.
  */
private[sources] object J2kDecoder {

  // ------------------------------------------------------------- MQ coder
  // Table C.2: (Qe, NMPS, NLPS, SWITCH)
  private val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36,
    37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14, 15, 16,
    17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  private val NCtx = 19
  private val CtxRL = 17
  private val CtxUni = 18

  private final class MQDec(data: Array[Byte], from: Int, until: Int) {
    private val state = new Array[Int](NCtx)
    private val mps = new Array[Int](NCtx)
    state(CtxUni) = 46
    state(CtxRL) = 3
    state(0) = 4
    private var bp = from
    private var c: Long = 0L
    private var ct = 0
    private var a = 0

    private def byteAt(i: Int): Int =
      if (i < until) data(i) & 0xFF else 0xFF

    {
      c = byteAt(from).toLong << 16
      bytein()
      c <<= 7
      ct -= 7
      a = 0x8000
    }

    private def bytein(): Unit = {
      if (bp < until && byteAt(bp) == 0xFF) {
        if (byteAt(bp + 1) > 0x8F) {
          c += 0xFF00L
          ct = 8
        } else {
          bp += 1
          c += byteAt(bp).toLong << 9
          ct = 7
        }
      } else {
        bp += 1
        c += byteAt(bp).toLong << 8
        ct = 8
      }
    }

    def decode(cx: Int): Int = {
      val st = state(cx)
      val qe = Qe(st)
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xFFFF) < qe) {
        // LPS exchange
        if (a < qe) {
          d = mps(cx)
          state(cx) = Nmps(st)
        } else {
          d = 1 - mps(cx)
          if (Switch(st) == 1) mps(cx) = 1 - mps(cx)
          state(cx) = Nlps(st)
        }
        a = qe
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000) != 0) return mps(cx)
        // MPS exchange
        if (a < qe) {
          d = 1 - mps(cx)
          if (Switch(st) == 1) mps(cx) = 1 - mps(cx)
          state(cx) = Nlps(st)
        } else {
          d = mps(cx)
          state(cx) = Nmps(st)
        }
      }
      while ({
        if (ct == 0) bytein()
        a <<= 1
        c = (c << 1) & 0xFFFFFFFFL
        ct -= 1
        (a & 0x8000) == 0
      }) ()
      d
    }
  }

  // ---------------------------------------------------------- packet bits
  /** B.10.1 packet-header bit reader: MSB first, a 0 bit stuffed after any
    * 0xFF byte. */
  private final class HdrBits(data: Array[Byte], var pos: Int, limit: Int,
      path: String) {
    private var acc = 0
    private var n = 0
    private var prevFF = false

    def bit(): Int = {
      if (n == 0) {
        require(pos < limit, s"$path: packet header overruns section 7")
        val b = data(pos) & 0xFF
        pos += 1
        if (prevFF) {
          require(b < 0x80, s"$path: missing stuff bit after 0xFF in packet header")
          acc = b
          n = 7
        } else {
          acc = b
          n = 8
        }
        prevFF = b == 0xFF
      }
      n -= 1
      (acc >>> n) & 1
    }

    def bits(k: Int): Int = {
      var v = 0
      var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** End of header: drop the partial byte (and the stuffed 0x00 after a
      * final 0xFF); returns the packet-body offset. */
    def align(): Int = {
      n = 0
      if (prevFF) {
        require(pos < limit && data(pos) == 0,
          s"$path: packet header ends on 0xFF without its stuffed 0x00")
        pos += 1
        prevFF = false
      }
      pos
    }
  }

  // -------------------------------------------------------------- tag tree
  private final class TagTree(w: Int, h: Int) {
    private val levelDims = {
      val b = Seq.newBuilder[(Int, Int)]
      var lw = w
      var lh = h
      b += ((lw, lh))
      while (lw != 1 || lh != 1) {
        lw = (lw + 1) / 2
        lh = (lh + 1) / 2
        b += ((lw, lh))
      }
      b.result()
    }
    private val offs = levelDims.scanLeft(0)((acc, d) => acc + d._1 * d._2)
    private val n = offs.last
    val value = new Array[Int](n)
    private val low = new Array[Int](n)
    private val known = new Array[Boolean](n)

    private def idx(level: Int, x: Int, y: Int): Int =
      offs(level) + y * levelDims(level)._1 + x

    /** True iff value(x, y) < threshold (then exact in `value`). */
    def decode(br: HdrBits, x: Int, y: Int, threshold: Int): Boolean = {
      var lo = 0
      var lv = levelDims.length - 1
      var leaf = 0
      while (lv >= 0) {
        val i = idx(lv, x >> lv, y >> lv)
        if (lo > low(i)) low(i) = lo else lo = low(i)
        while (!known(i) && lo < threshold) {
          if (br.bit() == 1) {
            value(i) = lo
            known(i) = true
          } else lo += 1
        }
        low(i) = lo
        if (known(i)) lo = value(i)
        if (lv == 0) leaf = i
        lv -= 1
      }
      known(leaf) && value(leaf) < threshold
    }

    def leafValue(x: Int, y: Int): Int = value(idx(0, x, y))
  }

  // ------------------------------------------------------------- 5/3 IDWT
  /** Inverse 1D lifting (F.3.8.2 SR procedure shape): s = low half,
    * d = high half, whole-sample symmetric extension. */
  private def inv1d(s: Array[Int], d: Array[Int]): Array[Int] = {
    val nl = s.length
    val nh = d.length
    val n = nl + nh
    if (n == 1) return s.clone()
    def gd(k0: Int): Int = {
      var k = k0
      if (k < 0) k = -k - 1
      if (k > nh - 1) k = 2 * nh - 1 - k
      if (nh == 0) 0 else d(k)
    }
    val x = new Array[Int](n)
    var k = 0
    while (k < nl) {
      x(2 * k) = s(k) - ((gd(k - 1) + gd(k) + 2) >> 2)
      k += 1
    }
    def gx(i0: Int): Int = {
      var i = i0
      if (i < 0) i = -i
      if (i > n - 1) i = 2 * (n - 1) - i
      x(i)
    }
    k = 0
    while (k < nh) {
      x(2 * k + 1) = d(k) + ((gx(2 * k) + gx(2 * k + 2)) >> 1)
      k += 1
    }
    x
  }

  // ----------------------------------------------------- Tier-1 decoding
  // Annex D zero-coding context from (h, v, d) neighbor counts.
  private def zcCtx(h: Int, v: Int, d: Int, orient: Int): Int = {
    // orient: 0 = LL/LH mapping, 1 = HL (transposed), 2 = HH
    if (orient == 2) {
      val hv = h + v
      if (d >= 3) 8
      else if (d == 2) { if (hv >= 1) 7 else 6 }
      else if (d == 1) { if (hv >= 2) 5 else if (hv == 1) 4 else 3 }
      else { if (hv >= 2) 2 else if (hv == 1) 1 else 0 }
    } else {
      val (hh, vv) = if (orient == 1) (v, h) else (h, v)
      if (hh == 2) 8
      else if (hh == 1) { if (vv >= 1) 7 else if (d >= 1) 6 else 5 }
      else if (vv == 2) 4
      else if (vv == 1) 3
      else if (d >= 2) 2
      else if (d == 1) 1
      else 0
    }
  }

  // Table D.3 sign contexts: index by (H+1)*3 + (V+1) -> (ctx, xor)
  private val ScCtx = Array(13, 12, 11, 10, 9, 10, 11, 12, 13)
  private val ScXor = Array(1, 1, 1, 1, 0, 0, 0, 0, 0)

  /** Decode one code-block's coefficients (signed) in place. */
  private def t1Decode(mq: MQDec, w: Int, h: Int, orient: Int,
      numbps: Int, npasses: Int, coefs: Array[Int], path: String): Unit = {
    val n = w * h
    val sig = new Array[Boolean](n)
    val sgn = new Array[Boolean](n)
    val visited = new Array[Boolean](n)
    val refined = new Array[Boolean](n)
    val mag = new Array[Int](n)

    def nb(x: Int, y: Int): (Int, Int, Int) = {
      def s(xx: Int, yy: Int): Int =
        if (xx >= 0 && xx < w && yy >= 0 && yy < h && sig(yy * w + xx)) 1 else 0
      val hh = s(x - 1, y) + s(x + 1, y)
      val vv = s(x, y - 1) + s(x, y + 1)
      val dd = s(x - 1, y - 1) + s(x + 1, y - 1) + s(x - 1, y + 1) + s(x + 1, y + 1)
      (hh, vv, dd)
    }
    def signCtx(x: Int, y: Int): (Int, Int) = {
      def sv(xx: Int, yy: Int): Int =
        if (xx >= 0 && xx < w && yy >= 0 && yy < h && sig(yy * w + xx)) {
          if (sgn(yy * w + xx)) -1 else 1
        } else 0
      val hc = math.max(-1, math.min(1, sv(x - 1, y) + sv(x + 1, y)))
      val vc = math.max(-1, math.min(1, sv(x, y - 1) + sv(x, y + 1)))
      val i = (hc + 1) * 3 + (vc + 1)
      (ScCtx(i), ScXor(i))
    }

    def sigPass(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        val rows = math.min(4, h - y0)
        var x = 0
        while (x < w) {
          var dy = 0
          while (dy < rows) {
            val y = y0 + dy
            val i = y * w + x
            visited(i) = false
            if (!sig(i)) {
              val (hh, vv, dd) = nb(x, y)
              val cx = zcCtx(hh, vv, dd, orient)
              if (cx != 0) {
                visited(i) = true
                if (mq.decode(cx) == 1) {
                  val (sc, xr) = signCtx(x, y)
                  sgn(i) = (mq.decode(sc) ^ xr) == 1
                  sig(i) = true
                  mag(i) |= 1 << p
                }
              }
            }
            dy += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def refPass(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        val rows = math.min(4, h - y0)
        var x = 0
        while (x < w) {
          var dy = 0
          while (dy < rows) {
            val y = y0 + dy
            val i = y * w + x
            if (sig(i) && !visited(i)) {
              val cx =
                if (!refined(i)) {
                  refined(i) = true
                  val (hh, vv, dd) = nb(x, y)
                  if (hh + vv + dd > 0) 15 else 14
                } else 16
              if (mq.decode(cx) == 1) mag(i) |= 1 << p
              visited(i) = true
            }
            dy += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def cleanupPass(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        val rows = math.min(4, h - y0)
        var x = 0
        while (x < w) {
          var start = 0
          if (rows == 4) {
            var allRl = true
            var dy = 0
            while (allRl && dy < 4) {
              val i = (y0 + dy) * w + x
              if (sig(i) || visited(i)) allRl = false
              else {
                val (hh, vv, dd) = nb(x, y0 + dy)
                if (zcCtx(hh, vv, dd, orient) != 0) allRl = false
              }
              dy += 1
            }
            if (allRl) {
              if (mq.decode(CtxRL) == 0) {
                var k = 0
                while (k < 4) { visited((y0 + k) * w + x) = false; k += 1 }
                start = 4
              } else {
                val first = (mq.decode(CtxUni) << 1) | mq.decode(CtxUni)
                val y = y0 + first
                val i = y * w + x
                val (sc, xr) = signCtx(x, y)
                sgn(i) = (mq.decode(sc) ^ xr) == 1
                sig(i) = true
                mag(i) |= 1 << p
                start = first + 1
              }
            }
          }
          var dy = start
          while (dy < rows) {
            val y = y0 + dy
            val i = y * w + x
            if (visited(i)) visited(i) = false
            else if (!sig(i)) {
              val (hh, vv, dd) = nb(x, y)
              val cx = zcCtx(hh, vv, dd, orient)
              if (mq.decode(cx) == 1) {
                val (sc, xr) = signCtx(x, y)
                sgn(i) = (mq.decode(sc) ^ xr) == 1
                sig(i) = true
                mag(i) |= 1 << p
              }
            }
            dy += 1
          }
          x += 1
        }
        y0 += 4
      }
      var i = 0
      while (i < n) { visited(i) = false; i += 1 }
    }

    require(numbps >= 1 && numbps <= 31,
      s"$path: code-block with $numbps magnitude bit planes")
    require(npasses == 3 * numbps - 2,
      s"$path: $npasses coding passes for $numbps planes — partial layers " +
        "are outside the lossless 1-layer subset")
    cleanupPass(numbps - 1)
    var p = numbps - 2
    while (p >= 0) {
      sigPass(p)
      refPass(p)
      cleanupPass(p)
      p -= 1
    }
    var i = 0
    while (i < n) {
      coefs(i) = if (sgn(i)) -mag(i) else mag(i)
      i += 1
    }
  }

  // ------------------------------------------------------------ geometry
  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  /** Subband extents for an origin-0 image: returns (w, h) of band
    * `orient` (0=LL at level `levels`, else HL/LH/HH at `lev`). */
  private def bandDims(W: Int, H: Int, lev: Int, band: String): (Int, Int) = {
    val sc = 1 << lev
    val half = 1 << (lev - 1)
    band match {
      case "LL" => (ceilDiv(W, sc), ceilDiv(H, sc))
      case "HL" => (math.max(0, ceilDiv(W - half, sc)), ceilDiv(H, sc))
      case "LH" => (ceilDiv(W, sc), math.max(0, ceilDiv(H - half, sc)))
      case _ => (math.max(0, ceilDiv(W - half, sc)), math.max(0, ceilDiv(H - half, sc)))
    }
  }

  private def orientOf(band: String): Int =
    band match { case "HL" => 1; case "HH" => 2; case _ => 0 }

  // ------------------------------------------------------------- decoding
  /** Decode a DRS 5.40 section-7 body into the packed integer stream X.
    * `expected` = number of data points (section 5); the image may be
    * laid out (ni, nj) or (expected, 1) — any (w, h) with w·h == expected
    * is accepted, read row-major. `nbits` bounds the sample range. */
  def decode(cs: Array[Byte], expected: Int, nbits: Int, path: String): Array[Int] = {
    require(cs.length >= 4 && (cs(0) & 0xFF) == 0xFF && (cs(1) & 0xFF) == 0x4F,
      s"$path: section 7 does not start with a JPEG 2000 SOC marker")
    val bb = ByteBuffer.wrap(cs).order(ByteOrder.BIG_ENDIAN)
    var pos = 2
    var W = -1
    var H = -1
    var depth = -1
    var levels = -1
    var cbw = -1
    var cbh = -1
    var guard = -1
    var eps: Array[Int] = null
    var bodyAt = -1

    def u16(at: Int): Int = {
      require(at + 2 <= cs.length, s"$path: truncated JPEG 2000 codestream")
      bb.getShort(at) & 0xFFFF
    }
    def u32(at: Int): Long = {
      require(at + 4 <= cs.length, s"$path: truncated JPEG 2000 codestream")
      bb.getInt(at) & 0xFFFFFFFFL
    }

    while (bodyAt < 0) {
      val marker = u16(pos)
      pos += 2
      if (marker == 0xFF93) { // SOD
        bodyAt = pos
      } else {
        val ln = u16(pos)
        require(ln >= 2 && pos + ln <= cs.length,
          s"$path: JPEG 2000 marker segment overruns section 7")
        marker match {
          case 0xFF51 => // SIZ
            val rsiz = u16(pos + 2)
            require(rsiz == 0, s"$path: JPEG 2000 Rsiz profile $rsiz unsupported")
            val xs = u32(pos + 4)
            val ys = u32(pos + 8)
            val xo = u32(pos + 12)
            val yo = u32(pos + 16)
            val xt = u32(pos + 20)
            val yt = u32(pos + 24)
            val xto = u32(pos + 28)
            val yto = u32(pos + 32)
            val nc = u16(pos + 36)
            require(xo == 0 && yo == 0 && xto == 0 && yto == 0,
              s"$path: JPEG 2000 non-zero image/tile offsets unsupported")
            require(xt == xs && yt == ys,
              s"$path: JPEG 2000 multi-tile codestreams unsupported")
            require(nc == 1,
              s"$path: JPEG 2000 with $nc components unsupported (GRIB packs one)")
            require(xs >= 1 && ys >= 1 && xs * ys <= Int.MaxValue &&
              xs * ys == expected.toLong,
              s"$path: JPEG 2000 image ${xs}x$ys does not hold $expected data points")
            W = xs.toInt
            H = ys.toInt
            val ssiz = cs(pos + 38) & 0xFF
            require((ssiz & 0x80) == 0, s"$path: signed JPEG 2000 samples unsupported")
            depth = (ssiz & 0x7F) + 1
            require(depth >= 1 && depth <= 31 && depth >= nbits,
              s"$path: JPEG 2000 depth $depth for $nbits-bit packing")
            require((cs(pos + 39) & 0xFF) == 1 && (cs(pos + 40) & 0xFF) == 1,
              s"$path: JPEG 2000 subsampled components unsupported")
          case 0xFF52 => // COD
            val scod = cs(pos + 2) & 0xFF
            require(scod == 0, s"$path: JPEG 2000 Scod 0x${scod.toHexString} " +
              "unsupported (precincts / SOP / EPH)")
            val prog = cs(pos + 3) & 0xFF
            val layers = u16(pos + 4)
            val mct = cs(pos + 6) & 0xFF
            require(prog == 0, s"$path: JPEG 2000 progression order $prog " +
              "unsupported (LRCP only)")
            require(layers == 1, s"$path: JPEG 2000 with $layers quality layers " +
              "unsupported (lossless GRIB streams carry one)")
            require(mct == 0, s"$path: JPEG 2000 multi-component transform unsupported")
            levels = cs(pos + 7) & 0xFF
            // spec allows up to 32; bound at 30 so 1 << lev stays a
            // positive Int in the band geometry (real GRIB streams use <8)
            require(levels >= 0 && levels <= 30, s"$path: $levels decomposition levels")
            cbw = 1 << ((cs(pos + 8) & 0xFF) + 2)
            cbh = 1 << ((cs(pos + 9) & 0xFF) + 2)
            require(cbw <= 1024 && cbh <= 1024 && cbw * cbh <= 4096,
              s"$path: JPEG 2000 code-block ${cbw}x$cbh out of spec")
            val style = cs(pos + 10) & 0xFF
            require(style == 0, s"$path: JPEG 2000 code-block style " +
              s"0x${style.toHexString} unsupported (bypass/reset/termall/causal)")
            val transform = cs(pos + 11) & 0xFF
            require(transform == 1, s"$path: JPEG 2000 9/7 irreversible wavelet " +
              "unsupported — this decoder covers the LOSSLESS (5/3) subset; " +
              "re-encode with grib_set -r -s packingType=grid_simple")
          case 0xFF5C => // QCD
            val sqcd = cs(pos + 2) & 0xFF
            require((sqcd & 0x1F) == 0, s"$path: JPEG 2000 quantization style " +
              s"${sqcd & 0x1F} unsupported (reversible carries none)")
            guard = sqcd >>> 5
            require(levels >= 0, s"$path: QCD before COD")
            val nbands = 3 * levels + 1
            require(ln == 3 + nbands, s"$path: QCD length $ln for $nbands subbands")
            eps = new Array[Int](nbands)
            var i = 0
            while (i < nbands) {
              eps(i) = (cs(pos + 3 + i) & 0xFF) >>> 3
              i += 1
            }
          case 0xFF90 => // SOT: Lsot, Isot, Psot, TPsot, TNsot
            require(u16(pos + 2) == 0, s"$path: JPEG 2000 multi-tile codestream")
            require((cs(pos + 8) & 0xFF) == 0 && (cs(pos + 9) & 0xFF) == 1,
              s"$path: JPEG 2000 multiple tile-parts unsupported")
          case 0xFF64 => // COM: skip
          case m => throw new IllegalArgumentException(
            s"$path: JPEG 2000 marker 0x${m.toHexString} unsupported")
        }
        pos += ln
      }
    }
    require(W > 0 && depth > 0 && levels >= 0 && eps != null,
      s"$path: JPEG 2000 codestream missing SIZ/COD/QCD")

    // eps index per band: 0 = LL, then per level NL..1: HL, LH, HH
    def epsOf(band: String, lev: Int): Int =
      if (band == "LL") eps(0)
      else {
        val gi = band match { case "HL" => 0; case "LH" => 1; case _ => 2 }
        eps(1 + 3 * (levels - lev) + gi)
      }

    // decode packets resolution by resolution (LRCP, 1 layer, 1 component)
    val bandData = scala.collection.mutable.Map[(String, Int), Array[Array[Int]]]()
    def bandsOf(r: Int): Seq[(String, Int)] =
      if (r == 0) Seq(("LL", levels))
      else {
        val lev = levels - r + 1
        Seq(("HL", lev), ("LH", lev), ("HH", lev))
      }
    pos = bodyAt
    var r = 0
    while (r <= levels) {
      val br = new HdrBits(cs, pos, cs.length, path)
      val contributions =
        scala.collection.mutable.ArrayBuffer[((String, Int), Int, Int, Int, Int, Int)]()
      if (br.bit() == 1) {
        for ((band, lev) <- bandsOf(r)) {
          val (bw, bh) = bandDims(W, H, lev, band)
          bandData((band, lev)) = Array.fill(bh)(new Array[Int](bw))
          if (bw > 0 && bh > 0) {
            val ncx = ceilDiv(bw, cbw)
            val ncy = ceilDiv(bh, cbh)
            val mb = guard + epsOf(band, lev) - 1
            require(mb >= 1 && mb <= 31, s"$path: $mb bit planes for $band$lev")
            val incl = new TagTree(ncx, ncy)
            val zbp = new TagTree(ncx, ncy)
            var by = 0
            while (by < ncy) {
              var bx = 0
              while (bx < ncx) {
                if (incl.decode(br, bx, by, 1)) {
                  var zp = 0
                  while (!zbp.decode(br, bx, by, zp + 1)) zp += 1
                  val numbps = mb - zp
                  require(numbps >= 1, s"$path: included code-block with " +
                    s"$zp zero planes of $mb")
                  val npasses = readPasses(br)
                  var lblock = 3
                  while (br.bit() == 1) lblock += 1
                  val lenBits = lblock + (31 - Integer.numberOfLeadingZeros(npasses))
                  require(lenBits <= 31, s"$path: code-block length field $lenBits bits")
                  val len = br.bits(lenBits)
                  contributions += (((band, lev), bx, by, numbps, npasses, len))
                }
                bx += 1
              }
              by += 1
            }
          }
        }
      } else {
        for ((band, lev) <- bandsOf(r)) {
          val (bw, bh) = bandDims(W, H, lev, band)
          bandData((band, lev)) = Array.fill(bh)(new Array[Int](bw))
        }
      }
      pos = br.align()
      for (((band, lev), bx, by, numbps, npasses, len) <- contributions) {
        // len >= 1: an included code-block (npasses >= 1) always carries at
        // least one codeword byte; a zero-length contribution would make the
        // MQ decoder run entirely on synthetic 0xFF padding and could emit
        // in-range garbage that passes the depth check (J2K has no payload
        // integrity check to catch it)
        require(len >= 1 && pos + len <= cs.length,
          s"$path: code-block contribution of $len bytes overruns section 7 " +
            "(included code-blocks carry at least one codeword byte)")
        val (bw, bh) = bandDims(W, H, lev, band)
        val x0 = bx * cbw
        val y0 = by * cbh
        val x1 = math.min(x0 + cbw, bw)
        val y1 = math.min(y0 + cbh, bh)
        val cw = x1 - x0
        val ch = y1 - y0
        val coefs = new Array[Int](cw * ch)
        val mq = new MQDec(cs, pos, pos + len)
        t1Decode(mq, cw, ch, orientOf(band), numbps, npasses, coefs, path)
        pos += len
        val mat = bandData((band, lev))
        var i = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            mat(y)(x) = coefs(i)
            i += 1
            x += 1
          }
          y += 1
        }
      }
      r += 1
    }
    require(pos + 2 <= cs.length && u16(pos) == 0xFFD9,
      s"$path: JPEG 2000 codestream does not end with EOC after the packets")

    // inverse DWT: columns first, then rows (mirror of the encoder)
    var cur = bandData(("LL", levels))
    var lev = levels
    while (lev >= 1) {
      val hl = bandData(("HL", lev))
      val lh = bandData(("LH", lev))
      val hh = bandData(("HH", lev))
      def colJoin(top: Array[Array[Int]], bot: Array[Array[Int]]): Array[Array[Int]] = {
        val ht = top.length
        val hb = bot.length
        val wv = if (ht > 0) top(0).length else if (hb > 0) bot(0).length else 0
        if (wv == 0) return Array.fill(ht + hb)(new Array[Int](0))
        val out = Array.ofDim[Int](ht + hb, wv)
        var cx = 0
        while (cx < wv) {
          val s = new Array[Int](ht)
          val d = new Array[Int](hb)
          var ry = 0
          while (ry < ht) { s(ry) = top(ry)(cx); ry += 1 }
          ry = 0
          while (ry < hb) { d(ry) = bot(ry)(cx); ry += 1 }
          val col = inv1d(s, d)
          ry = 0
          while (ry < col.length) { out(ry)(cx) = col(ry); ry += 1 }
          cx += 1
        }
        out
      }
      val left = colJoin(cur, lh)
      val right = colJoin(hl, hh)
      val rows = new Array[Array[Int]](left.length)
      var ry = 0
      while (ry < left.length) {
        val d = if (right.length > ry) right(ry) else new Array[Int](0)
        rows(ry) = inv1d(left(ry), d)
        ry += 1
      }
      cur = rows
      lev -= 1
    }
    require(cur.length == H && (H == 0 || cur(0).length == W),
      s"$path: JPEG 2000 reconstruction is ${cur.length} rows, expected $H")
    val half = 1 << (depth - 1)
    val out = new Array[Int](expected)
    var i = 0
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        val v = cur(y)(x) + half
        require(v >= 0 && v < (1L << depth),
          s"$path: JPEG 2000 sample $v outside the $depth-bit range — corrupt stream")
        out(i) = v
        i += 1
        x += 1
      }
      y += 1
    }
    out
  }

  /** B.10.6 pass-count codeword. */
  private def readPasses(br: HdrBits): Int = {
    if (br.bit() == 0) return 1
    if (br.bit() == 0) return 2
    val v = br.bits(2)
    if (v < 3) return 3 + v
    val v2 = br.bits(5)
    if (v2 < 31) return 6 + v2
    37 + br.bits(7)
  }
}
