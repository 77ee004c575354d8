package graft.llm

import graft.SparkSpec

/** Round-trip fuzz for the PNG pixel decoder: random images are encoded
  * in-test (filters applied per the W3C spec, zlib via the JDK Deflater,
  * CRC-32 chunk trailers) and must decode back to the exact pixel bytes.
  * The committed fixtures pin the decoder against the Python generator;
  * this pins the filter reconstruction over the full (filter × size ×
  * channel) lattice, including the 1-pixel edges where a/b/c neighbors
  * vanish. */
class PngRoundTripSpec extends SparkSpec {

  private def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(payload.length)
    d.write(tag.getBytes("US-ASCII"))
    d.write(payload)
    val crc = new java.util.zip.CRC32()
    crc.update(tag.getBytes("US-ASCII"))
    crc.update(payload)
    d.writeInt(crc.getValue.toInt)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode per the spec: row filters applied forward, raw deflate. */
  private def encodePng(w: Int, h: Int, colorType: Int, channels: Int,
      px: Array[Byte], filters: Array[Int]): Array[Byte] = {
    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val ft = filters(y)
      raw(y * (1 + stride)) = ft.toByte
      for (i <- 0 until stride) {
        val x = px(y * stride + i) & 0xff
        val a = if (i >= channels) px(y * stride + i - channels) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= channels) px((y - 1) * stride + i - channels) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + i) = (v & 0xff).toByte
      }
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", deflated))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("random images round-trip through encode → decodePngPixels exactly") {
    val rnd = new scala.util.Random(421)
    val colorTypes = Seq(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)
    for (trial <- 0 until 60) {
      val (colorType, channels) = colorTypes(trial % colorTypes.size)
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(16)
      val px = Array.fill[Byte](w * h * channels)(rnd.nextInt(256).toByte)
      val filters = Array.fill(h)(rnd.nextInt(5))
      val png = encodePng(w, h, colorType, channels, px, filters)
      val got = Multimodal.decodePngPixels(png)
      assert(got.isDefined, s"trial $trial (${w}x$h ct$colorType) failed to decode")
      val (gw, gh, gc, gpx) = got.get
      assert((gw, gh, gc) == ((w, h, channels)), s"trial $trial dims")
      assert(java.util.Arrays.equals(gpx, px),
        s"trial $trial (${w}x$h ct$colorType filters ${filters.mkString(",")}) pixel mismatch")
    }
  }
}
