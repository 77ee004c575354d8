package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream, FileOutputStream}

/** Test-scope writers for the two raster wire formats, parameterized enough
  * to fuzz the readers: arbitrary simple-packing parameters and bitmaps for
  * GRIB2, arbitrary dimension/type layouts for NetCDF classic. Independent
  * re-implementations of the public specs (see also the python fixture
  * generators under tools/ — three implementations total keep any one's
  * misreading from self-certifying). */
object GribTestWriter {

  private def s16(v: Int): Int = if (v < 0) 0x8000 | -v else v
  private def s32(v: Int): Int = if (v < 0) 0x80000000 | -v else v

  def packBits(values: Seq[Long], nbits: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var acc = 0L
    var n = 0
    values.foreach { v =>
      acc = (acc << nbits) | v
      n += nbits
      while (n >= 8) { n -= 8; out.write(((acc >> n) & 0xFF).toInt) }
    }
    if (n > 0) out.write(((acc << (8 - n)) & 0xFF).toInt)
    out.toByteArray
  }

  /** One-message GRIB2 file. `xs` are the packed values for the PRESENT
    * cells (row-major); `bitmap` marks presence per cell (None = all). */
  def write(file: String, ni: Int, nj: Int,
      latFirstMicro: Int, lonFirstMicro: Int, incMicro: Int,
      scanMode: Int, timeUnit: Int, forecastTime: Int, member: Option[Int],
      r: Float, e: Int, d: Int, nbits: Int, xs: Seq[Long],
      bitmap: Option[Seq[Boolean]] = None, edition: Int = 2,
      drsTemplate: Int = 0): String = {
    val npts = ni * nj
    def sec(num: Int)(fill: DataOutputStream => Unit): Array[Byte] = {
      val bos = new ByteArrayOutputStream(); val o = new DataOutputStream(bos)
      fill(o); o.flush()
      val body = bos.toByteArray
      val out = new ByteArrayOutputStream(); val h = new DataOutputStream(out)
      h.writeInt(body.length + 5); h.writeByte(num); h.write(body); h.flush()
      out.toByteArray
    }
    val s1 = sec(1) { o =>
      o.writeShort(98); o.writeShort(0); o.writeByte(2); o.writeByte(1); o.writeByte(1)
      o.writeShort(2023); Seq(10, 1, 0, 0, 0).foreach(o.writeByte)
      o.writeByte(0); o.writeByte(1)
    }
    val s3 = sec(3) { o =>
      o.writeByte(0); o.writeInt(npts); o.writeByte(0); o.writeByte(0)
      o.writeShort(0)
      o.writeByte(6); o.writeByte(0); o.writeInt(0)
      o.writeByte(0); o.writeInt(0); o.writeByte(0); o.writeInt(0)
      o.writeInt(ni); o.writeInt(nj); o.writeInt(0); o.writeInt(0)
      o.writeInt(s32(latFirstMicro)); o.writeInt(s32(lonFirstMicro))
      o.writeByte(0x30)
      val latLast = if ((scanMode & 0x40) != 0) latFirstMicro + (nj - 1) * incMicro
                    else latFirstMicro - (nj - 1) * incMicro
      o.writeInt(s32(latLast)); o.writeInt(s32(lonFirstMicro + (ni - 1) * incMicro))
      o.writeInt(incMicro); o.writeInt(incMicro)
      o.writeByte(scanMode)
    }
    val s4 = sec(4) { o =>
      o.writeShort(0); o.writeShort(if (member.isDefined) 1 else 0)
      o.writeByte(0); o.writeByte(197); o.writeByte(2); o.writeByte(255); o.writeByte(255)
      o.writeShort(0); o.writeByte(0)
      o.writeByte(timeUnit); o.writeInt(forecastTime)
      o.writeByte(1); o.writeByte(0); o.writeInt(0)
      o.writeByte(255); o.writeByte(0); o.writeInt(0)
      member.foreach { m => o.writeByte(if (m > 0) 3 else 0); o.writeByte(m); o.writeByte(4) }
    }
    val s5 = sec(5) { o =>
      o.writeInt(xs.size); o.writeShort(drsTemplate)
      o.writeFloat(r); o.writeShort(s16(e)); o.writeShort(s16(d))
      o.writeByte(nbits); o.writeByte(0)
    }
    val s6 = bitmap match {
      case None => sec(6)(_.writeByte(255))
      case Some(mask) => sec(6) { o =>
        o.writeByte(0)
        o.write(packBits(mask.map(b => if (b) 1L else 0L), 1))
      }
    }
    val s7 = sec(7)(_.write(packBits(xs, nbits)))
    val body = s1 ++ s3 ++ s4 ++ s5 ++ s6 ++ s7
    val out = new DataOutputStream(new FileOutputStream(file))
    try {
      out.writeBytes("GRIB"); out.writeShort(0); out.writeByte(1); out.writeByte(edition)
      out.writeLong(16L + body.length + 4)
      out.write(body); out.writeBytes("7777")
    } finally out.close()
    file
  }
}

object CdfTestWriter {

  final case class V(name: String, dimIds: Seq[Int], ncType: Int, data: Seq[Double],
      fill: Option[Double] = None)

  private val sizes = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 4, 6 -> 8)

  private def pad(out: DataOutputStream, n: Int): Unit =
    (0 until (4 - n % 4) % 4).foreach(_ => out.writeByte(0))
  private def name(out: DataOutputStream, s: String): Unit = {
    out.writeInt(s.length); out.writeBytes(s); pad(out, s.length)
  }
  private def writeVal(out: DataOutputStream, t: Int, x: Double): Unit = t match {
    case 1 => out.writeByte(x.toInt)
    case 3 => out.writeShort(x.toInt)
    case 4 => out.writeInt(x.toInt)
    case 5 => out.writeFloat(x.toFloat)
    case 6 => out.writeDouble(x)
  }

  /** Header + data, CDF-1 or CDF-2. A var whose FIRST dim has length 0 is
    * a RECORD variable: its `data` holds numRecs records row-major, and on
    * disk the record vars interleave per record (slabs padded to 4 unless
    * there is exactly one record variable — the spec's special case).
    * Returns `file`. */
  def write(file: String, version: Int, dims: Seq[(String, Int)], vars: Seq[V],
      numRecs: Int = 0): String = {
    def isRec(v: V): Boolean = v.dimIds.headOption.exists(dims(_)._2 == 0)
    val (recVars, fixedVars) = vars.partition(isRec)
    // one record's slab in bytes (record vars) / the whole var (fixed)
    def slabBytes(v: V): Int =
      if (isRec(v)) v.dimIds.tail.map(dims(_)._2).product * sizes(v.ncType)
      else v.data.size * sizes(v.ncType)
    def slabPadded(v: V): Int = { val s = slabBytes(v); s + (4 - s % 4) % 4 }
    val recStep: Map[String, Int] = // on-disk stride contribution per record var
      if (recVars.size == 1) Map(recVars.head.name -> slabBytes(recVars.head))
      else recVars.map(v => v.name -> slabPadded(v)).toMap

    def headerBytes(begins: Map[String, Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeBytes("CDF"); out.writeByte(version); out.writeInt(numRecs)
      if (dims.isEmpty) { out.writeInt(0); out.writeInt(0) }
      else { out.writeInt(10); out.writeInt(dims.size)
        dims.foreach { case (n, len) => name(out, n); out.writeInt(len) } }
      out.writeInt(0); out.writeInt(0) // no global atts
      out.writeInt(11); out.writeInt(vars.size)
      vars.foreach { v =>
        name(out, v.name); out.writeInt(v.dimIds.size); v.dimIds.foreach(out.writeInt)
        v.fill match {
          case Some(f) =>
            out.writeInt(12); out.writeInt(1); name(out, "_FillValue")
            out.writeInt(v.ncType); out.writeInt(1)
            writeVal(out, v.ncType, f); pad(out, sizes(v.ncType))
          case None => out.writeInt(0); out.writeInt(0)
        }
        out.writeInt(v.ncType)
        out.writeInt(slabPadded(v)) // vsize (informational; parser recomputes)
        if (version == 1) out.writeInt(begins(v.name).toInt)
        else out.writeLong(begins(v.name))
      }
      out.flush(); bos.toByteArray
    }
    val hdrLen = headerBytes(vars.map(_.name -> 0L).toMap).length.toLong
    // fixed vars contiguous after the header, then the record section
    var off = hdrLen
    val fixedBegins = fixedVars.map { v =>
      val b = off; off += slabPadded(v); v.name -> b
    }.toMap
    var recOff = off
    val recBegins = recVars.map { v =>
      val b = recOff; recOff += recStep(v.name); v.name -> b
    }.toMap
    val out = new DataOutputStream(new FileOutputStream(file))
    try {
      out.write(headerBytes(fixedBegins ++ recBegins))
      fixedVars.foreach { v =>
        v.data.foreach(writeVal(out, v.ncType, _))
        pad(out, v.data.size * sizes(v.ncType))
      }
      (0 until numRecs).foreach { r =>
        recVars.foreach { v =>
          val perRec = slabBytes(v) / sizes(v.ncType)
          v.data.slice(r * perRec, (r + 1) * perRec).foreach(writeVal(out, v.ncType, _))
          if (recVars.size > 1) pad(out, slabBytes(v))
        }
      }
    } finally out.close()
    file
  }
}
