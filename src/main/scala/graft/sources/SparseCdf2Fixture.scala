package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream, File, RandomAccessFile}

/** Dev fixture generator: a CDF-2 NetCDF file whose data variables BEGIN
  * past 2^31 — the offset shape a real multi-GB raster archive has, and
  * the one a 32-bit arithmetic slip in [[NetcdfSource]]'s header parse or
  * ranged-read planning would corrupt silently.
  *
  * The file is ~3 GB LOGICAL but sparse (the bytes between the header and
  * the far `begin` offsets are never written — filesystem holes), so it
  * is generated on demand here instead of being committed: git would
  * materialize the holes on every checkout. The committed ORACLE is the
  * parquet mirror from tools/make_netcdf_sparse_fixture.py, which computes
  * the expected flattened rows independently of this writer and of the
  * reader under test; the layout constants there and here are the
  * contract — change both together.
  *
  * Layout: dims lat=100 (descending) × lon=200; `lat`/`lon` f8 coordinate
  * vars right after the header; `discharge` f4 (_FillValue −9999, every
  * 97th cell filled) at begin 2,500,000,000; `uparea` i4 at begin
  * 3,000,000,000. Values follow the small-fixture conventions
  * (tools/make_netcdf_fixture.py): value = idx·scale + offset, row-major. */
object SparseCdf2Fixture {

  /** Bump together with any layout/value constant change (and regenerate
    * the committed mirror): the version in the file name makes a stale
    * /tmp fixture from an older generator regenerate instead of passing
    * the length check and failing the gate with a baffling hash
    * mismatch. */
  private val LayoutVersion = 1

  val Path: String = s"/tmp/graft_fixtures/sparse_cdf2_v$LayoutVersion.nc"
  private val NLat = 100
  private val NLon = 200
  private val DischargeBegin = 2500000000L // > 2^31 = 2,147,483,648
  private val UpareaBegin = 3000000000L
  private val Fill = -9999.0f

  private val NcInt = 4
  private val NcFloat = 5
  private val NcDouble = 6

  /** Write the file if absent (atomic: temp + rename); returns [[Path]].
    * Deterministic, so concurrent/repeated callers converge. */
  def ensure(): String = synchronized {
    val f = new File(Path)
    if (f.length() == UpareaBegin + NLat * NLon * 4L) return Path
    f.getParentFile.mkdirs()
    val tmp = new File(f.getParent, s".${f.getName}.tmp")
    write(tmp)
    if (!tmp.renameTo(f)) {
      tmp.delete()
      require(f.exists(), s"failed to rename $tmp to $f")
    }
    Path
  }

  /** Header bytes with the coordinate vars placed at `latBegin`. The
    * length does not depend on `latBegin` (CDF-2 begins are fixed 8-byte
    * fields), so one probe pass at 0 yields the real offset. */
  private def headerBytes(latBegin: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    def name(s: String): Unit = {
      out.writeInt(s.length); out.writeBytes(s)
      (0 until (4 - s.length % 4) % 4).foreach(_ => out.writeByte(0))
    }
    def varHdr(nm: String, dimIds: Seq[Int], fill: Option[Float],
        ncType: Int, vsize: Int, begin: Long): Unit = {
      name(nm)
      out.writeInt(dimIds.size); dimIds.foreach(out.writeInt)
      fill match {
        case Some(v) =>
          out.writeInt(12); out.writeInt(1) // NC_ATTRIBUTE, one att
          name("_FillValue")
          out.writeInt(ncType); out.writeInt(1); out.writeFloat(v)
        case None => out.writeInt(0); out.writeInt(0)
      }
      out.writeInt(ncType); out.writeInt(vsize)
      out.writeLong(begin) // CDF-2: 8-byte begin
    }
    out.writeBytes("CDF"); out.writeByte(2); out.writeInt(0) // magic v2, numrecs
    out.writeInt(10); out.writeInt(2) // NC_DIMENSION, 2 dims
    name("lat"); out.writeInt(NLat)
    name("lon"); out.writeInt(NLon)
    out.writeInt(0); out.writeInt(0) // no global atts
    out.writeInt(11); out.writeInt(4) // NC_VARIABLE, 4 vars
    varHdr("lat", Seq(0), None, NcDouble, NLat * 8, latBegin)
    varHdr("lon", Seq(1), None, NcDouble, NLon * 8, latBegin + NLat * 8)
    varHdr("discharge", Seq(0, 1), Some(Fill), NcFloat, NLat * NLon * 4, DischargeBegin)
    varHdr("uparea", Seq(0, 1), None, NcInt, NLat * NLon * 4, UpareaBegin)
    out.flush()
    bos.toByteArray
  }

  private def write(target: File): Unit = {
    val probe = headerBytes(0L)
    val hdr = headerBytes(probe.length.toLong)
    require(hdr.length == probe.length, "CDF-2 header length must be fixed")
    val raf = new RandomAccessFile(target, "rw")
    try {
      raf.setLength(0)
      raf.write(hdr)
      // coordinate vars, contiguous after the header
      val coords = java.nio.ByteBuffer.allocate(NLat * 8 + NLon * 8)
      (0 until NLat).foreach(i => coords.putDouble(17.975 - i * 0.05))
      (0 until NLon).foreach(j => coords.putDouble(-17.975 + j * 0.05))
      raf.write(coords.array())
      // data vars at their far begins — the seeks leave filesystem holes
      val dis = java.nio.ByteBuffer.allocate(NLat * NLon * 4)
      // float64 intermediate with float32 constants, narrowed once — the
      // exact numpy promotion the mirror generator uses (idx·f32 + f32 in
      // f64, then .astype(float32)); all-f32 arithmetic would drift bits
      (0 until NLat * NLon).foreach(idx =>
        dis.putFloat(if (idx % 97 == 0) Fill
        else (idx * 0.37f.toDouble + 1.5f.toDouble).toFloat))
      raf.seek(DischargeBegin)
      raf.write(dis.array())
      val ua = java.nio.ByteBuffer.allocate(NLat * NLon * 4)
      (0 until NLat * NLon).foreach(idx => ua.putInt(idx * 1000 + 7))
      raf.seek(UpareaBegin)
      raf.write(ua.array())
    } finally raf.close()
  }
}
