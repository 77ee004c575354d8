package graft.llm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("payloadsFromText produces binary payloads with typed metadata") {
    val d = Multimodal.payloadsFromText(docs(0L -> "he", 1L -> "llo", 2L -> "xyz"), "doc_id", "text")
    val rows = d.collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Array[Byte]]("payload"), r.getAs[String]("media_type"))).toMap
    assert(rows(0L)._1.sameElements("he".getBytes("UTF-8")))
    assert(rows(0L)._2 == "image/png" && rows(1L)._2 == "image/jpeg" && rows(2L)._2 == "video/mp4")
  }

  test("decodeFeatures (mapPartitions stub) is deterministic and schema-typed") {
    val recs = Seq(
      MediaRecord(1L, "hello world".getBytes("UTF-8"), "image/png"),
      MediaRecord(2L, Array.fill[Byte](1000)(42), "video/mp4")).toDS()
    val feats = Multimodal.decodeFeatures(recs).collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 11)
    assert(feats(2L).n_frames == 1000 / 256 + 1)
    assert(feats(1L).width >= 64 && feats(1L).width < 576)
    // checksum equals the char-wise polyHash for ASCII payloads
    val expected = "hello world".foldLeft(7L)((a, c) => (a * 31 + c) % TextHash.Prime)
    assert(feats(1L).checksum == expected)
  }

  test("metadata (SQL-expressible path) agrees with the mapPartitions decode") {
    val d = Multimodal.payloadsFromText(docs(5L -> "some payload text"), "doc_id", "text")
    val meta = Multimodal.metadata(d).head()
    val viaRecord = Multimodal.fakeDecode(
      MediaRecord(5L, "some payload text".getBytes("UTF-8"), "video/mp4"))
    assert(meta.getAs[Long]("n_bytes") == viaRecord.n_bytes)
    assert(meta.getAs[Long]("checksum") == viaRecord.checksum)
    assert(meta.getAs[String]("magic_hex") == "736F6D65") // 'some'
  }

  test("decodeMedia parses every committed fixture to the spec-written expectation") {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File("data/media").getAbsolutePath
    val recs = spark.read.format("binaryFile").load(s"$dir/media_*")
      .select(
        regexp_extract(col("path"), "media_(\\d+)\\.", 1).cast("long").as("doc_id"),
        col("content").as("payload"),
        lit("x").as("media_type"))
      .as[MediaRecord]
    val got = Multimodal.decodeMedia(recs).collect().map(d => d.doc_id -> d).toMap
    val want = spark.read.parquet(s"$dir/decode_expected.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.keySet == want.keySet)
    for ((id, w) <- want) {
      val g = got(id)
      assert(g.decoder == w.getAs[String]("decoder"), s"decoder for $id")
      assert(g.n_bytes == w.getAs[Long]("n_bytes"), s"n_bytes for $id")
      assert(g.width == Option(w.getAs[Integer]("width")).map(_.intValue), s"width for $id")
      assert(g.height == Option(w.getAs[Integer]("height")).map(_.intValue), s"height for $id")
      assert(g.n_channels == Option(w.getAs[Integer]("n_channels")).map(_.intValue), s"channels for $id")
      assert(g.sample_rate == Option(w.getAs[Integer]("sample_rate")).map(_.intValue), s"rate for $id")
      assert(g.n_frames == w.getAs[Long]("n_frames"), s"n_frames for $id")
      assert(g.checksum == w.getAs[Long]("checksum"), s"checksum for $id")
    }
  }

  test("pixelStats decodes every committed fixture to the generator's pixel ground truth") {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File("data/media").getAbsolutePath
    val recs = spark.read.format("binaryFile").load(s"$dir/media_*")
      .select(
        regexp_extract(col("path"), "media_(\\d+)\\.", 1).cast("long").as("doc_id"),
        col("content").as("payload"),
        lit("x").as("media_type"))
      .as[MediaRecord]
    val got = Multimodal.pixelStats(recs).collect().map(d => d.doc_id -> d).toMap
    val want = spark.read.parquet(s"$dir/pixel_expected.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.keySet == want.keySet)
    for ((id, w) <- want) {
      val g = got(id)
      assert(g.decoder == w.getAs[String]("decoder"), s"decoder for $id")
      assert(g.width == Option(w.getAs[Integer]("width")).map(_.intValue), s"width for $id")
      assert(g.height == Option(w.getAs[Integer]("height")).map(_.intValue), s"height for $id")
      assert(g.n_channels == Option(w.getAs[Integer]("n_channels")).map(_.intValue), s"channels for $id")
      assert(g.sample_rate == Option(w.getAs[Integer]("sample_rate")).map(_.intValue), s"rate for $id")
      assert(g.n_units == w.getAs[Long]("n_units"), s"n_units for $id")
      assert(g.sum_abs == w.getAs[Long]("sum_abs"), s"sum_abs for $id")
      assert(g.peak == w.getAs[Int]("peak"), s"peak for $id")
      assert(g.checksum_px == w.getAs[Long]("checksum_px"), s"checksum_px for $id")
    }
    // the filtered PNGs (12, 13) are the Sub/Up/Average/Paeth proof: their
    // ground truth is the UNfiltered pixel pattern, so a defilter bug
    // cannot hash-match
    assert(got(12L).decoder == "png" && got(13L).decoder == "png")
  }

  test("pHash matches the generator's mirror; duplicates collide, structure separates") {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File("data/media").getAbsolutePath
    val recs = spark.read.format("binaryFile").load(s"$dir/media_*")
      .select(
        regexp_extract(col("path"), "media_(\\d+)\\.", 1).cast("long").as("doc_id"),
        col("content").as("payload"),
        lit("x").as("media_type"))
      .as[MediaRecord]
    val got = Multimodal.pHash(recs).collect().map(d => d.doc_id -> d).toMap
    val want = spark.read.parquet(s"$dir/phash_expected.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.keySet == want.keySet)
    for ((id, w) <- want) {
      val g = got(id)
      assert(g.width == w.getAs[Int]("width") && g.height == w.getAs[Int]("height"), s"dims for $id")
      assert(g.gray_mean == w.getAs[Int]("gray_mean"), s"gray_mean for $id")
      assert(g.ahash == w.getAs[Long]("ahash"), s"ahash for $id")
      assert(g.dhash == w.getAs[Long]("dhash"), s"dhash for $id")
    }
    // behavioral sanity on synthetic BMPs: an exact duplicate hashes
    // identically; a flat image has no above-mean cell and no gradient
    def bmp(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val rowBytes = (w * 3 + 3) / 4 * 4
      val b = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
        .putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(rowBytes * h).putInt(0).putInt(0).putInt(0).putInt(0)
      for (y <- h - 1 to 0 by -1) {
        for (x <- 0 until w) { val v = f(x, y); b.put(v.toByte).put(v.toByte).put(v.toByte) }
        b.position(b.position() + (rowBytes - w * 3))
      }
      b.array()
    }
    val flat = Multimodal.pHashOne(MediaRecord(1L, bmp(16, 16, (_, _) => 77), "x")).get
    assert(flat.ahash == 0L && flat.dhash == 0L && flat.gray_mean == 77)
    val grad = bmp(16, 16, (x, _) => x * 16)
    val a = Multimodal.pHashOne(MediaRecord(2L, grad, "x")).get
    val b2 = Multimodal.pHashOne(MediaRecord(3L, grad.clone(), "x")).get
    assert(a.ahash == b2.ahash && a.dhash == b2.dhash)
    assert(a.dhash == -1L, "a strict left-to-right gradient sets all 64 dHash bits")
    assert(java.lang.Long.bitCount(a.ahash ^ flat.ahash) > 16,
      "structurally different images must be far in hamming space")
  }

  test("MP4 box walk: dims/timescale/duration; malformed trees reject to stub") {
    val good = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_021.mp4"))
    val p = Multimodal.parseMp4(good).get
    assert(p == ((Some((320, 240)), 2, 1000, 5400L)))
    val v1 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_022.mp4"))
    assert(Multimodal.parseMp4(v1).get == ((Some((1920, 1080)), 1, 90000, 630123L)))
    // box size overrunning the file: loud None, not a wrong row
    val bad = good.clone()
    val moovAt = {
      var o = 0
      var found = -1
      while (found < 0 && o + 8 <= bad.length) {
        if (new String(bad, o + 4, 4, "US-ASCII") == "moov") found = o
        else o += java.nio.ByteBuffer.wrap(bad, o, 4).getInt
      }
      found
    }
    java.nio.ByteBuffer.wrap(bad, moovAt, 4).putInt(Int.MaxValue)
    assert(Multimodal.parseMp4(bad).isEmpty)
    // not BMFF at all
    assert(Multimodal.parseMp4("RIFFxxxxWAVE".getBytes).isEmpty)
    // the stub fallback takes over in decodeOne for the malformed tree
    assert(Multimodal.decodeOne(MediaRecord(1L, bad, "video/mp4")).decoder == "stub")
  }

  test("audioFingerprint matches the generator's mirror; silence is flat") {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File("data/media").getAbsolutePath
    val recs = spark.read.format("binaryFile").load(s"$dir/media_*")
      .select(
        regexp_extract(col("path"), "media_(\\d+)\\.", 1).cast("long").as("doc_id"),
        col("content").as("payload"),
        lit("x").as("media_type"))
      .as[MediaRecord]
    val got = Multimodal.audioFingerprint(recs).collect().map(d => d.doc_id -> d).toMap
    val want = spark.read.parquet(s"$dir/afp_expected.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    for ((id, w) <- want) {
      val g = got(id)
      assert(g.n_frames == w.getAs[Long]("n_frames"), s"n_frames for $id")
      assert(g.sample_rate == w.getAs[Int]("sample_rate"), s"rate for $id")
      assert(g.energy_total == w.getAs[Long]("energy_total"), s"energy for $id")
      assert(g.afp == w.getAs[Long]("afp"), s"afp for $id")
    }
    // silence: every window energy 0 → no rising deltas
    def silentWav(frames: Int): Array[Byte] = {
      val data = new Array[Byte](frames * 2)
      val b = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
      b.put("data".getBytes).putInt(data.length).put(data)
      b.array()
    }
    val s0 = Multimodal.audioFingerprintOne(MediaRecord(99L, silentWav(400), "x")).get
    assert(s0.afp == 0L && s0.energy_total == 0L && s0.n_frames == 400L)
  }

  test("resizePixels resamples every decodable image to the generator's resize ground truth") {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File("data/media").getAbsolutePath
    val recs = spark.read.format("binaryFile").load(s"$dir/media_*")
      .select(
        regexp_extract(col("path"), "media_(\\d+)\\.", 1).cast("long").as("doc_id"),
        col("content").as("payload"),
        lit("x").as("media_type"))
      .as[MediaRecord]
    val got = Multimodal.resizePixels(recs).collect().map(d => d.doc_id -> d).toMap
    val want = spark.read.parquet(s"$dir/resize_expected.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.keySet == want.keySet) // images only: WAV/blob drop out
    for ((id, w) <- want) {
      val g = got(id)
      assert((g.width, g.height) ==
        ((w.getAs[Int]("width"), w.getAs[Int]("height"))), s"dims for $id")
      assert((g.out_width, g.out_height) ==
        ((w.getAs[Int]("out_width"), w.getAs[Int]("out_height"))), s"out dims for $id")
      assert(g.sum_resized == w.getAs[Long]("sum_resized"), s"sum for $id")
      assert(g.checksum_resized == w.getAs[Long]("checksum_resized"), s"checksum for $id")
    }
    // the 640x2 strip must clamp its scaled height to 1, not 0
    assert(got(7L).out_height == 1 && got(7L).out_width == 32)
  }

  test("pixel decoders degrade to stub stats on unsupported or corrupt payloads") {
    // palette PNG (color type 3) would need a PLTE lookup -> stub
    val png4 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_004.png"))
    val palette = png4.clone()
    palette(25) = 3 // rewrite the IHDR color type (CRC is not checked)
    assert(Multimodal.pixelStatsOne(MediaRecord(1L, palette, "x")).decoder == "stub")
    // truncated IDAT (inflate cannot fill the raster) -> stub
    val truncated = png4.take(png4.length - 30)
    assert(Multimodal.pixelStatsOne(MediaRecord(2L, truncated, "x")).decoder == "stub")
    // non-media payload -> raw-byte stats
    val blob = MediaRecord(3L, Array[Byte](1, 2, 3), "x")
    val stats = Multimodal.pixelStatsOne(blob)
    assert(stats.decoder == "stub" && stats.n_units == 3 && stats.sum_abs == 6 && stats.peak == 3)
  }

  test("decode is total: truncations and byte flips of every fixture never throw") {
    val dir = java.nio.file.Paths.get("data/media")
    val files = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.contains("media_")).sorted
    val rnd = new scala.util.Random(1234)
    for (f <- files) {
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
      // truncations at awkward places (mid-header, mid-chunk, mid-IDAT)
      for (cut <- Seq(0, 1, 8, 20, 26, 28, 40, 54, bytes.length / 2, bytes.length - 1)
           if cut >= 0 && cut <= bytes.length) {
        val t = bytes.take(cut)
        Multimodal.pixelStatsOne(MediaRecord(1L, t, "x"))
        Multimodal.decodeOne(MediaRecord(1L, t, "x"))
        Multimodal.resizePixelsOne(MediaRecord(1L, t, "x"), 32)
      }
      // random byte flips (headers and bodies): any result is fine, a
      // throw or hang is not
      for (_ <- 0 until 40) {
        val m = bytes.clone()
        val i = rnd.nextInt(m.length)
        m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
        Multimodal.pixelStatsOne(MediaRecord(2L, m, "x"))
        Multimodal.decodeOne(MediaRecord(2L, m, "x"))
      }
    }
    // targeted adversarial headers from the hardening review:
    // FDICT zlib header in IDAT (would spin the inflate loop forever)
    val png = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_004.png"))
    val fdict = png.clone()
    // first IDAT payload byte: signature(8) + IHDR(25) + len/tag(8) = 41
    fdict(41) = 0x78.toByte; fdict(42) = 0xbb.toByte
    assert(Multimodal.pixelStatsOne(MediaRecord(3L, fdict, "x")).decoder == "stub")
    // negative IHDR height
    val negH = png.clone(); negH(20) = 0x80.toByte
    assert(Multimodal.pixelStatsOne(MediaRecord(4L, negH, "x")).decoder == "stub")
    // huge chunk length (Int overflow in the walk)
    val hugeChunk = png.clone(); hugeChunk(33) = 0x7f.toByte
    assert(Multimodal.pixelStatsOne(MediaRecord(5L, hugeChunk, "x")).decoder == "stub")
    // BMP with an overflowing width / Int.MinValue height
    val bmp = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_000.bmp"))
    val hugeW = bmp.clone(); hugeW(21) = 0x30.toByte
    assert(Multimodal.pixelStatsOne(MediaRecord(6L, hugeW, "x")).decoder == "stub")
    val minH = bmp.clone()
    minH(22) = 0; minH(23) = 0; minH(24) = 0; minH(25) = 0x80.toByte
    assert(Multimodal.pixelStatsOne(MediaRecord(7L, minH, "x")).decoder == "stub")
    // WAV with a chunk size near Int.MaxValue
    val wav = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_008.wav"))
    val hugeSize = wav.clone(); hugeSize(19) = 0x7f.toByte
    assert(Multimodal.pixelStatsOne(MediaRecord(8L, hugeSize, "x")).decoder == "stub")
    Multimodal.decodeOne(MediaRecord(8L, hugeSize, "x")) // header path too
  }

  test("header parsers reject truncated and corrupt payloads (stub fallback)") {
    val png = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_004.png"))
    assert(Multimodal.parsePng(png).contains((16, 12, 3)))
    assert(Multimodal.parsePng(png.take(20)).isEmpty)        // truncated before IHDR body
    assert(Multimodal.parseBmp("BMonly".getBytes).isEmpty)   // too short for the info header
    val wav = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_010.wav"))   // LIST chunk before data
    assert(Multimodal.parseWav(wav).contains((2, 16000, 160L)))
    // data-chunk size pointing past EOF must not crash or mis-decode
    val bad = wav.clone()
    bad(wav.length - 4) = 0x7f.toByte // corrupt a trailing byte of data (parse unaffected)
    assert(Multimodal.parseWav(bad).contains((2, 16000, 160L)))
    val truncated = wav.take(50)
    assert(Multimodal.parseWav(truncated).isEmpty)
    assert(Multimodal.decodeOne(MediaRecord(9L, "not media at all".getBytes, "x")).decoder == "stub")
  }

  test("JPEG marker walk: dimensions from SOF; malformed streams reject") {
    val good = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_019.jpg"))
    assert(Multimodal.parseJpeg(good).contains((320, 200, 3)))
    // progressive (SOF2) and a tall 1-component frame
    val prog = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_020.jpg"))
    assert(Multimodal.parseJpeg(prog).contains((17, 4096, 1)))
    // pixel decode must STUB (no entropy decode), never misread
    assert(Multimodal.decodeImagePixels(good).isEmpty)
    // truncated before the SOF marker
    assert(Multimodal.parseJpeg(good.take(20)).isEmpty)
    // SOS reached before any SOF (frame header missing)
    val noSof = good.clone()
    noSof(good.indexOfSlice(Seq(0xFF.toByte, 0xC0.toByte)) + 1) = 0xFE.toByte // SOF0 -> COM
    assert(Multimodal.parseJpeg(noSof).isEmpty)
    // not a JPEG at all
    assert(Multimodal.parseJpeg("GIF89a whatever".getBytes).isEmpty)
  }

  test("APP14 transform on THREE components: 0 = pass-through RGB, 2 rejects") {
    // splice an Adobe APP14 marker right after SOI of a known-good
    // 3-component baseline JPEG (media_026: 35x21, 4:2:0, restarts)
    val base = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_026.jpg"))
    def withApp14(transform: Int): Array[Byte] = {
      val seg = Array[Byte](0xFF.toByte, 0xEE.toByte, 0, 14,
        'A', 'd', 'o', 'b', 'e', 0, 100, 0, 0, 0, 0, transform.toByte)
      base.take(2) ++ seg ++ base.drop(2)
    }
    val ycbcr = Multimodal.decodeImagePixels(base)
    assert(ycbcr.nonEmpty)
    // transform 1 IS YCbCr: identical decode to the unmarked stream
    assert(Multimodal.decodeImagePixels(withApp14(1)).map(_._5.toSeq) ==
      ycbcr.map(_._5.toSeq))
    // transform 0 is Adobe RGB: channels pass through with NO color
    // inverse — decodes (non-stub) but to different pixels
    val rgb = Multimodal.decodeImagePixels(withApp14(0))
    assert(rgb.nonEmpty && rgb.map(_._5.toSeq) != ycbcr.map(_._5.toSeq))
    // transform 2 (YCCK) is meaningless for 3 components: reject, never
    // guess — the 'wrong pixels are never produced' contract
    assert(Multimodal.decodeImagePixels(withApp14(2)).isEmpty)
    assert(Multimodal.pixelStatsOne(MediaRecord(1L, withApp14(2), "x")).decoder == "stub")
    // the committed transform-0 fixture decodes for real (its ground
    // truth is pinned by pixel_expected.parquet in the fixture sweep)
    val rgbFix = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_032.jpg"))
    assert(Multimodal.decodeImagePixels(rgbFix).exists(d => d._2 == 27 && d._3 == 19))
    // and the 4:2:0 YCCK fixture (Y/K at 2x2 factors) decodes for real
    val ycckFix = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_033.jpg"))
    assert(Multimodal.decodeImagePixels(ycckFix).exists(d => d._2 == 33 && d._3 == 23))
  }

  test("12-bit JPEG (SOF1): decodes via the high-8-bit reduction; 12-bit SOF0 rejects") {
    // media_034/035 ride the exact-hash fixture sweep; here pin the
    // structural contract: SOF1 at 12 bits decodes, and the same frame
    // re-labeled SOF0 (baseline is 8-bit only per T.81) rejects
    val f12 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_034.jpg"))
    val d = Multimodal.decodeImagePixels(f12)
    assert(d.exists(x => x._2 == 31 && x._3 == 17 && x._4 == 3), d.map(x => (x._1, x._2, x._3, x._4)))
    val sof = f12.indexOfSlice(Seq(0xFF.toByte, 0xC1.toByte))
    assert(sof > 0)
    val asBaseline = f12.clone()
    asBaseline(sof + 1) = 0xC0.toByte
    assert(Multimodal.decodeImagePixels(asBaseline).isEmpty,
      "12-bit SOF0 must reject, never decode")
    // grayscale 12-bit
    val g12 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_035.jpg"))
    assert(Multimodal.decodeImagePixels(g12).exists(x => x._2 == 19 && x._4 == 1))
  }

  test("palette PNG: PLTE expansion; corrupt palettes stub-fall-back") {
    val pal = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_016.png"))
    val decoded = Multimodal.decodePngPixels(pal)
    assert(decoded.exists { case (w, h, c, px) =>
      w == 19 && h == 11 && c == 3 && px.length == 19 * 11 * 3 })
    // drop the PLTE chunk: indices have nothing to expand through
    val noPlte = {
      val i = pal.indexOfSlice("PLTE".getBytes)
      val len = java.nio.ByteBuffer.wrap(pal, i - 4, 4).getInt
      pal.take(i - 4) ++ pal.drop(i + 8 + len)
    }
    assert(Multimodal.decodePngPixels(noPlte).isEmpty)
    // metadata still parses (IHDR intact, palette reports RGB channels)
    assert(Multimodal.parsePng(noPlte).contains((19, 11, 3)))
    // a 4-bit short-palette image whose indices stay in range
    val p17 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_017.png"))
    assert(Multimodal.decodePngPixels(p17).exists(_._3 == 3))
  }

  test("sampleFrames slices strided fixed-width binary windows") {
    val payload = Array.tabulate[Byte](2100)(i => (i % 127).toByte)
    val d = Seq((1L, payload)).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(d, stride = 4, frameBytes = 256).collect()
    // offsets 0, 1024, 2048 -> 3 frames
    assert(frames.length == 3)
    val f1 = frames.find(_.getAs[Long]("frame_idx") == 1L).get.getAs[Array[Byte]]("frame")
    assert(f1.length == 256 && f1.sameElements(payload.slice(1024, 1280)))
    val f2 = frames.find(_.getAs[Long]("frame_idx") == 2L).get.getAs[Array[Byte]]("frame")
    assert(f2.length == 2100 - 2048) // tail frame is short
  }

  test("pHashPairs recovers the planted near-dup via byte-band blocking") {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File("data/media").getAbsolutePath
    val hashes = spark.read.parquet(s"$dir/phash_expected.parquet")
      .select("doc_id", "ahash", "dhash")
    val pairs = Multimodal.pHashPairs(hashes)
      .as[(Long, Long, Int)].collect().sorted.toSeq
    // (1, 23): media_023 is media_001 with sparse blue-channel nudges —
    // byte-different, one perceptual bit apart. (2, 13): two thin images
    // (dhash both -1) that land exactly on the hamming-8 threshold.
    // (26, 27): the baseline/progressive JPEG pair — byte-different
    // ENCODINGS of bit-identical pixels, hamming 0 (the strongest
    // possible perceptual dup, planted by construction in round 17).
    assert(pairs == Seq((1L, 23L, 1), (2L, 13L, 8), (26L, 27L, 0)), s"got $pairs")
    // tightening the threshold drops the boundary pair, keeps the dups
    val tight = Multimodal.pHashPairs(hashes, maxHamming = 4)
      .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(tight == Seq((1L, 23L, 1), (26L, 27L, 0)))
    // partition invariance of the bucketed pair expansion
    val rep = Multimodal.pHashPairs(hashes.repartition(7))
      .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(rep == pairs)
  }

  test("afpPairs recovers the planted nudged-PCM near-dup") {
    val dir = new java.io.File("data/media").getAbsolutePath
    val fps = spark.read.parquet(s"$dir/afp_expected.parquet")
      .select("doc_id", "afp")
    val pairs = Multimodal.afpPairs(fps)
      .as[(Long, Long, Int)].collect().sorted.toSeq
    // media_024 = media_008 with every 7th frame nudged +900
    assert(pairs == Seq((8L, 24L, 2)), s"got $pairs")
  }

  test("GIF: frame-count metadata, interlace, and corrupt streams stub out") {
    val anim = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_028.gif"))
    // metadata walk counts BOTH animation frames; pixels are frame 1 only
    assert(Multimodal.parseGif(anim).contains((23, 11, 3, 2L)))
    val px = Multimodal.decodeGifPixels(anim)
    assert(px.exists { case (w, h, c, b) => w == 23 && h == 11 && c == 3 &&
      b.length == 23 * 11 * 3 })
    val inter = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_029.gif"))
    assert(Multimodal.parseGif(inter).contains((19, 13, 3, 1L)))
    assert(Multimodal.decodeGifPixels(inter).isDefined)
    // corrupt LZW minimum code size (header 13 + 48-byte global palette +
    // 8-byte GCE + 10-byte descriptor = offset 79): out of the spec's
    // 2..8 range -> None (stub), never wrong pixels or a crash
    val bad = anim.clone()
    assert((bad(69) & 0xFF) == 0x2C) // image descriptor where expected
    bad(79) = 1
    assert(Multimodal.decodeGifPixels(bad).isEmpty)
    // truncation inside the palette / descriptor: total, None
    assert(Multimodal.decodeGifPixels(anim.take(14)).isEmpty)
    assert(Multimodal.decodeGifPixels("GIF89a".getBytes).isEmpty)
    assert(Multimodal.parseGif("NOTGIF_really_not".getBytes).isEmpty)
  }

  test("T.81 B.1.1.2 fill bytes before RST/EOI decode to identical pixels") {
    // media_026 is the baseline JPEG with DRI restart markers. Inserting
    // extra 0xFF fill bytes before each marker in the entropy segment is
    // legal per T.81 B.1.1.2 and must not change the decoded pixels.
    val orig = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("data/media/media_026.jpg"))
    val base = JpegDecoder.decode(orig)
    assert(base.isDefined, "restart-marker fixture must decode")
    val sos = orig.indexOfSlice(Seq(0xFF.toByte, 0xDA.toByte))
    assert(sos > 0)
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= orig.take(sos + 2)
    var i = sos + 2
    while (i < orig.length) {
      val isMarkerPair = (orig(i) & 0xFF) == 0xFF && i + 1 < orig.length && {
        val m = orig(i + 1) & 0xFF
        (m >= 0xD0 && m <= 0xD7) || m == 0xD9
      }
      if (isMarkerPair) { out += 0xFF.toByte; out += 0xFF.toByte } // 2 fills
      out += orig(i)
      i += 1
    }
    val filled = JpegDecoder.decode(out.toArray)
    assert(filled.isDefined, "fill-byte variant must decode, not Bail")
    val (w0, h0, c0, px0) = base.get
    val (w1, h1, c1, px1) = filled.get
    assert(w0 == w1 && h0 == h1 && c0 == c1 && px0.sameElements(px1))
  }

  test("float WAV with out-of-range finite samples rejects, never wraps") {
    def wavF32(samples: Array[Float]): Array[Byte] = {
      val bb = java.nio.ByteBuffer
        .allocate(44 + 4 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + 4 * samples.length)
      bb.put("WAVE".getBytes); bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(3); bb.putShort(1); bb.putInt(8000) // float, mono
      bb.putInt(8000 * 4); bb.putShort(4); bb.putShort(32)
      bb.put("data".getBytes); bb.putInt(4 * samples.length)
      samples.foreach(bb.putFloat)
      bb.array()
    }
    val good = Multimodal.decodeWavSamples(wavF32(Array(0.5f, -0.25f)))
    assert(good.exists(_._3.sameElements(Array(16384, -8192))))
    // 1e30 rounds to a Long far outside Int range: must reject (stub
    // fallback), never truncate to an arbitrary wrapped Int sample
    assert(Multimodal.decodeWavSamples(wavF32(Array(0.5f, 1e30f))).isEmpty)
    assert(Multimodal.decodeWavSamples(wavF32(Array(-1e30f, 0.5f))).isEmpty)
  }
}
