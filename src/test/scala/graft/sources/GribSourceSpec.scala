package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GRIB2 source: checked against the COMMITTED python-generated fixture
  * (`tools/make_grib_fixture.py` writes the bytes from the public WMO spec
  * with struct.pack — an implementation independent of the Scala parser).
  * The fixture mirrors a shrunk GloFAS ensemble file: 7 messages =
  * 1 deterministic (template 4.0) + 3 members × 2 steps (template 4.1),
  * 6×8 regular lat/lon grid, simple packing, one message with a bitmap. */
class GribSourceSpec extends SparkSpec {

  private val fixture = new File("data/grib/forecast.grib2").getAbsolutePath
  private val expected = new File("data/grib/forecast_expected.parquet").getAbsolutePath

  private def grib(parts: Int = 3) = spark.read
    .format(classOf[GribSource].getName)
    .option("path", fixture)
    .option("numPartitions", parts.toString)
    .load()

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getDouble(0), r.getDouble(1), Option(r.get(2)),
      r.getInt(3), r.getLong(4), Option(r.get(5)))).toSet

  test("decodes the python-written fixture bit-exactly (simple packing, both templates)") {
    val df = grib()
    assert(df.schema == StructType(Seq(
      StructField("latitude", DoubleType, nullable = false),
      StructField("longitude", DoubleType, nullable = false),
      StructField("number", IntegerType, nullable = true),
      StructField("step_hours", IntegerType, nullable = false),
      StructField("ref_time", LongType, nullable = false),
      StructField("value", DoubleType, nullable = true))))
    assert(asTuples(df) == asTuples(spark.read.parquet(expected)))
    assert(df.count() == 7L * 48)
    assert(df.rdd.getNumPartitions == 3)
  }

  test("decodes the complex-packing fixture bit-exactly (DRS 5.2/5.3)") {
    // tools/make_grib_complex_fixture.py: 7 messages — plain 5.2, 5.2 +
    // bitmap, 5.3 order 1/2 (2/3/4-octet descriptors), constant field
    // (group widths 0, nbits 0), differencing + bitmap, short last group
    val df = spark.read
      .format(classOf[GribSource].getName)
      .option("path", new File("data/grib/complex.grib2").getAbsolutePath)
      .option("numPartitions", "3")
      .load()
    val mirror = spark.read.parquet(
      new File("data/grib/complex_expected.parquet").getAbsolutePath)
    assert(asTuples(df) == asTuples(mirror))
    assert(df.count() == 7L * 45)
    assert(df.filter(col("value").isNull).count() == 8) // 2 bitmap messages x 4
  }

  test("decodes the PNG-packing fixture bit-exactly (DRS 5.41)") {
    // tools/make_grib_png_fixture.py: 7 messages — 8/16-bit gray, 24-bit
    // RGB, 32-bit RGBA samples, strip and grid raster layouts, all five
    // PNG filters, split IDAT + ancillary chunk, bitmap, constant field
    val df = spark.read
      .format(classOf[GribSource].getName)
      .option("path", new File("data/grib/png.grib2").getAbsolutePath)
      .option("numPartitions", "3")
      .load()
    val mirror = spark.read.parquet(
      new File("data/grib/png_expected.parquet").getAbsolutePath)
    assert(asTuples(df) == asTuples(mirror))
    assert(df.count() == 7L * 45)
    assert(df.filter(col("value").isNull).count() == 4) // 1 bitmap message x 4
  }

  test("decodes the CCSDS-packing fixture bit-exactly (DRS 5.42)") {
    // tools/make_grib_ccsds_fixture.py: 9 messages — 6/8/12/16-bit
    // samples, preprocessor on/off, references at RSI 1-8, zero runs
    // incl. remainder-of-segment, second-extension, splitting,
    // uncompressed, bitmap, constant field
    val df = spark.read
      .format(classOf[GribSource].getName)
      .option("path", new File("data/grib/ccsds.grib2").getAbsolutePath)
      .option("numPartitions", "3")
      .load()
    val mirror = spark.read.parquet(
      new File("data/grib/ccsds_expected.parquet").getAbsolutePath)
    assert(asTuples(df) == asTuples(mirror))
    assert(df.count() == 9L * 45)
    assert(df.filter(col("value").isNull).count() == 4) // 1 bitmap message x 4
  }

  test("a corrupt PNG-packed payload is rejected loudly, not decoded wrong") {
    // flip one byte inside the first message's IDAT compressed data: the
    // zlib adler32 trailer must catch it (the decode drives the stream to
    // its end even when the raster fills first), naming the file — wrong
    // values are never emitted
    val src = java.nio.file.Paths.get("data/grib/png.grib2")
    val bytes = java.nio.file.Files.readAllBytes(src)
    def secAt(off: Int): (Int, Int) =
      (java.nio.ByteBuffer.wrap(bytes, off, 4).getInt, bytes(off + 4) & 0xFF)
    // walk the first message's sections to its section 7
    var at = 16
    var sec7 = -1
    var sec7Len = -1
    while (sec7 < 0) {
      val (len, num) = secAt(at)
      if (num == 7) { sec7 = at; sec7Len = len } else at += len
    }
    // section-7 body: PNG sig (8) + IHDR chunk (25) + IDAT header (8)
    val idatData = sec7 + 5 + 8 + 25 + 8
    val corrupt = bytes.clone()
    corrupt(idatData + 6) = (corrupt(idatData + 6) ^ 0x5A).toByte
    val p = java.nio.file.Paths.get(tmp("png_corrupt.grib2"))
    java.nio.file.Files.write(p, corrupt)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format(classOf[GribSource].getName)
        .option("path", p.toString).load().collect()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("PNG-packed") || msg.contains("zlib"),
      s"expected a loud PNG decode rejection, got: $msg")

    // and a patched IHDR width breaks the one-pixel-per-point contract
    val badDims = bytes.clone()
    val ihdrW = sec7 + 5 + 8 + 8 // IHDR data: width at its first 4 bytes
    java.nio.ByteBuffer.wrap(badDims, ihdrW, 4).putInt(7)
    val p2 = java.nio.file.Paths.get(tmp("png_baddims.grib2"))
    java.nio.file.Files.write(p2, badDims)
    val e2 = intercept[org.apache.spark.SparkException] {
      spark.read.format(classOf[GribSource].getName)
        .option("path", p2.toString).load().collect()
    }
    val msg2 = e2.getMessage +
      Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("data points") || msg2.contains("raster"),
      s"expected the raster/point-count mismatch error, got: $msg2")
  }

  test("bitmap-missing cells surface as SQL NULL values") {
    assert(grib().filter(col("value").isNull).count() == 3)
    // the deterministic message has no `number`
    assert(grib().filter(col("number").isNull).count() == 48)
  }

  test("member/step predicates prune whole messages at plan time") {
    val one = grib().filter(col("number") === 2)
    assert(one.queryExecution.executedPlan.toString.contains("messages=2"),
      s"expected 2 surviving messages:\n${one.queryExecution.executedPlan}")
    assert(one.count() == 2L * 48)

    val step = grib().filter(col("step_hours") === 48)
    assert(step.queryExecution.executedPlan.toString.contains("messages=3"))
    assert(step.count() == 3L * 48)

    // NULL semantics: comparisons never match the template-4.0 message
    assert(grib().filter(col("number") >= 1).count() == 6L * 48)
    // and pruning composes with post-filters on non-pushed columns
    // member 1 = 2 messages; 2 of 6 lats pass → 2 × 2 × 8 lons
    val combo = grib().filter(col("number") === 1 && col("latitude") > 17.9)
    assert(combo.count() == 32)
  }

  test("reported statistics reflect message pruning (broadcastable member tracks)") {
    def rowStats(df: org.apache.spark.sql.DataFrame) = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.head.stats.rowCount
    assert(rowStats(grib()).contains(BigInt(7 * 48)))
    assert(rowStats(grib().filter(col("number") === 2)).contains(BigInt(2 * 48)))
  }

  test("column pruning skips payload decode for metadata-only scans") {
    val meta = grib().select("number", "step_hours").distinct()
    val plan = meta.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[number,step_hours]"), s"expected pruned cols:\n$plan")
    assert(meta.count() == 7)
  }

  test("ensemble statistics over the decoded field match the parquet mirror") {
    // the end-to-end shape the reference computes: per-cell ensemble median
    // over perturbed members at one step (glofas-forecast-computation.py)
    def med(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("number").isNotNull && col("step_hours") === 24)
      .groupBy("latitude", "longitude")
      .agg(percentile(col("value"), lit(0.5)).as("median_dis"))
    assert(asSet(med(grib())) == asSet(med(spark.read.parquet(expected))))
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getDouble(0), r.getDouble(1), Option(r.get(2)))).toSet

  // ------------------------------------------------------------ mini writer
  // Scala-side builder (shared GribTestWriter) for the edge cases the
  // python fixture doesn't cover (j-ascending scan, alternate time units,
  // wrong edition). Simple packing with R=0, E=0, D=0 → X IS the value.

  private def miniGrib(file: String, ni: Int, nj: Int,
      latFirstMicro: Int, lonFirstMicro: Int, incMicro: Int,
      scanMode: Int, timeUnit: Int, forecastTime: Int,
      values: Seq[Int], edition: Int = 2): String =
    GribTestWriter.write(file, ni, nj, latFirstMicro, lonFirstMicro, incMicro,
      scanMode, timeUnit, forecastTime, member = None,
      r = 0.0f, e = 0, d = 0, nbits = 16, xs = values.map(_.toLong),
      edition = edition)

  private def tmp(n: String) =
    new File(System.getProperty("java.io.tmpdir"), n).getAbsolutePath

  private def exceptionChain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def readMini(f: String) = spark.read
    .format(classOf[GribSource].getName).option("path", f).load()

  test("a glob path reads a multi-file day as one scan (per-leadtime files)") {
    val dir = java.nio.file.Files.createTempDirectory("gribday")
    val src = java.nio.file.Paths.get(fixture)
    java.nio.file.Files.copy(src, dir.resolve("lt024.grib2"))
    java.nio.file.Files.copy(src, dir.resolve("lt048.grib2"))
    val day = spark.read.format(classOf[GribSource].getName)
      .option("path", s"$dir/*.grib2").option("numPartitions", "4").load()
    assert(day.count() == 2L * 7 * 48)
    assert(day.queryExecution.executedPlan.toString.contains("messages=14"))
    // message pruning spans files
    val one = day.filter(col("number") === 2 && col("step_hours") === 48)
    assert(one.queryExecution.executedPlan.toString.contains("messages=2"))
    assert(one.count() == 2L * 48)
  }

  test("j-ascending scan mode (0x40) orients latitude upward") {
    val f = miniGrib(tmp("asc.grib2"), 2, 2, 10000000, 5000000, 500000,
      scanMode = 0x40, timeUnit = 1, forecastTime = 6, values = Seq(1, 2, 3, 4))
    val rows = readMini(f).select("latitude", "longitude", "value")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(rows == Set(
      (10.0, 5.0, 1.0), (10.0, 5.5, 2.0),   // j=0 row at latFirst
      (10.5, 5.0, 3.0), (10.5, 5.5, 4.0)))  // j=1 ABOVE it
  }

  test("minute and day time units normalize to step_hours") {
    val day = miniGrib(tmp("day.grib2"), 1, 1, 0, 0, 500000,
      scanMode = 0, timeUnit = 2, forecastTime = 3, values = Seq(9))
    assert(readMini(day).select("step_hours").head.getInt(0) == 72)
    val minute = miniGrib(tmp("min.grib2"), 1, 1, 0, 0, 500000,
      scanMode = 0, timeUnit = 0, forecastTime = 120, values = Seq(9))
    assert(readMini(minute).select("step_hours").head.getInt(0) == 2)
  }

  test("partitions balance by CELL COUNT, not message count, on mixed grids") {
    // 4 tiny (1x1) then 4 big (10x10) messages in one file: a count-based
    // split would give two partitions ~2 cells and two ~200 (stragglers);
    // the weight-balanced contiguous split keeps every partition near
    // total/4 = 101 cells
    val parts = (0 until 4).map { i =>
      GribTestWriter.write(tmp(s"mix_t$i.grib2"), 1, 1, 0, 0, 500000,
        scanMode = 0, timeUnit = 1, forecastTime = i + 1, member = Some(1),
        r = 0f, e = 0, d = 0, nbits = 8, xs = Seq(9L))
    } ++ (0 until 4).map { i =>
      GribTestWriter.write(tmp(s"mix_b$i.grib2"), 10, 10, 0, 0, 500000,
        scanMode = 0, timeUnit = 1, forecastTime = i + 10, member = Some(1),
        r = 0f, e = 0, d = 0, nbits = 8, xs = Seq.fill(100)(7L))
    }
    val f = tmp("mix_all.grib2")
    java.nio.file.Files.write(java.nio.file.Paths.get(f),
      parts.flatMap(p => java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)).toSeq).toArray)
    val df = spark.read.format(classOf[GribSource].getName)
      .option("path", f).option("numPartitions", "4").load()
    val perPartition = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPartition.length == 4)
    assert(perPartition.sum == 404)
    assert(perPartition.forall(s => s >= 100 && s <= 104),
      s"expected ~101 cells per partition, got ${perPartition.mkString(",")}")
  }

  test("partitionByStep: one keyed partition per step, exchange-free grouped " +
    "aggregation, identical results") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val byStep = spark.read
        .format(classOf[GribSource].getName)
        .option("path", fixture)
        .option("numPartitions", "3") // superseded by the step clustering
        .option("partitionByStep", "true")
        .load()
      // fixture has steps {24, 48} → exactly two partitions, keyed
      assert(byStep.rdd.getNumPartitions == 2)

      def groupAgg(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("latitude"), col("longitude"), col("step_hours"))
        .agg(count(col("value")).as("n"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
      val clustered = groupAgg(byStep)
      val got = clustered.collect().map(_.toSeq).toSet
      // order-insensitive aggregates → exact equality vs the cell-balanced scan
      assert(got == groupAgg(grib()).collect().map(_.toSeq).toSet)
      // the reported KeyGroupedPartitioning satisfies the aggregation's
      // distribution: NO exchange anywhere in the executed plan
      val plan = clustered.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected an exchange-free plan:\n$plan")

      // column pruning that drops step_hours falls back to cell-balanced
      // slices (the clustering would be unresolvable against the output)
      assert(byStep.select("latitude", "value").rdd.getNumPartitions == 3)

      // a step spanning MULTIPLE files still lands in ONE keyed partition
      // (the day-glob shape with per-leadtime files repeated across drops)
      val dir = java.nio.file.Files.createTempDirectory("gribstep")
      for (n <- Seq("a", "b"))
        java.nio.file.Files.copy(java.nio.file.Paths.get(fixture),
          dir.resolve(s"$n.grib2"))
      val multi = spark.read
        .format(classOf[GribSource].getName)
        .option("path", s"$dir/*.grib2")
        .option("partitionByStep", "true")
        .load()
      assert(multi.rdd.getNumPartitions == 2) // still one per step
      assert(multi.count() == 2L * 7 * 48)
      val multiAgg = groupAgg(multi)
      assert(!multiAgg.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(multiAgg.filter(col("step_hours") === 24).agg(sum(col("n")))
        .collect().head.getLong(0) == 2L * 4 * 48 - 2 * 3) // 4 msgs @24h, bitmap drops 3
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }

  test("LOSSY DRS 5.40 rejects at INDEX time naming the cause and the escape hatch") {
    // committed fixture (tools/make_grib_jpeg_fixture.py): one 5.40
    // message with type-of-compression 1 (lossy). Lossless 5.40 decodes
    // since round 18 (J2kDecoder, GribJ2kFuzzSpec); a rate-controlled
    // lossy stream has no exact integer reconstruction, so the contract
    // is a crisp ingest-time error carrying the re-encode advice, never
    // a silent skip, a decode of garbage, or a generic parse failure.
    val f = new File("data/grib/jpeg2000.grib2").getAbsolutePath
    val e = intercept[IllegalArgumentException] {
      spark.read.format(classOf[GribSource].getName)
        .option("path", f).load().collect()
    }
    val msg = e.getMessage
    assert(msg.contains("5.40") && msg.contains("LOSSY"), msg)
    assert(msg.contains("grid_simple") && msg.contains("grib_set"), msg)
  }

  test("a bitmap/nPresent mismatch is rejected loudly, not an index error") {
    // the writer derives section 5's data-point count from xs.size, so a
    // bitmap with MORE set bits than values is exactly the corrupt
    // undercount that would otherwise blow up as
    // ArrayIndexOutOfBoundsException deep in the emit loop
    val f = GribTestWriter.write(tmp("mismatch.grib2"), 2, 2,
      10000000, 5000000, 500000, scanMode = 0, timeUnit = 1, forecastTime = 1,
      member = Some(1), r = 0f, e = 0, d = 0, nbits = 8, xs = Seq(7L, 9L),
      bitmap = Some(Seq(true, true, true, false))) // 3 present, 2 values
    val e = intercept[org.apache.spark.SparkException](readMini(f).collect())
    assert(e.getMessage.contains("bitmap marks") ||
      Option(e.getCause).exists(_.getMessage.contains("bitmap marks")),
      s"expected the named mismatch error, got: ${e.getMessage}")
  }

  test("a section length overrunning the message end is rejected loudly") {
    // lengths from the file are UNTRUSTED: a corrupt section length past
    // msgEnd must name the file/offset, not read the next message's bytes
    val f = miniGrib(tmp("overrun.grib2"), 1, 1, 0, 0, 500000,
      scanMode = 0, timeUnit = 1, forecastTime = 1, values = Seq(9))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
    // section 1 starts right after the 16-byte indicator; its 4-byte
    // length field is at offset 16 — patch it to overrun the message
    java.nio.ByteBuffer.wrap(bytes, 16, 4).putInt(1 << 20)
    val patched = java.nio.file.Paths.get(tmp("overrun_patched.grib2"))
    java.nio.file.Files.write(patched, bytes)
    val e = intercept[IllegalArgumentException](readMini(patched.toString).collect())
    assert(e.getMessage.contains("overruns"), e.getMessage)
  }

  test("GRIB edition 1 and unsupported scan modes are rejected loudly") {
    val e1 = miniGrib(tmp("ed1.grib2"), 1, 1, 0, 0, 500000,
      scanMode = 0, timeUnit = 1, forecastTime = 1, values = Seq(9), edition = 1)
    assert(intercept[IllegalArgumentException](readMini(e1).collect())
      .getMessage.contains("edition"))
    val iRev = miniGrib(tmp("irev.grib2"), 1, 1, 0, 0, 500000,
      scanMode = 0x80, timeUnit = 1, forecastTime = 1, values = Seq(9))
    assert(intercept[IllegalArgumentException](readMini(iRev).collect())
      .getMessage.contains("scanning mode"))
  }

  test("DRS 5.4 IEEE floats decode bit-exactly; f128 and short payloads reject") {
    // ieee.grib2 (tools/make_grib_ieee_fixture.py): f32/f64 plain +
    // bitmapped + constant messages; the f64 fields are built from
    // thirds/sevenths so they are NOT f32-representable — a reader that
    // narrowed through float32 would diverge here
    val f = new java.io.File("data/grib/ieee.grib2").getAbsolutePath
    val expected = new java.io.File("data/grib/ieee_expected.parquet").getAbsolutePath
    val df = spark.read.format(classOf[GribSource].getName)
      .option("path", f).option("numPartitions", "3").load()
    val key = Seq("latitude", "longitude", "number", "step_hours").map(col)
    val got = df.sort(key: _*).collect().toSeq
    val want = spark.read.parquet(expected)
      .select(df.columns.map(col): _*).sort(key: _*).collect().toSeq
    assert(got == want)
    assert(df.count() == 225 && df.filter(col("value").isNull).count() == 8)
    // single-byte patches on the committed fixture: the precision code of
    // the FIRST message (45 f32 samples, no bitmap) lives 11 bytes into
    // its 12-octet section 5
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
    val sec5 = indexOfSlice(bytes, Array[Byte](0, 0, 0, 12, 5))
    assert(sec5 > 0 && bytes(sec5 + 11) == 1)
    def patched(precision: Byte): String = {
      val b = bytes.clone(); b(sec5 + 11) = precision
      val p = tmp("ieee_patch.grib2")
      java.nio.file.Files.write(java.nio.file.Paths.get(p), b)
      p
    }
    // precision 3 (128-bit) has no Double-exact widening: named reject
    val e3 = intercept[Exception](spark.read.format(classOf[GribSource].getName)
      .option("path", patched(3)).load().collect())
    assert(exceptionChain(e3).exists(_.contains("precision code 3")),
      exceptionChain(e3).mkString(" | "))
    // precision flipped to f64 doubles the bytes the 45 samples need —
    // the payload-vs-samples bound must reject by name, never misread
    val e2 = intercept[Exception](spark.read.format(classOf[GribSource].getName)
      .option("path", patched(2)).load().collect())
    assert(exceptionChain(e2).exists(m =>
      m.contains("IEEE section 7") && m.contains("need")),
      exceptionChain(e2).mkString(" | "))
  }

  test("every audited-absent WMO DRS template rejects BY NAME at index time") {
    // the round-19 audit: GribSource.DrsRejects sweeps WMO code table 5.0
    // against the dispatch — each registry-defined template this source
    // does not decode must fail naming the template AND its occurrence
    // note, plus the re-encode escape hatch, never as a generic parse
    // error deeper in
    assert(GribSource.DrsRejects.keySet ==
      Set(1, 6, 50, 51, 53, 61, 200)) // 5.4 decoded since round 20
    for ((t, why) <- GribSource.DrsRejects) {
      val f = GribTestWriter.write(tmp(s"drs$t.grib2"), 1, 1, 0, 0, 500000,
        scanMode = 0, timeUnit = 1, forecastTime = 1, member = None,
        r = 0.0f, e = 0, d = 0, nbits = 16, xs = Seq(9L), drsTemplate = t)
      val msg = intercept[IllegalArgumentException](readMini(f).collect()).getMessage
      assert(msg.contains(s"5.$t unsupported"), s"template 5.$t: $msg")
      assert(msg.contains(why.take(20)), s"template 5.$t occurrence note: $msg")
      assert(msg.contains("grid_simple"), s"template 5.$t escape hatch: $msg")
    }
    // an UNKNOWN (registry-undefined) template still rejects loudly,
    // without an occurrence note
    val f = GribTestWriter.write(tmp("drs199.grib2"), 1, 1, 0, 0, 500000,
      scanMode = 0, timeUnit = 1, forecastTime = 1, member = None,
      r = 0.0f, e = 0, d = 0, nbits = 16, xs = Seq(9L), drsTemplate = 199)
    assert(intercept[IllegalArgumentException](readMini(f).collect())
      .getMessage.contains("5.199 unsupported"))
  }
}
