package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** NetCDF-4 / HDF5 source: checked against the COMMITTED python-generated
  * fixtures (`tools/make_netcdf4_fixture.py` writes the HDF5 bytes from the
  * public file-format spec with struct.pack — no HDF5 library exists in
  * this environment, so writer and reader are independent from-spec
  * implementations on the two sides). thresholds4.nc exercises superblock
  * v0 / v1 object headers / symbol-table groups / shuffle+deflate and
  * deflate+fletcher32 chunked layouts with edge chunks; discharge4_v2.nc
  * exercises superblock v2 / OHDR v2 / link messages / lookup3 checksums /
  * a phony (index-coordinate) dimension. */
class Netcdf4SourceSpec extends SparkSpec {

  private val fixture = new File("data/netcdf/thresholds4.nc").getAbsolutePath
  private val expected = new File("data/netcdf/thresholds4_expected.parquet").getAbsolutePath
  private val fixtureV2 = new File("data/netcdf/discharge4_v2.nc").getAbsolutePath
  private val expectedV2 = new File("data/netcdf/discharge4_v2_expected.parquet").getAbsolutePath

  private def nc(path: String = fixture, parts: Int = 4) = spark.read
    .format(classOf[NetcdfSource].getName)
    .option("path", path)
    .option("numPartitions", parts.toString)
    .load()

  test("reads the python-written HDF5 fixture to the flattened long form") {
    val df = nc()
    // variable order follows the group's link order — for symbol-table
    // groups that is B-tree NAME order ('threshold_20y' < 'threshold_2y'),
    // the only order the v1 container stores; the oracle compare is
    // name-keyed, so ordering carries no semantics
    assert(df.schema == StructType(Seq(
      StructField("lat", DoubleType, nullable = false),
      StructField("lon", DoubleType, nullable = false),
      StructField("threshold_20y", DoubleType, nullable = false),
      StructField("threshold_2y", FloatType, nullable = true),
      StructField("threshold_5y", DoubleType, nullable = false),
      StructField("upstream_area", IntegerType, nullable = false))))
    val cols = Seq("lat", "lon", "threshold_2y", "threshold_5y", "threshold_20y",
      "upstream_area").map(col)
    val got = df.select(cols: _*).collect().map(r => (r.getDouble(0), r.getDouble(1),
      Option(r.get(2)), r.getDouble(3), r.getDouble(4), r.getInt(5))).toSet
    val want = spark.read.parquet(expected).select(cols: _*).collect()
      .map(r => (r.getDouble(0), r.getDouble(1),
        Option(r.get(2)), r.getDouble(3), r.getDouble(4), r.getInt(5))).toSet
    assert(got == want)
    assert(df.count() == 600)
    assert(df.rdd.getNumPartitions == 4)
  }

  test("_FillValue cells surface as SQL NULLs across chunked+shuffled storage") {
    // idx % 11 == 0 over 600 cells → 55 fills
    assert(nc().filter(col("threshold_2y").isNull).count() == 55)
    assert(nc().na.drop(Seq("threshold_2y")).count() == 545)
  }

  test("column pruning reaches the I/O layer on the HDF5 path") {
    val df = nc().select("lat", "threshold_5y")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("vars=[threshold_5y]"), s"expected pruned var list:\n$plan")
    assert(df.collect().length == 600)
  }

  test("outer-coordinate range predicates slice the chunk set (descending lat)") {
    val df = nc().filter(col("lat") >= 17.9) // descending from 17.975 by 0.05
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("latIdx=[0,2)"), s"expected sliced outer range:\n$plan")
    assert(df.count() == 60)
    assert(nc().filter(col("lat") > 100.0).count() == 0)
  }

  test("deflate+fletcher32 pipeline decodes and a flipped chunk byte rejects loudly") {
    // threshold_20y carries fletcher32: corrupt one stored chunk byte and
    // the checksum must catch it (deflate alone might too, but fletcher is
    // the contract)
    val sum = nc().agg(org.apache.spark.sql.functions.sum("threshold_20y")).head.getDouble(0)
    val wantSum = (0 until 600).map(i => i * 2.5 + 9.25).sum
    assert(math.abs(sum - wantSum) < 1e-6)

    val bytes = Files.readAllBytes(Paths.get(fixture))
    // flip a byte near the END of the file (chunk data region, not metadata)
    val corrupt = bytes.clone()
    corrupt(corrupt.length - 10) = (corrupt(corrupt.length - 10) ^ 0x5A).toByte
    val dir = Files.createTempDirectory("nc4corrupt")
    val p = dir.resolve("bad.nc")
    Files.write(p, corrupt, StandardOpenOption.CREATE)
    val ex = intercept[Exception] {
      nc(p.toString).agg(org.apache.spark.sql.functions.sum("threshold_20y")).head
    }
    val msg = Option(ex.getMessage).getOrElse("") + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("fletcher32") || msg.contains("deflate") || msg.contains("chunk"),
      s"expected a named decode failure, got: $msg")
  }

  test("superblock v2 + OHDR v2 + link messages + phony dim (index coords)") {
    val df = nc(fixtureV2, parts = 3)
    assert(df.schema == StructType(Seq(
      StructField("y", DoubleType, nullable = false),
      StructField("x", DoubleType, nullable = false),
      StructField("discharge", FloatType, nullable = true))))
    val got = df.collect().map(r => (r.getDouble(0), r.getDouble(1), Option(r.get(2)))).toSet
    val want = spark.read.parquet(expectedV2).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), Option(r.get(2)))).toSet
    assert(got == want)
    // phony dim y coords are plain indices
    val ys: Array[Double] = df.select("y").distinct().collect().map(_.getDouble(0)).sorted
    assert(ys.toSeq == (0 until 12).map(_.toDouble))
  }

  test("a corrupted v2 superblock checksum rejects loudly, not garbage") {
    val bytes = Files.readAllBytes(Paths.get(fixtureV2))
    val corrupt = bytes.clone()
    corrupt(20) = (corrupt(20) ^ 0x01).toByte // inside the checksummed region
    val dir = Files.createTempDirectory("nc4sb")
    val p = dir.resolve("badsb.nc")
    Files.write(p, corrupt, StandardOpenOption.CREATE)
    val ex = intercept[Exception] { nc(p.toString).count() }
    assert(Option(ex.getMessage).getOrElse("").contains("checksum"),
      s"expected a checksum rejection, got: ${ex.getMessage}")
  }

  test("a truncated file rejects as a named bounds error, never a hang or OOM") {
    val bytes = Files.readAllBytes(Paths.get(fixture))
    val dir = Files.createTempDirectory("nc4trunc")
    val p = dir.resolve("trunc.nc")
    Files.write(p, bytes.take(bytes.length / 3), StandardOpenOption.CREATE)
    val ex = intercept[Exception] { nc(p.toString).count() }
    val msg = Option(ex.getMessage).getOrElse("")
    assert(msg.contains("out of bounds") || msg.contains("truncated") || msg.nonEmpty)
  }

  test("option 'variables' selects data vars; unknown names fail loudly") {
    val df = nc().select("upstream_area")
    assert(df.collect().map(_.getInt(0)).sum == (0 until 600).map(_ * 1000 + 7).sum)
    val ex = intercept[IllegalArgumentException] {
      spark.read.format(classOf[NetcdfSource].getName)
        .option("path", fixture).option("variables", "nope").load()
    }
    assert(ex.getMessage.contains("not found"))
  }

  test("classic dispatch is untouched: the CDF-1 fixture still reads") {
    val classic = new File("data/netcdf/thresholds.nc").getAbsolutePath
    assert(nc(classic, parts = 3).count() == 48)
  }

  test("dense (fractal-heap + v2 B-tree) groups and layout-v4 chunk indexes") {
    // dense4.nc (tools/make_netcdf4_dense_fixture.py): root links in a
    // fractal heap (root indirect block, three checksummed direct blocks,
    // one Undef slot) indexed by a v2 B-tree; 12 variables across v4
    // contiguous/compact/single-chunk(±filtered)/implicit/fixed-array
    // (clients 0 and 1) layouts plus classic v3 forms, one fixed-array
    // chunk unallocated (→ fill → NULL), one unsigned u2 variable.
    val dense = new File("data/netcdf/dense4.nc").getAbsolutePath
    val expectedDense = new File("data/netcdf/dense4_expected.parquet").getAbsolutePath
    val df = nc(dense, parts = 3)
    val want = spark.read.parquet(expectedDense)
    val colsInOrder = want.schema.fieldNames.toSeq
    assert(df.columns.sorted.toSeq == colsInOrder.sorted,
      s"columns: got ${df.columns.mkString(",")}")
    // u2 widened to int, i1/i2/i8/f4/f8 kept exact
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("v_u2") == IntegerType)
    assert(byName("v_i1") == ByteType && byName("v_implicit") == ShortType)
    val key = Seq(col("y"), col("x"))
    val got = df.select(colsInOrder.map(col): _*).sort(key: _*).collect().toSeq
    val exp = want.select(colsInOrder.map(col): _*).sort(key: _*).collect().toSeq
    assert(got == exp)
    assert(df.count() == 99)
    // the unallocated fixed-array chunk surfaces as NULLs (12 cells of the
    // 3x4-chunk grid minus out-of-extent overhang)
    assert(df.filter(col("v_fixed").isNull).count() ==
      want.filter(col("v_fixed").isNull).count())
    // pruning still reaches I/O on the dense path
    val plan = df.select("y", "v_single").queryExecution.executedPlan.toString
    assert(plan.contains("vars=[v_single]"), s"expected pruned vars:\n$plan")
    // v_fixed_filt resolves its dims through DENSE attribute storage
    // (Attribute Info -> fractal heap + type-8 B-tree): the values above
    // already compared equal, which is only possible if DIMENSION_LIST
    // was read out of the dense store; pin that the column really exists
    assert(df.select(sum(col("v_fixed_filt"))).head.getDouble(0) ==
      want.select(sum(col("v_fixed_filt"))).head.getDouble(0))
    // corrupting a byte inside the dense ATTRIBUTE heap (an attr name)
    // fails the block checksum loudly instead of misreading metadata
    val bytes = Files.readAllBytes(Paths.get(dense))
    val apos = indexOfSlice(bytes, "attr_03".getBytes)
    assert(apos > 0)
    val abad = bytes.clone()
    abad(apos) = 'z'.toByte
    val adir = Files.createTempDirectory("nc4denseattr")
    val ap = adir.resolve("bad.nc")
    Files.write(ap, abad, StandardOpenOption.CREATE)
    val aex = intercept[Exception] { nc(ap.toString).count() }
    assert(Option(aex.getMessage).getOrElse("").contains("checksum"),
      s"expected a checksum rejection, got: ${aex.getMessage}")
    // corrupting a direct-block byte (inside a link name) fails the block
    // checksum loudly instead of surfacing a wrong link
    val pos = indexOfSlice(bytes, "v_contig4".getBytes)
    assert(pos > 0)
    val corrupt = bytes.clone()
    corrupt(pos) = 'w'.toByte
    val dir = Files.createTempDirectory("nc4dense")
    val p = dir.resolve("bad.nc")
    Files.write(p, corrupt, StandardOpenOption.CREATE)
    val ex = intercept[Exception] { nc(p.toString).count() }
    assert(Option(ex.getMessage).getOrElse("").contains("checksum"),
      s"expected a checksum rejection, got: ${ex.getMessage}")
  }

  test("unlimited-dim chunk indexes: extensible array, v2 B-tree, paged fixed array, deep v1 tree") {
    // extarray4.nc (tools/make_netcdf4_extarray_fixture.py): an UNLIMITED
    // time dimension; chunk indexes covering extensible arrays (inline /
    // direct / super-block / PAGED data blocks, libhdf5-default and tiny
    // geometries), v2 B-trees (types 10/11, depth 1 and 2), paged fixed
    // arrays (clients 0/1, one UNINITIALIZED page), and a depth-2 v1
    // B-tree. Unallocated elements/blocks/pages and absent records → fill.
    val f = new File("data/netcdf/extarray4.nc").getAbsolutePath
    val expected = new File("data/netcdf/extarray4_expected.parquet").getAbsolutePath
    val df = nc(f, parts = 4)
    val want = spark.read.parquet(expected)
    val colsInOrder = want.schema.fieldNames.toSeq
    assert(df.columns.sorted.toSeq == colsInOrder.sorted,
      s"columns: got ${df.columns.mkString(",")}")
    val key = Seq(col("time"), col("y"), col("x"))
    val got = df.select(colsInOrder.map(col): _*).sort(key: _*).collect().toSeq
    val exp = want.select(colsInOrder.map(col): _*).sort(key: _*).collect().toSeq
    assert(got == exp)
    assert(df.count() == 30 * 11 * 9)
    // every missing-chunk mechanism surfaces as whole-chunk NULLs:
    // v_ea 2 Undef elements; v_ea_sb 1 Undef element + 1 Undef DATA BLOCK
    // (6 rows); v_ea_paged 1 uninitialized EA page (2 rows of it in
    // extent); v_bt2 1 absent record; v_paged_fa 1 Undef entry;
    // v_paged_fa_holes 1 uninitialized FA page (8 rows)
    for ((v, missingRows) <- Seq("v_ea" -> 2, "v_ea_sb" -> 7,
        "v_ea_paged" -> 2, "v_bt2" -> 1, "v_paged_fa" -> 1,
        "v_paged_fa_holes" -> 8)) {
      assert(df.filter(col(v).isNull).count() == missingRows.toLong * 99,
        s"$v null rows")
    }
    // outer-coordinate pushdown still becomes an index bound on this path
    assert(df.filter(col("time") >= 19025.0).count() === 5L * 99)
    // corrupting any byte inside an index structure fails its lookup3
    // checksum loudly instead of decoding garbage
    val bytes = Files.readAllBytes(Paths.get(f))
    for (sigName <- Seq("EAHD", "EAIB", "EASB", "EADB", "BTLF", "BTIN", "FADB")) {
      val pos = indexOfSlice(bytes, sigName.getBytes)
      assert(pos > 0, sigName)
      val corrupt = bytes.clone()
      corrupt(pos + 6) = (corrupt(pos + 6) ^ 0x04).toByte
      val dir = Files.createTempDirectory("nc4ext")
      val p = dir.resolve(s"bad$sigName.nc")
      Files.write(p, corrupt, StandardOpenOption.CREATE)
      val ex = intercept[Exception] { nc(p.toString).count() }
      val msg = Option(ex.getMessage).getOrElse("")
      assert(msg.contains("checksum") || msg.contains("does not point back") ||
        msg.contains("signature") || msg.contains("version"),
        s"$sigName: expected a loud structural rejection, got: $msg")
    }
    // a truncated file (cut inside the chunk payload region) rejects as a
    // named bounds error
    val dir = Files.createTempDirectory("nc4exttrunc")
    val p = dir.resolve("trunc.nc")
    Files.write(p, bytes.take(bytes.length - 2000), StandardOpenOption.CREATE)
    val ex = intercept[Exception] { nc(p.toString).count() }
    assert(Option(ex.getMessage).getOrElse("").contains("out of bounds"),
      s"got: ${ex.getMessage}")
    // a page the bitmap marks UNINITIALIZED but whose bytes carry a VALID
    // checksum (what a bit-order confusion or targeted corruption would
    // produce) rejects loudly instead of silently reading as fill.
    // v_paged_fa_holes' data block is the SECOND FADB in the file; its
    // page 1 (8 entries x 15 bytes) is the planted uninitialized page.
    val first = indexOfSlice(bytes, "FADB".getBytes)
    val second = first + 4 + indexOfSlice(
      java.util.Arrays.copyOfRange(bytes, first + 4, bytes.length), "FADB".getBytes)
    assert(second > first)
    val pageLen = 8 * 15
    val page1 = second + (4 + 1 + 1 + 8 + 1 + 4) + (pageLen + 4)
    val fixed = bytes.clone()
    assert(fixed.slice(page1, page1 + pageLen + 4).forall(_ == 0),
      "expected the planted uninitialized page to be zeros")
    val ck = graft.sources.Hdf5.lookup3(fixed, page1, pageLen)
    fixed(page1 + pageLen) = (ck & 0xFF).toByte
    fixed(page1 + pageLen + 1) = ((ck >> 8) & 0xFF).toByte
    fixed(page1 + pageLen + 2) = ((ck >> 16) & 0xFF).toByte
    fixed(page1 + pageLen + 3) = ((ck >> 24) & 0xFF).toByte
    val p3 = dir.resolve("bitorder.nc")
    Files.write(p3, fixed, StandardOpenOption.CREATE)
    val ex3 = intercept[Exception] { nc(p3.toString).count() }
    assert(Option(ex3.getMessage).getOrElse("").contains("bitmap and contents disagree"),
      s"got: ${ex3.getMessage}")
  }

  test("nested-indirect fractal heap + depth-2 name index (large dense groups)") {
    // deepdense4.nc (tools/make_netcdf4_deepdense_fixture.py): 22 links
    // across 11 direct blocks, two reached through CHILD indirect blocks
    // (the H5HF doubling-table row past maxDirectRows, with Undef slots),
    // indexed by a DEPTH-2 v2 B-tree — the shapes a group accumulates at
    // thousands of links, forced at fixture size by a tiny geometry.
    val f = new File("data/netcdf/deepdense4.nc").getAbsolutePath
    val expected = new File("data/netcdf/deepdense4_expected.parquet").getAbsolutePath
    val df = nc(f, parts = 2)
    val want = spark.read.parquet(expected)
    val colsInOrder = want.schema.fieldNames.toSeq
    assert(df.columns.sorted.toSeq == colsInOrder.sorted,
      s"columns: got ${df.columns.mkString(",")}")
    val key = Seq(col("y"), col("x"))
    assert(df.select(colsInOrder.map(col): _*).sort(key: _*).collect().toSeq ==
      want.select(colsInOrder.map(col): _*).sort(key: _*).collect().toSeq)
    assert(df.count() == 12)
    // corrupting a CHILD indirect block's entry table fails its checksum
    val bytes = Files.readAllBytes(Paths.get(f))
    var pos = indexOfSlice(bytes, "FHIB".getBytes) // root iblock
    val child = indexOfSlice(
      java.util.Arrays.copyOfRange(bytes, pos + 4, bytes.length), "FHIB".getBytes)
    assert(child > 0)
    val corrupt = bytes.clone()
    corrupt(pos + 4 + child + 20) = (corrupt(pos + 4 + child + 20) ^ 0x01).toByte
    val dir = Files.createTempDirectory("nc4deep")
    val p = dir.resolve("bad.nc")
    Files.write(p, corrupt, StandardOpenOption.CREATE)
    val ex = intercept[Exception] { nc(p.toString).count() }
    val msg = Option(ex.getMessage).getOrElse("")
    assert(msg.contains("checksum") || msg.contains("does not point back") ||
      msg.contains("offset"), s"got: $msg")
    // corrupting the depth-2 index's internal node fails loudly too
    val bpos = indexOfSlice(bytes, "BTIN".getBytes)
    assert(bpos > 0)
    val corrupt2 = bytes.clone()
    corrupt2(bpos + 7) = (corrupt2(bpos + 7) ^ 0x10).toByte
    val p2 = dir.resolve("bad2.nc")
    Files.write(p2, corrupt2, StandardOpenOption.CREATE)
    val ex2 = intercept[Exception] { nc(p2.toString).count() }
    assert(Option(ex2.getMessage).getOrElse("").contains("checksum") ||
      Option(ex2.getMessage).getOrElse("").contains("record count"),
      s"got: ${ex2.getMessage}")
  }

  test("huge and tiny fractal-heap objects: all four heap-ID classes decode") {
    // hugetiny4.nc (tools/make_netcdf4_hugetiny_fixture.py): managed +
    // TINY (in-ID link message) + HUGE-INDIRECT (type-1 v2 B-tree) links
    // in one padded-ID heap, plus a HUGE-DIRECT dense attribute
    // (address+length in the 17-byte ID) next to the load-bearing
    // managed DIMENSION_LIST
    val f = new File("data/netcdf/hugetiny4.nc").getAbsolutePath
    val expected = new File("data/netcdf/hugetiny4_expected.parquet").getAbsolutePath
    val df = nc(f, parts = 2)
    val want = spark.read.parquet(expected)
    assert(df.columns.sorted.toSeq == want.columns.sorted.toSeq,
      s"columns: ${df.columns.mkString(",")}")
    // the huge-linked variable surfaces as a real column
    assert(df.columns.contains("v_with_a_name_past_the_managed_cap"))
    val cols = want.columns.toSeq
    val got = df.select(cols.map(col): _*).sort(col("y"), col("x")).collect().toSeq
    val exp = want.select(cols.map(col): _*).sort(col("y"), col("x")).collect().toSeq
    assert(got == exp)

    val bytes = Files.readAllBytes(Paths.get(f))
    def patchedRead(mutate: Array[Byte] => Unit): Unit = {
      val b = bytes.clone()
      mutate(b)
      val dir = Files.createTempDirectory("nc4ht")
      val p = dir.resolve("bad.nc")
      Files.write(p, b, StandardOpenOption.CREATE)
      nc(p.toString).collect()
    }
    // corrupting the huge-object index leaf fails its lookup3 checksum
    val hleaf = indexOfSlice(bytes, "BTLF".getBytes) // first BTLF = huge index
    val e1 = intercept[Exception](patchedRead(b => b(hleaf + 8) = (b(hleaf + 8) ^ 0x1).toByte))
    assert(chain(e1).exists(m => m.contains("checksum") || m.contains("B-tree")), chain(e1).mkString("|"))
    // the tiny and huge IDs live inside the (checksummed) name-index
    // leaf — the SECOND BTLF in file order; to pin the ID-level rejects
    // (not just the checksum guard) the patch re-seals the leaf
    val nameLeaf = {
      val first = indexOfSlice(bytes, "BTLF".getBytes)
      first + 4 + indexOfSlice(bytes.drop(first + 4), "BTLF".getBytes)
    }
    val leafUsed = 6 + 6 * 17 // 6 records of (hash + 13-byte heap ID)
    def resealLeaf(b: Array[Byte]): Unit = {
      val c = Hdf5.lookup3(java.util.Arrays.copyOfRange(b, nameLeaf, nameLeaf + leafUsed), 0, leafUsed)
      b(nameLeaf + leafUsed) = c.toByte
      b(nameLeaf + leafUsed + 1) = (c >> 8).toByte
      b(nameLeaf + leafUsed + 2) = (c >> 16).toByte
      b(nameLeaf + leafUsed + 3) = (c >> 24).toByte
    }
    // flipping a tiny ID's length bits to 15 overruns the 13-byte ID: named reject
    val tinyFlag = nameLeaf + indexOfSlice(
      java.util.Arrays.copyOfRange(bytes, nameLeaf, nameLeaf + leafUsed + 4),
      Array[Byte](0x2B, 1)) // 0x20|11, then link-message version 1
    assert(tinyFlag > nameLeaf)
    val e2 = intercept[Exception](patchedRead { b => b(tinyFlag) = 0x2F; resealLeaf(b) })
    assert(chain(e2).exists(_.contains("tiny heap object")), chain(e2).mkString("|"))
    // pointing the huge ID at an absent B-tree key: named reject
    val hugeId = nameLeaf + indexOfSlice(
      java.util.Arrays.copyOfRange(bytes, nameLeaf, nameLeaf + leafUsed + 4),
      Array[Byte](0x10, 1, 0, 0, 0, 0, 0, 0, 0))
    assert(hugeId > nameLeaf)
    val e3 = intercept[Exception](patchedRead { b => b(hugeId + 1) = 9; resealLeaf(b) })
    assert(chain(e3).exists(_.contains("not in the huge-object index")), chain(e3).mkString("|"))
  }

  private def chain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  test("NC_STRING metadata: vlen NAME/CLASS resolve, vlen attrs tolerated, string VAR rejects") {
    // vlenstr4.nc (tools/make_netcdf4_vlenstr_fixture.py): the y scale's
    // load-bearing NAME/CLASS are VLEN strings resolved through the
    // global heap; the data var carries NC_STRING units/long_name the
    // reader must frame and skip (never misread the 16-byte descriptors
    // as text, never falsely reject the raster)
    val f = new File("data/netcdf/vlenstr4.nc").getAbsolutePath
    val df = nc(f, parts = 2)
    assert(df.columns.sorted.toSeq == Seq("discharge", "x", "y"))
    val want = spark.read.parquet(
      new File("data/netcdf/vlenstr4_expected.parquet").getAbsolutePath)
    val key = Seq(col("y"), col("x"))
    assert(df.sort(key: _*).collect().toSeq ==
      want.select(df.columns.map(col): _*).sort(key: _*).collect().toSeq)
    // vlen NAME actually resolved: y is the real named coordinate
    assert(df.select("y").distinct().count() == 5)
    // an NC_STRING DATA variable has no table-column mapping: loud reject
    val bad = new File("data/netcdf/strvar4.nc").getAbsolutePath
    val ex = intercept[Exception](nc(bad).collect())
    assert(chain(ex).exists(_.contains("datatype class 9")), chain(ex).mkString("|"))
  }

  test("chunkOrigins rejects cross-dim products that would wrap Long") {
    // four dims of 65536 chunks each: the product is 2^64 ≡ 0 in Long —
    // a post-hoc bound check would pass it and silently emit an EMPTY
    // chunk grid (implicit-layout data reads as all-fill); the bound is
    // re-checked inside the fold so the reject fires by name
    val ex = intercept[IllegalArgumentException] {
      Hdf5.chunkOrigins(Array.fill(4)(65536L * 8), Array.fill(4)(8))
    }
    assert(ex.getMessage.contains("walk bound"), ex.getMessage)
    // a legal grid still enumerates row-major with the last partial chunk
    val o = Hdf5.chunkOrigins(Array(20L, 9L), Array(8, 4))
    assert(o.length == 9)
    assert(o.head.toSeq == Seq(0L, 0L) && o.last.toSeq == Seq(16L, 8L))
  }

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
}
