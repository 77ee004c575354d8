package graft.llm

import java.io.{EOFException, InputStream, OutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{HadoopConf, SerializableHadoopConf}

/** WebDataset-style tar shards: the de-facto egress container of
  * large-scale training-data pipelines (sample = a group of tar members
  * sharing a key: `<key>.txt`, `<key>.json`, `<key>.jpg`, ...; corpus = a
  * directory of fixed-count tar shards consumed sequentially by data
  * loaders).
  *
  * The container is POSIX ustar written from the spec (512-byte headers,
  * octal fields, space-initialized checksum, two zero blocks as the
  * archive trailer) — no external tar library, same from-spec discipline
  * as the GRIB/NetCDF/WARC readers. Headers pin mtime=0 and fixed
  * owner fields so a shard's bytes are a pure function of its rows.
  *
  * Scale posture:
  *  - `write` is ONE hash shuffle of (key, payload) by shard id, then a
  *    streaming per-partition tar append — no driver collection, no
  *    in-memory shard buffering, O(row) memory. Shard count is the
  *    caller's parallel-unit choice (the WebDataset convention is
  *    ~1 GB/shard; at 100 TB that is ~100k shards, far beyond any
  *    driver bottleneck since shards are written where their rows land).
  *  - `read` plans one partition per shard file and streams each tar
  *    once — the loader-side access pattern.
  *  - member order inside a shard is sorted by key (sortWithinPartitions
  *    — a local sort, no extra exchange) so output bytes are
  *    deterministic under any input partitioning.
  *
  * `q_wds_roundtrip` pins the whole path against DuckDB recomputing the
  * same (doc_id, n_chars, md5) projection straight from the source
  * parquet — a true independent oracle: any framing, padding, encoding
  * or truncation bug breaks the hash.
  */
object WebDataset {

  /** Write `df`'s (idCol, textCol) as `nShards` tar shards under `dir`
    * (`shard-NNNNN.tar`), each sample = `<key>.txt` + `<key>.json` with
    * the key = zero-padded id. Returns the shard file names written.
    *
    * `binaryMembers` ships BINARY members next to the text pair — the
    * multimodal training-egress shape (`<key>.png`, `<key>.wav`, ...):
    * each `(payloadCol, extCol)` names a binary column and a string
    * column holding that row's member extension (pass a literal column
    * for a fixed modality). A NULL payload omits the member (sparse
    * modalities); a non-NULL payload requires a valid extension —
    * lowercase alphanumeric, not `txt`/`json` (those names belong to the
    * text pair, and a collision would corrupt the sample). Members of a
    * sample are written ADJACENT, sorted by member name, so the
    * WebDataset loader contract (sequential sample assembly) and
    * deterministic shard bytes both hold with any modality mix. */
  def write(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      nShards: Int,
      binaryMembers: Seq[(String, String)] = Nil): Seq[String] = {
    require(nShards > 0, "WebDataset.write: nShards must be positive")
    val conf = new SerializableHadoopConf(HadoopConf.session())
    val spark = df.sparkSession
    import spark.implicits._
    val binCols = binaryMembers.zipWithIndex.flatMap { case ((p, e), i) =>
      Seq(col(p).cast("binary").as(s"__bin$i"), col(e).cast("string").as(s"__ext$i"))
    }
    val nBin = binaryMembers.length
    val rows = df
      .select(Seq(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text")) ++ binCols: _*)
      .withColumn("shard", pmod(col("id"), lit(nShards.toLong)).cast("int"))
      // one exchange: every shard's rows land whole in one partition
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "id")
    rows.mapPartitions { it =>
      var fs: FileSystem = null
      var out: OutputStream = null
      var openShard = -1
      val written = scala.collection.mutable.ArrayBuffer.empty[String]
      def close(): Unit = if (out != null) {
        out.write(new Array[Byte](1024)) // two zero blocks: archive end
        out.close()
        out = null
      }
      it.foreach { row =>
        val id = row.getLong(0)
        val text = row.getString(1)
        val shard = row.getInt(2 + 2 * nBin)
        require(text != null, s"WebDataset.write: NULL $textCol for id=$id")
        if (shard != openShard) {
          close()
          val p = new Path(dir, f"shard-$shard%05d.tar")
          if (fs == null) fs = FileSystem.get(p.toUri, conf.value)
          out = fs.create(p, true)
          openShard = shard
          written += p.getName
        }
        val key = f"$id%09d"
        val textBytes = text.getBytes("UTF-8")
        val json = s"""{"doc_id":$id,"n_bytes":${textBytes.length}}"""
        val members = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])](
          s"$key.json" -> json.getBytes("UTF-8"),
          s"$key.txt" -> textBytes)
        var i = 0
        while (i < nBin) {
          val payload = row.getAs[Array[Byte]](2 + 2 * i)
          if (payload != null) {
            val ext = row.getString(3 + 2 * i)
            require(ext != null && ext.nonEmpty && ext.forall(c =>
              (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')),
              s"WebDataset.write: invalid extension '$ext' for id=$id " +
                s"(column ${binaryMembers(i)._2}; lowercase alphanumeric only)")
            require(ext != "txt" && ext != "json",
              s"WebDataset.write: extension '$ext' for id=$id collides with " +
                "the sample's text/json members")
            members += s"$key.$ext" -> payload
          }
          i += 1
        }
        members.sortBy(_._1).foreach { case (name, data) =>
          writeMember(out, name, data)
        }
      }
      close()
      written.iterator
    }(Encoders.STRING).collect().toSeq.sorted
  }

  /** One ustar member: 512-byte header + payload padded to 512. */
  private def writeMember(out: OutputStream, name: String, data: Array[Byte]): Unit = {
    require(name.getBytes("UTF-8").length <= 100, s"ustar name too long: $name")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644") // mode, NUL-terminated by the zero fill
    put(108, "0000000") // uid
    put(116, "0000000") // gid
    put(124, f"${data.length}%011o") // size
    put(136, "00000000000") // mtime = 0: deterministic bytes
    put(148, "        ") // chksum: spaces while summing (ustar rule)
    h(156) = '0' // typeflag: regular file
    put(257, "ustar")
    h(262) = 0
    put(263, "00") // version
    put(265, "graft") // uname
    put(297, "graft") // gname
    var sum = 0
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    put(148, f"$sum%06o")
    h(154) = 0
    h(155) = ' '
    out.write(h)
    out.write(data)
    val pad = (512 - data.length % 512) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** Read every `*.tar` under `dir`: one partition per shard file, one
    * row per member — (shard_file, name, size, content). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf0 = HadoopConf.session()
    val base = new Path(dir)
    val fs = FileSystem.get(base.toUri, conf0)
    val files = fs.listStatus(base).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".tar"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"WebDataset.read: no .tar shards under $dir")
    val conf = new SerializableHadoopConf(conf0)
    import spark.implicits._
    val ds: Dataset[String] =
      spark.createDataset(files)(Encoders.STRING).repartition(files.length)
    ds.flatMap { file =>
      val p = new Path(file)
      val in = FileSystem.get(p.toUri, conf.value).open(p)
      val shardName = p.getName
      new Iterator[(String, String, Long, Array[Byte])] {
        private var nextMember: (String, String, Long, Array[Byte]) = fetch()
        private def readFully(b: Array[Byte]): Boolean = {
          var off = 0
          while (off < b.length) {
            val r = in.read(b, off, b.length - off)
            if (r < 0) {
              if (off == 0) return false
              throw new EOFException(s"WebDataset.read: truncated header in $file")
            }
            off += r
          }
          true
        }
        private def fetch(): (String, String, Long, Array[Byte]) = {
          val h = new Array[Byte](512)
          if (!readFully(h) || h.forall(_ == 0)) { in.close(); return null }
          val name = cstr(h, 0, 100)
          val size = java.lang.Long.parseLong(cstr(h, 124, 12).trim, 8)
          require(size <= Int.MaxValue, s"WebDataset.read: oversized member $name")
          verifyChecksum(h, file, name)
          val data = new Array[Byte](size.toInt)
          if (!readFully(data) && size > 0)
            throw new EOFException(s"WebDataset.read: truncated member $name in $file")
          val pad = ((512 - size % 512) % 512).toInt
          if (pad > 0 && !readFully(new Array[Byte](pad)))
            throw new EOFException(s"WebDataset.read: truncated padding in $file")
          (shardName, name, size, data)
        }
        override def hasNext: Boolean = nextMember != null
        override def next(): (String, String, Long, Array[Byte]) = {
          val m = nextMember
          nextMember = fetch()
          m
        }
      }
    }.toDF("shard_file", "name", "size", "content")
  }

  /** Loader-side SAMPLE view: members grouped by their key (the name up
    * to the first '.'), one row per sample with a `parts` map of
    * extension → content — the unit a WebDataset data loader consumes.
    * Grouping happens WITHIN each shard partition (the write contract
    * keeps a sample's members adjacent in one shard), so no shuffle:
    * one pass per shard, `groupBy` over shard-local rows via
    * map-side-complete aggregation on (shard, key). */
  def readSamples(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, dir)
      .withColumn("key", substring_index(col("name"), ".", 1))
      .withColumn("ext", expr("substring(name, length(key) + 2)"))
      .groupBy(col("shard_file"), col("key"))
      .agg(map_from_entries(collect_list(struct(col("ext"), col("content"))))
        .as("parts"))
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, "US-ASCII")
  }

  private def verifyChecksum(h: Array[Byte], file: String, name: String): Unit = {
    val stored = Integer.parseInt(cstr(h, 148, 8).trim, 8)
    var sum = 0
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' ' else h(i) & 0xff)
      i += 1
    }
    require(sum == stored,
      s"WebDataset.read: header checksum mismatch for $name in $file ($sum != $stored)")
  }
}
