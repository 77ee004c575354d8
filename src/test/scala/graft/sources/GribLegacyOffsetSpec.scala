package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Checkpoint migration from the pre-side-log offset format (each offset a
  * bare JSON array of every file path ever seen) to the batch-id + side-log
  * model: a version upgrade must resume the stream IN PLACE — same
  * checkpoint directory, no re-ingest of files already delivered to the
  * sink, and exact replay of a batch the old version WAL-logged but never
  * committed. The engine restores one or two legacy offsets at restart in
  * either order; both orders are pinned here against the stream's actual
  * `deserializeOffset`. */
class GribLegacyOffsetSpec extends SparkSpec {

  private val fixture = new File("data/grib/forecast.grib2").getAbsolutePath
  private val conf = new SerializableHadoopConf(new Configuration())

  private def legacyJson(paths: Seq[String]): String =
    paths.sorted.map(p => "\"" + p + "\"").mkString("[", ",", "]")

  /** Fresh drop dir with `names` copies of the fixture + a stream over it;
    * returns (stream, checkpoint dir, resolved paths by name). Paths carry
    * the `file:` scheme — the form the OLD version's offsets stored (its
    * listing used the same Hadoop `FileStatus.getPath.toString`), which is
    * what the seen-set match against a fresh listing relies on. */
  private def mkStream(names: Seq[String], compactInterval: Int = 10) = {
    val dir = Files.createTempDirectory("griblegacy")
    val paths = names.map { n =>
      "file:" + Files.copy(Paths.get(fixture), dir.resolve(n)).toString
    }
    val checkpoint = Files.createTempDirectory("griblegacyckpt").toString
    val spec = GribSpec(s"$dir/*.grib2", 2, 0, 0L,
      ignoreMissingFiles = false, compactInterval, conf)
    val stream = new GribMicroBatchStream(
      spec, Nil, GribCol.ordinals(GribSource.Schema), checkpoint)
    (stream, checkpoint, names.zip(paths).toMap, dir)
  }

  private def logAt(checkpoint: String) =
    new GribFileLog(new Path(checkpoint, "filelog"), conf, 10)

  test("end-then-start restore (uncommitted last batch) replays exactly the tail") {
    val (stream, ckpt, p, _) = mkStream(Seq("a.grib2", "b.grib2", "c.grib2"))
    // the engine restores the latest WAL entry (END of the uncommitted
    // batch: a,b,c) first, then the previous one (committed START: a,b)
    val end = stream.deserializeOffset(legacyJson(Seq(p("a.grib2"), p("b.grib2"), p("c.grib2"))))
    val start = stream.deserializeOffset(legacyJson(Seq(p("a.grib2"), p("b.grib2"))))
    assert(start.asInstanceOf[GribStreamOffset].batchId <
      end.asInstanceOf[GribStreamOffset].batchId)

    // the side-log now holds the committed prefix as one batch and the
    // uncommitted tail as the next
    val log = logAt(ckpt)
    val startId = start.asInstanceOf[GribStreamOffset].batchId
    val endId = end.asInstanceOf[GribStreamOffset].batchId
    assert(log.seenUpTo(startId).map(_.path).toSet ===
      Set(p("a.grib2"), p("b.grib2")))
    assert(log.seenUpTo(endId).map(_.path).toSet === p.values.toSet)

    // replay of (start, end] must read exactly the tail file — and decode it
    val parts = stream.planInputPartitions(start, end)
    assert(parts.nonEmpty)
    assert(log.filesForBatch(endId).map(_.path) === Seq(p("c.grib2")))

    // idempotent re-parse: the same legacy strings map to the same ids
    assert(stream.deserializeOffset(
      legacyJson(Seq(p("a.grib2"), p("b.grib2")))) === start)
    assert(stream.deserializeOffset(
      legacyJson(Seq(p("a.grib2"), p("b.grib2"), p("c.grib2")))) === end)
  }

  test("start-then-end restore appends the tail as the next batch") {
    val (stream, ckpt, p, _) = mkStream(Seq("a.grib2", "b.grib2", "c.grib2"))
    val start = stream.deserializeOffset(legacyJson(Seq(p("a.grib2"), p("b.grib2"))))
    val end = stream.deserializeOffset(
      legacyJson(Seq(p("a.grib2"), p("b.grib2"), p("c.grib2"))))
    val startId = start.asInstanceOf[GribStreamOffset].batchId
    val endId = end.asInstanceOf[GribStreamOffset].batchId
    assert(startId < endId)
    val log = logAt(ckpt)
    assert(log.filesForBatch(endId).map(_.path) === Seq(p("c.grib2")))
    assert(stream.planInputPartitions(start, end).nonEmpty)
  }

  test("committed-only restore: migrated seen set is never re-ingested, new files flow") {
    val (stream, ckpt, p, dir) = mkStream(Seq("a.grib2", "b.grib2"))
    val off = stream.deserializeOffset(legacyJson(Seq(p("a.grib2"), p("b.grib2"))))
    val offId = off.asInstanceOf[GribStreamOffset].batchId

    // a new drop lands; the next admission must contain ONLY it
    val d = "file:" + Files.copy(Paths.get(fixture), dir.resolve("d.grib2")).toString
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val next = stream.latestOffset(off, ReadLimit.allAvailable())
    val nextId = next.asInstanceOf[GribStreamOffset].batchId
    assert(nextId === offId + 1)
    assert(logAt(ckpt).filesForBatch(nextId).map(_.path) === Seq(d))
  }

  test("crash between marker and seed: restart re-seeds instead of dying on an empty log") {
    val (stream, ckpt, p, _) = mkStream(Seq("a.grib2", "b.grib2"))
    // simulate the torn state: the marker landed, the seed batches did not
    logAt(ckpt).markLegacyMigrated()
    val off = stream.deserializeOffset(legacyJson(Seq(p("a.grib2"), p("b.grib2"))))
    val id = off.asInstanceOf[GribStreamOffset].batchId
    assert(logAt(ckpt).seenUpTo(id).map(_.path).toSet === p.values.toSet)
  }

  test("crash mid-split: restart completes the torn split, replay stays exactly the tail") {
    // torn state rewriteMigrationSplit can leave: batch 0 already holds the
    // committed prefix, batch 1 STILL holds the full legacy list — a naive
    // restart would replay (0, 1] as the full list and re-ingest the prefix
    val (stream, ckpt, p, _) = mkStream(Seq("a.grib2", "b.grib2", "c.grib2"))
    val log = logAt(ckpt)
    log.markLegacyMigrated()
    log.add(0L, Seq(p("a.grib2"), p("b.grib2")).sorted.map(GribFileEntry(_, 1L, 0L)),
      Long.MinValue)
    log.add(1L, p.values.toSeq.sorted.map(GribFileEntry(_, 1L, 1L)), Long.MinValue)

    val end = stream.deserializeOffset(
      legacyJson(Seq(p("a.grib2"), p("b.grib2"), p("c.grib2"))))
    val start = stream.deserializeOffset(legacyJson(Seq(p("a.grib2"), p("b.grib2"))))
    assert(start === GribStreamOffset(0L) && end === GribStreamOffset(1L))
    // the repair rewrote batch 1 down to the uncommitted tail
    assert(logAt(ckpt).filesForBatch(1L).map(_.path) === Seq(p("c.grib2")))
    assert(stream.planInputPartitions(start, end).nonEmpty)
  }

  test("crash mid-overwrite of batch 0: restart restores the seed layout and still splits") {
    // local-FS overwrite is delete+rename; a crash between them during the
    // split leaves ONLY the full-list batch 1 — previously seenUpTo(1)'s
    // contiguity check bricked the checkpoint on every restart
    val (stream, ckpt, p, _) = mkStream(Seq("a.grib2", "b.grib2", "c.grib2"))
    val log = logAt(ckpt)
    log.markLegacyMigrated()
    log.add(1L, p.values.toSeq.sorted.map(GribFileEntry(_, 1L, 1L)), Long.MinValue)

    val end = stream.deserializeOffset(
      legacyJson(Seq(p("a.grib2"), p("b.grib2"), p("c.grib2"))))
    val start = stream.deserializeOffset(legacyJson(Seq(p("a.grib2"), p("b.grib2"))))
    assert(start === GribStreamOffset(0L) && end === GribStreamOffset(1L))
    assert(logAt(ckpt).filesForBatch(1L).map(_.path) === Seq(p("c.grib2")))
    assert(stream.planInputPartitions(start, end).nonEmpty)
  }

  test("a legacy offset against an existing batch-id log fails loudly") {
    val (stream, _, p, _) = mkStream(Seq("a.grib2"))
    // normal (new-format) operation first: admit a real batch
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    stream.latestOffset(GribStreamOffset(-1L), ReadLimit.allAvailable())
    val e = intercept[IllegalArgumentException](
      stream.deserializeOffset(legacyJson(Seq(p("a.grib2")))))
    assert(e.getMessage.contains("batch-id file log"))
  }

  test("a legacy offset that matches no prefix of the migrated log fails loudly") {
    val (stream, _, p, _) = mkStream(Seq("a.grib2", "b.grib2", "c.grib2"))
    stream.deserializeOffset(legacyJson(Seq(p("a.grib2"), p("b.grib2"))))
    stream.deserializeOffset(
      legacyJson(Seq(p("a.grib2"), p("b.grib2"), p("c.grib2"))))
    // neither a prefix nor an extension of what was migrated
    val e = intercept[IllegalStateException](
      stream.deserializeOffset(legacyJson(Seq(p("c.grib2")))))
    assert(e.getMessage.contains("does not align"))
  }

  test("partitionByStep on readStream is rejected loudly") {
    val dir = Files.createTempDirectory("gribstep")
    Files.copy(Paths.get(fixture), dir.resolve("a.grib2"))
    val q = spark.readStream
      .format(classOf[GribSource].getName)
      .option("path", s"$dir/*.grib2")
      .option("partitionByStep", "true")
      .load()
      .writeStream
      .format("memory").queryName("stepstream").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("stepckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    assert(e.getMessage.contains("partitionByStep") ||
      Option(e.getCause).exists(_.getMessage.contains("partitionByStep")))
  }
}
