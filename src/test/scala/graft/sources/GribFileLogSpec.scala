package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Model-based fuzz of the compacted seen-file log: random admission
  * sequences with restarts, compactions, expiry, and interval-change
  * attempts must always agree with a trivial in-memory model of the
  * semantics ([[GribFileLog]]'s contract with the stream):
  *
  *  - `seenUpTo(latest)` returns every admitted entry, minus entries
  *    dropped by expiry AT SNAPSHOT POINTS only (deltas never drop);
  *  - `filesForBatch(id)` replays exactly the admitted set for any id
  *    within one compact generation of the head (what restart replay of
  *    an uncommitted WAL batch can ask for);
  *  - a new instance over the same directory (query restart) sees the
  *    identical state, even when CONFIGURED with a different compact
  *    interval (the persisted one governs the layout). */
class GribFileLogSpec extends AnyFunSuite {

  private val conf = new SerializableHadoopConf(new Configuration())

  test("random admission/restart/expiry sequences match the in-memory model") {
    val rnd = new Random(20260813L)
    (0 until 8).foreach { round =>
      val dir = Files.createTempDirectory(s"fileloglog$round")
      val interval = 1 + rnd.nextInt(4)
      def open(configured: Int) =
        new GribFileLog(new Path(dir.toString, "filelog"), conf, configured)
      var log = open(interval)

      var model = Vector.empty[GribFileEntry] // what seenUpTo(latest) must return
      val admittedAt = scala.collection.mutable.Map.empty[Long, Seq[GribFileEntry]]
      var cutoff = Long.MinValue
      def isCompact(id: Long): Boolean = (id + 1) % interval == 0

      val batches = 6 + rnd.nextInt(10)
      (0L until batches).foreach { id =>
        // cutoff only ever grows (latestOffset derives it from a running max)
        if (rnd.nextInt(3) == 0) cutoff = math.max(cutoff, id * 100 - 150)
        val entries = (0 until 1 + rnd.nextInt(4)).map(i =>
          GribFileEntry(s"day$id/file$i.grib2", id * 100 + rnd.nextInt(100), id))
        log.add(id, entries, cutoff)
        admittedAt(id) = entries
        model =
          if (isCompact(id) && cutoff > Long.MinValue)
            (model ++ entries).filter(e => e.modTime >= cutoff || e.batchId == id)
          else model ++ entries

        assert(log.seenUpTo(id).toSet == model.toSet,
          s"round $round batch $id (interval $interval, cutoff $cutoff)")
        // replay window: every batch within one compact generation of the
        // head must reproduce its admitted set exactly
        ((id - interval + 1).max(0L) to id).foreach { rid =>
          assert(log.filesForBatch(rid).toSet == admittedAt(rid).toSet,
            s"round $round replay of batch $rid at head $id")
        }
        // occasional restart, sometimes configured with a WRONG interval —
        // the persisted one must govern
        if (rnd.nextInt(4) == 0)
          log = open(if (rnd.nextBoolean()) interval else 1 + rnd.nextInt(6))
      }
      // final restart sees the same world
      assert(open(1 + rnd.nextInt(6)).seenUpTo(batches - 1).toSet == model.toSet)
    }
  }

  test("soak: the log stays bounded across many compaction generations and restarts") {
    // A long-lived stream (years of daily drops) must keep the side-log at
    // one snapshot + one compact generation of deltas — NOT grow with
    // files-ever-seen — across restarts landing both ON and OFF compaction
    // boundaries. 48 batches at interval 4 = 12 generations; a restart
    // before every batch whose id is 0 mod 3 hits ids 3,7,11,… (on the
    // boundary: isCompact(id) ⇔ (id+1)%4==0) as well as off-boundary ids.
    val dir = Files.createTempDirectory("fileloglong")
    val interval = 4
    def open() = new GribFileLog(new Path(dir.toString, "filelog"), conf, interval)
    var log = open()
    val admittedAt = scala.collection.mutable.Map.empty[Long, Seq[GribFileEntry]]
    var seen = Vector.empty[GribFileEntry]
    val batches = 48L
    (0L until batches).foreach { id =>
      if (id % 3 == 0) log = open() // restart (cold instance, same dir)
      val entries = (0 until 3).map(i => GribFileEntry(s"d$id/f$i.grib2", id, id))
      log.add(id, entries, Long.MinValue)
      admittedAt(id) = entries
      seen ++= entries

      // size bound: ids on disk never exceed snapshot + one generation of
      // deltas behind it + the deltas accumulated since (≤ 2·interval + 1)
      val ids = log.listIds()
      assert(ids.size <= 2 * interval + 1,
        s"log grew to ${ids.size} files at batch $id: ${ids.mkString(", ")}")
      // and the physical directory carries only those + _meta
      val fs = org.apache.hadoop.fs.FileSystem.get(conf.value)
      val onDisk = fs.listStatus(new Path(dir.toString, "filelog"))
        .map(_.getPath.getName).filterNot(_.startsWith("."))
      assert(onDisk.length <= ids.size + 1, s"stray files: ${onDisk.mkString(", ")}")

      // full-state correctness survives every generation + restart
      assert(log.seenUpTo(id).toSet == seen.toSet, s"seen set at batch $id")
      // replay window: one compact generation back is always answerable
      ((id - interval + 1).max(0L) to id).foreach { rid =>
        assert(log.filesForBatch(rid).toSet == admittedAt(rid).toSet,
          s"replay of $rid at head $id")
      }
    }
    // a pre-retention batch is gone — and says so with context, not a raw FNF
    val e = intercept[IllegalStateException](log.filesForBatch(0L))
    assert(e.getMessage.contains("retention"))
  }

  test("seenUpTo fails loudly on a hole in the log") {
    val dir = Files.createTempDirectory("fileloghole")
    val log = new GribFileLog(new Path(dir.toString, "filelog"), conf, 10)
    log.add(0, Seq(GribFileEntry("a", 1, 0)), Long.MinValue)
    log.add(1, Seq(GribFileEntry("b", 2, 1)), Long.MinValue)
    // delete batch 0's delta out from under it (checkpoint corruption)
    val fs = org.apache.hadoop.fs.FileSystem.get(conf.value)
    fs.delete(new Path(dir.toString, "filelog/0"), false)
    val e = intercept[IllegalArgumentException](log.seenUpTo(1))
    assert(e.getMessage.contains("not contiguous"))
  }
}
