package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming snapshot maintenance: batch-equivalence and rerun safety. */
class SnapshotStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("payload", StringType),
    StructField("version", LongType),
    StructField("deleted", BooleanType)))

  private def writeBatch(dir: String, name: String, rows: Seq[(Long, String, Long, Boolean)]): Unit =
    rows.toDF("id", "payload", "version", "deleted")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/$name")

  private def runStream(updatesDir: String, snapshot: String, checkpoint: String): Unit = {
    val q = SnapshotStream.mergeSink(
      SnapshotStream.readUpdates(spark, schema, s"$updatesDir/*"),
      snapshot, checkpoint, "id", "version", Some("deleted")).start()
    q.awaitTermination()
  }

  private def snapshotRows(snapshot: String): Map[Long, (String, Long)] =
    SnapshotStream.readSnapshot(spark, snapshot, Some("deleted"))
      .as[(Long, String, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("stream of update batches lands as the batch merge; rerun is a no-op") {
    val root = Files.createTempDirectory("snapstream").toString
    val (updates, snapshot, checkpoint) = (s"$root/updates", s"$root/snap", s"$root/ckpt")
    writeBatch(updates, "b0", Seq(
      (1L, "a", 1L, false), (2L, "b", 1L, false), (3L, "c", 1L, false)))
    runStream(updates, snapshot, checkpoint)
    assert(snapshotRows(snapshot) ==
      Map(1L -> (("a", 1L)), 2L -> (("b", 1L)), 3L -> (("c", 1L))))

    // second drop: update 1, tombstone 3, insert 9, stale duplicate of 2
    writeBatch(updates, "b1", Seq(
      (1L, "a2", 2L, false), (3L, "c", 2L, true),
      (9L, "new", 1L, false), (2L, "b-stale", 0L, false)))
    runStream(updates, snapshot, checkpoint)
    val afterB1 = Map(1L -> (("a2", 2L)), 2L -> (("b", 1L)), 9L -> (("new", 1L)))
    assert(snapshotRows(snapshot) == afterB1)

    // rerun with the same checkpoint: file source replays nothing
    runStream(updates, snapshot, checkpoint)
    assert(snapshotRows(snapshot) == afterB1)

    // crash-replay safety: merging batch b1 AGAIN (fresh checkpoint, as if
    // the checkpoint commit was lost after the swap) converges to the same
    // snapshot — latest-wins with update-ties is idempotent
    val replay = s"$root/ckpt2"
    runStream(updates, snapshot, replay)
    assert(snapshotRows(snapshot) == afterB1)

    // cross-batch tombstone durability: a stale insert for deleted key 3
    // arriving in a LATER batch must lose to the retained tombstone
    writeBatch(updates, "b2", Seq((3L, "c-stale", 1L, false)))
    runStream(updates, snapshot, checkpoint)
    assert(snapshotRows(snapshot) == afterB1)
    // the tombstone row is physically retained (read filters it)...
    assert(spark.read.parquet(snapshot).filter(col("deleted")).count() == 1)
    // ...until compaction reclaims it past the version watermark
    val compacted = graft.operators.SnapshotMerge.compactTombstones(
      spark.read.parquet(snapshot), "version", "deleted", versionWatermark = 2L)
    assert(compacted.filter(col("deleted")).count() == 0)
    assert(compacted.count() == 3)
  }

  test("crash between delete and rename self-heals from committed staging") {
    val root = Files.createTempDirectory("snapswap").toString
    val (updates, snapshot, checkpoint) = (s"$root/updates", s"$root/snap", s"$root/ckpt")
    writeBatch(updates, "b0", Seq((1L, "a", 1L, false), (2L, "b", 1L, false)))
    runStream(updates, snapshot, checkpoint)
    // simulate the crash window: snapshot deleted, committed staging left
    val conf = spark.sparkContext.hadoopConfiguration
    val snapPath = new org.apache.hadoop.fs.Path(snapshot)
    val fs = snapPath.getFileSystem(conf)
    val staging = new org.apache.hadoop.fs.Path(s"$snapshot.staging")
    fs.rename(snapPath, staging) // staging carries _SUCCESS from the write
    assert(!fs.exists(snapPath))
    writeBatch(updates, "b1", Seq((9L, "new", 1L, false)))
    runStream(updates, snapshot, checkpoint)
    // recovery finished the swap first, so keys 1 and 2 survived
    assert(snapshotRows(snapshot) ==
      Map(1L -> (("a", 1L)), 2L -> (("b", 1L)), 9L -> (("new", 1L))))
    assert(!fs.exists(staging)) // staging was consumed by the swap
  }
}
