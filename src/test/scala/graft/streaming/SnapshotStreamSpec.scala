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

  private def runBucketedStream(updatesDir: String, snapshot: String,
      checkpoint: String, numBuckets: Int): Unit = {
    val q = SnapshotStream.bucketedMergeSink(
      SnapshotStream.readUpdates(spark, schema, s"$updatesDir/*"),
      snapshot, checkpoint, "id", "version", numBuckets, Some("deleted")).start()
    q.awaitTermination()
  }

  private def bucketedRows(snapshot: String): Map[Long, (String, Long)] =
    SnapshotStream.readBucketedSnapshot(spark, snapshot, Some("deleted"))
      .as[(Long, String, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap

  /** Parquet file names under each `__bucket=` dir — the identity of a
    * bucket's physical contents. */
  private def bucketFiles(snapshot: String): Map[String, Set[String]] = {
    val root = new java.io.File(snapshot)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
      .map(d => d.getName -> d.listFiles().map(_.getName)
        .filter(_.endsWith(".parquet")).toSet).toMap
  }

  test("bucketed merge matches the flat merge and rewrites only touched buckets") {
    val root = Files.createTempDirectory("snapbucket").toString
    val (updates, snapshot, checkpoint) = (s"$root/updates", s"$root/snap", s"$root/ckpt")
    val numBuckets = 8
    // ids 1..20 spread across several buckets
    writeBatch(updates, "b0", (1L to 20L).map(i => (i, s"p$i", 1L, false)))
    runBucketedStream(updates, snapshot, checkpoint, numBuckets)
    assert(bucketedRows(snapshot) ==
      (1L to 20L).map(i => i -> ((s"p$i", 1L))).toMap)
    val before = bucketFiles(snapshot)
    assert(before.size > 1, s"want multiple buckets, got ${before.keySet}")

    // single-key batch: update key 7, tombstone nothing else
    writeBatch(updates, "b1", Seq((7L, "p7v2", 2L, false)))
    runBucketedStream(updates, snapshot, checkpoint, numBuckets)
    val after = bucketFiles(snapshot)
    val touchedBucket = "__bucket=" + java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(7L, org.apache.spark.sql.types.LongType, 42L).toInt, numBuckets)
    // every untouched bucket kept its exact files; only the touched one changed
    (before.keySet - touchedBucket).foreach { b =>
      assert(after(b) == before(b), s"untouched bucket $b was rewritten")
    }
    assert(after(touchedBucket) != before(touchedBucket),
      s"touched bucket $touchedBucket was not rewritten")
    val expect = (1L to 20L).map(i => i -> ((s"p$i", 1L))).toMap + (7L -> (("p7v2", 2L)))
    assert(bucketedRows(snapshot) == expect)

    // tombstone + stale-insert durability through the bucketed path
    writeBatch(updates, "b2", Seq((7L, "p7v2", 3L, true)))
    runBucketedStream(updates, snapshot, checkpoint, numBuckets)
    writeBatch(updates, "b3", Seq((7L, "p7-stale", 2L, false)))
    runBucketedStream(updates, snapshot, checkpoint, numBuckets)
    assert(bucketedRows(snapshot) == expect - 7L)
  }

  test("bucketed merge self-heals a crash mid-swap from committed staging") {
    val root = Files.createTempDirectory("snapbucketcrash").toString
    val (updates, snapshot, checkpoint) = (s"$root/updates", s"$root/snap", s"$root/ckpt")
    writeBatch(updates, "b0", (1L to 20L).map(i => (i, s"p$i", 1L, false)))
    runBucketedStream(updates, snapshot, checkpoint, 8)
    // simulate a crash after staging committed but before ANY bucket
    // swapped: move one live bucket back into a staging dir with _SUCCESS
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(snapshot).getFileSystem(conf)
    val staging = new org.apache.hadoop.fs.Path(s"$snapshot.staging")
    fs.mkdirs(staging)
    val someBucket = bucketFiles(snapshot).keySet.head
    fs.rename(new org.apache.hadoop.fs.Path(s"$snapshot/$someBucket"),
      new org.apache.hadoop.fs.Path(staging, someBucket))
    fs.create(new org.apache.hadoop.fs.Path(staging, "_SUCCESS")).close()
    // next batch recovers the swap first, so no key is lost
    writeBatch(updates, "b1", Seq((21L, "new", 1L, false)))
    runBucketedStream(updates, snapshot, checkpoint, 8)
    assert(bucketedRows(snapshot) ==
      (1L to 21L).map(i => i -> (((if (i == 21L) "new" else s"p$i"), 1L))).toMap)
    assert(!fs.exists(staging))
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
