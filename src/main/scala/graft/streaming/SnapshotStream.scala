package graft.streaming

import graft.operators.SnapshotMerge
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming snapshot maintenance: a file-source stream of update batches
  * continuously merged into a Parquet snapshot with
  * [[SnapshotMerge.merge]] — the CDC-ingest shape (upserts + tombstones
  * flowing into a queryable table) without any table format.
  *
  * Each micro-batch runs one latest-wins merge of (current snapshot ∪
  * batch) and swaps the snapshot directory via a crash-recoverable
  * two-step: write the merge to `<path>.staging` (committed by the
  * writer's `_SUCCESS` marker), delete the old snapshot, rename staging
  * into place. The rename is a metadata move, so the only crash window
  * that leaves no snapshot is delete→rename — and that state is
  * self-healing: the next batch finds the committed staging dir, finishes
  * the rename, and re-merges idempotently (ties go to the update, so a
  * re-delivered batch lands on the same result — the rerun-safety spec
  * pins this). An *uncommitted* staging dir (no `_SUCCESS`) is discarded.
  *
  * Tombstones are RETAINED in the snapshot files and filtered at read
  * time ([[readSnapshot]]): dropping them at merge time would let a stale
  * insert for a deleted key, arriving in a later batch, resurrect the key
  * (the deleted key would simply be absent and the insert would win).
  * Reclaim old tombstones periodically with
  * [[SnapshotMerge.compactTombstones]].
  *
  * Scale posture: [[mergeSink]]'s snapshot rewrite is O(snapshot) per
  * trigger, the right trade for daily/hourly corpus maintenance (the
  * reference's own cadence, cf. the `newest/` overwrite target,
  * glofas-forecast-computation.py:252); for sub-minute CDC on a large
  * snapshot use [[bucketedMergeSink]], which hash-partitions the snapshot
  * by key and rewrites only the buckets a batch touches — same merge,
  * narrower scope.
  */
object SnapshotStream {

  /** File-source stream of update batches (explicit schema, as all
    * streaming reads require). */
  def readUpdates(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Live rows of a snapshot maintained by [[mergeSink]]: tombstone rows
    * are physically present (see class doc) and filtered out here. */
  def readSnapshot(
      spark: SparkSession,
      snapshotPath: String,
      deletedCol: Option[String] = None): DataFrame = {
    val df = spark.read.parquet(snapshotPath)
    deletedCol.fold(df)(d => df.filter(!coalesce(col(d), lit(false))))
  }

  /** Merge each micro-batch into the snapshot at `snapshotPath`.
    * `.start()` to run; `Trigger.AvailableNow` catches up and stops. */
  def mergeSink(
      updates: DataFrame,
      snapshotPath: String,
      checkpointDir: String,
      keyCol: String,
      versionCol: String,
      deletedCol: Option[String] = None): DataStreamWriter[Row] =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val snap = new Path(snapshotPath)
        val staging = new Path(s"$snapshotPath.staging")
        val fs = snap.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // crash recovery: a crash between the delete and the rename below
        // leaves a COMMITTED staging dir and no snapshot — finish that
        // swap, then merge this batch on top (idempotent if it was the
        // same batch that crashed)
        if (!fs.exists(snap) && fs.exists(new Path(staging, "_SUCCESS")) &&
            !fs.rename(staging, snap))
          // proceeding would merge against an empty snapshot and then
          // overwrite staging — destroying the only surviving copy
          throw new java.io.IOException(
            s"SnapshotStream: recovery failed to move $staging into place at $snapshotPath")
        // First batch ⇒ no snapshot yet: fall back to empty ONLY when the
        // path genuinely doesn't exist. Any other read failure (corrupt
        // footer, permissions, transient FS error) must abort the batch —
        // swallowing it would merge against empty and wipe the snapshot.
        val current =
          if (fs.exists(snap)) spark.read.parquet(snapshotPath)
          else batch.limit(0)
        val merged = SnapshotMerge.merge(current, batch, keyCol, versionCol,
          deletedCol, retainTombstones = deletedCol.isDefined)
        // two-step swap: the merge plan reads the snapshot it replaces,
        // so the result must land beside it first. overwrite clears any
        // uncommitted staging leftover from a crashed write.
        merged.write.mode("overwrite").parquet(staging.toString)
        fs.delete(snap, true)
        if (!fs.rename(staging, snap))
          throw new java.io.IOException(
            s"SnapshotStream: failed to move $staging into place at $snapshotPath")
      }

  /** Partition directory column for bucketed snapshots: `pmod(hash(key),
    * numBuckets)`, materialized as a hive partition so readers prune and
    * the merge rewrites per-directory. */
  val BucketCol = "__bucket"

  /** Bucketed [[mergeSink]]: the snapshot lives as `__bucket=<i>/` hive
    * partitions (hash of the key mod `numBuckets`) and each micro-batch
    * rewrites ONLY the buckets its keys hash into — O(touched buckets)
    * instead of O(snapshot) per trigger, which is what sub-minute CDC on a
    * large snapshot needs (a one-key batch rewrites one directory; the
    * class doc's whole-snapshot variant stays the right call for
    * daily-cadence full refreshes).
    *
    * Same crash-recoverable two-step as [[mergeSink]], scoped per bucket:
    * all touched buckets are merged and written to `<path>.staging`
    * (committed by `_SUCCESS`), then swapped directory-by-directory. A
    * crash mid-swap leaves a committed staging whose remaining bucket dirs
    * the next batch moves into place before merging (idempotent if the
    * crashed batch is re-delivered); an uncommitted staging is discarded.
    *
    * `numBuckets` must stay constant for the life of a snapshot (it
    * defines the key→directory placement). Read live rows back with
    * [[readBucketedSnapshot]].
    */
  def bucketedMergeSink(
      updates: DataFrame,
      snapshotPath: String,
      checkpointDir: String,
      keyCol: String,
      versionCol: String,
      numBuckets: Int,
      deletedCol: Option[String] = None): DataStreamWriter[Row] =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatchBucketed(batch, snapshotPath, keyCol, versionCol,
          numBuckets, deletedCol)
      }

  /** One bucketed merge step (the body of [[bucketedMergeSink]], usable
    * directly for orchestrated batch ingest). */
  def mergeBatchBucketed(
      batch: DataFrame,
      snapshotPath: String,
      keyCol: String,
      versionCol: String,
      numBuckets: Int,
      deletedCol: Option[String] = None): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    val spark = batch.sparkSession
    val root = new Path(snapshotPath)
    val staging = new Path(s"$snapshotPath.staging")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery: committed staging ⇒ a previous batch died mid-swap;
    // finish moving its bucket dirs into place before merging on top.
    // Uncommitted staging (no _SUCCESS) is a dead write — discard.
    if (fs.exists(new Path(staging, "_SUCCESS"))) swapBuckets(fs, staging, root)
    else fs.delete(staging, true)

    val tagged = batch.withColumn(BucketCol, pmod(hash(col(keyCol)), lit(numBuckets)))
    // ≤ numBuckets rows — a driver-side list of touched directories, not data
    val touched = tagged.select(col(BucketCol)).distinct()
      .collect().map(_.getInt(0)).sorted
    val existing = touched.map(b => new Path(root, s"$BucketCol=$b"))
      .filter(fs.exists(_)).map(_.toString)
    // scan ONLY the touched buckets; basePath keeps the partition column
    val current =
      if (existing.nonEmpty)
        spark.read.option("basePath", snapshotPath).parquet(existing: _*)
          .select(tagged.columns.map(col): _*)
      else tagged.limit(0)
    val merged = SnapshotMerge.merge(current, tagged, keyCol, versionCol,
      deletedCol, retainTombstones = deletedCol.isDefined)
    merged.write.mode("overwrite").partitionBy(BucketCol).parquet(staging.toString)
    swapBuckets(fs, staging, root)
  }

  /** Live rows of a snapshot maintained by [[bucketedMergeSink]] (drops
    * the bucket placement column; tombstones filtered as [[readSnapshot]]). */
  def readBucketedSnapshot(
      spark: SparkSession,
      snapshotPath: String,
      deletedCol: Option[String] = None): DataFrame =
    readSnapshot(spark, snapshotPath, deletedCol).drop(BucketCol)

  /** Move every `__bucket=*` dir of a COMMITTED staging write into the
    * snapshot root (replacing that bucket's previous contents), then drop
    * staging. Idempotent: re-running after a crash at any point converges
    * — already-moved buckets are simply absent from staging. */
  private def swapBuckets(
      fs: org.apache.hadoop.fs.FileSystem, staging: Path, root: Path): Unit = {
    fs.mkdirs(root)
    val parts = fs.listStatus(staging)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$BucketCol="))
    parts.foreach { s =>
      val dest = new Path(root, s.getPath.getName)
      fs.delete(dest, true)
      if (!fs.rename(s.getPath, dest))
        // dest was just deleted: staging holds the only copy of this
        // bucket, so a silent skip here would lose it
        throw new java.io.IOException(
          s"SnapshotStream: failed to move ${s.getPath} into place at $dest")
    }
    fs.delete(staging, true)
  }
}
