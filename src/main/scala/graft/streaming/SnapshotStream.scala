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
  * Scale posture: the snapshot rewrite is O(snapshot) per trigger, the
  * right trade for daily/hourly corpus maintenance (the reference's own
  * cadence, cf. the `newest/` overwrite target,
  * glofas-forecast-computation.py:252); sub-minute CDC would partition
  * the snapshot by key range and rewrite only touched partitions — same
  * merge, narrower scope.
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
        if (!fs.exists(snap) && fs.exists(new Path(staging, "_SUCCESS")))
          fs.rename(staging, snap)
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
}
