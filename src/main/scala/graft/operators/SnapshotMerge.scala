package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Latest-wins snapshot merge (upsert + tombstone delete) — the MERGE INTO
  * of incremental corpus maintenance, expressed as one full-outer join so
  * it runs on plain Parquet snapshots with no table format required.
  *
  * Both sides pack their row into a struct before the join, so the
  * operator is schema-generic (any column set, as long as the two sides
  * match) and the pick is ONE branch-free struct select instead of a
  * per-column CASE cascade. Resolution:
  *
  *  - key only in current  → keep current row
  *  - key only in updates  → take update (insert)
  *  - both                 → higher `versionCol` wins; ties go to the
  *                           update (re-delivered batches are idempotent)
  *  - winner has `deletedCol` true → row dropped (tombstone), or kept
  *    with the flag set when `retainTombstones` (incremental snapshots
  *    need the tombstone to outlive the batch that delivered it)
  *
  * One shuffle on the key for both sides; at 100 TB the update batch is
  * normally dimension-sized relative to the snapshot, so AQE broadcasts
  * it and the snapshot never re-shuffles. Re-running the same merge is a
  * no-op (idempotent), which is what makes retry-at-the-orchestrator
  * safe.
  */
object SnapshotMerge {

  /** Collapse a possibly multi-version update batch to one winning row per
    * key: highest `versionCol` wins, and on a version tie the tombstone
    * wins (a delete re-delivered alongside the row it deletes must still
    * delete). This is what keeps the full-outer join in [[merge]] 1:1 —
    * without it a micro-batch that coalesces several update files (e.g.
    * `Trigger.AvailableNow` catching up after a crash) fans the join out
    * and a stale insert can resurrect a tombstoned key.
    *
    * Ties on (version, deleted) break by the lexicographically GREATEST
    * payload (the full row participates as trailing ordering positions),
    * so the pick is deterministic even when same-version redeliveries
    * carry different payloads — though producers that do that are still
    * broken upstream (idempotent CDC redelivers identical payloads). A
    * NULL `versionCol` is rejected loudly (runtime error) rather than
    * sorted to the bottom: silently losing to every versioned row would
    * mask bad CDC input.
    *
    * One map-side-combining aggregation on the key; its output is already
    * hash-partitioned on the key, so the merge join reuses the exchange.
    * The aggregate is [[graft.functions.ArgMaxRow]] when every column is
    * UnsafeRow-mutable (scalar buffer slots → `HashAggregateExec`), else
    * [[graft.functions.ArgMaxRowAny]] (object buffer →
    * `ObjectHashAggregateExec`) — never the `max_by(struct)` spelling,
    * whose struct buffer sort-aggregates the batch on BOTH exchange
    * sides.
    */
  def latestPerKey(
      updates: DataFrame,
      keyCol: String,
      versionCol: String,
      deletedCol: Option[String] = None): DataFrame = {
    val cols = updates.columns.toSeq
    val schema = updates.schema
    val deletedNorm = deletedCol.fold(lit(false))(d => coalesce(col(d), lit(false)))
    val ordCols = Seq(col(versionCol), deletedNorm) ++ cols.map(col)
    val outF = cols.zipWithIndex.map { case (c, i) => c -> (i + 2) }
    val allMutable = cols.forall(c =>
      org.apache.spark.sql.catalyst.expressions.UnsafeRow.isMutable(schema(c).dataType))
    val allOrderable = cols.forall(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(schema(c).dataType))
    val valid = updates
      // assert_true evaluates to NULL for every valid row (so the filter
      // keeps everything) and raises on the first NULL version
      .filter(assert_true(col(versionCol).isNotNull,
        lit(s"SnapshotMerge: NULL $versionCol in update batch")).isNull)
    if (!allOrderable) {
      // UNORDERABLE payload types (maps) cannot join the ordering tuple:
      // fall back to max_by, whose VALUE side needs no ordering. Ties
      // beyond (version, deleted) are then arbitrary — callers with map
      // payloads must make version a total key per id. The struct value
      // buffer sort-aggregates; acceptable for the contractually
      // dimension-sized update batch.
      valid
        .groupBy(col(keyCol))
        .agg(max_by(struct(cols.map(col): _*),
          struct(col(versionCol), deletedNorm)).as("__row"))
        .select(col("__row.*"))
    } else {
      val agg =
        if (allMutable) graft.functions.ArgMaxRow(ordCols, outF)
        else graft.functions.ArgMaxRowAny(ordCols, outF)
      valid
        .groupBy(col(keyCol))
        .agg(agg.as("__row"))
        .select(col("__row.*"))
    }
  }

  /** Merge `updates` into `current`. Schemas must match exactly.
    *
    * @param deletedCol optional boolean tombstone column; when the winning
    *                   row has it true, the key disappears from the output
    *                   (unless `retainTombstones`)
    * @param retainTombstones keep winning tombstone rows (deleted=true) in
    *                   the output instead of dropping them. Required for
    *                   incrementally-maintained snapshots where a stale
    *                   insert for a deleted key may arrive in a LATER
    *                   batch: if the tombstone is dropped, the key is
    *                   simply absent and the stale insert resurrects it.
    *                   Filter tombstones at read/export time and reclaim
    *                   them periodically with [[compactTombstones]].
    */
  def merge(
      current: DataFrame,
      updates: DataFrame,
      keyCol: String,
      versionCol: String,
      deletedCol: Option[String] = None,
      retainTombstones: Boolean = false): DataFrame = {
    require(current.columns.sameElements(updates.columns),
      s"schemas must match: ${current.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val cols = current.columns.toSeq
    def packed(df: DataFrame, as: String): DataFrame =
      df.select(col(keyCol).as("__key"), struct(cols.map(col): _*).as(as))
    val joined = packed(current, "__cur")
      .join(packed(latestPerKey(updates, keyCol, versionCol, deletedCol), "__upd"),
        Seq("__key"), "full_outer")
    val winner: Column =
      when(col("__upd").isNull, col("__cur"))
        .when(col("__cur").isNull, col("__upd"))
        .when(col(s"__upd.$versionCol") >= col(s"__cur.$versionCol"), col("__upd"))
        .otherwise(col("__cur"))
    val out = joined.select(winner.as("__row")).select(col("__row.*"))
    deletedCol match {
      case Some(d) if !retainTombstones => out.filter(!coalesce(col(d), lit(false)))
      case _ => out
    }
  }

  /** Audit diff between two snapshot versions of a keyed table — the
    * "what changed in this corpus release" report run before promoting
    * a rebuilt snapshot: every key is classified `added` (new side
    * only), `removed` (old side only), `changed` (both sides, any
    * compared column differs) or `unchanged`. Comparison is NULL-safe
    * per column (`<=>` over the packed struct), so a NULL→value edit
    * counts as a change and NULL==NULL does not.
    *
    * Scale shape: one co-partitioned full-outer equi-join on the key
    * (the [[merge]] posture) over two narrow struct-packed projections;
    * no window, no skew-prone keys beyond the snapshots' own. Returns
    * (key, status). */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff: no columns to compare")
    val missing = compareCols.filterNot(c =>
      oldSnap.columns.contains(c) && newSnap.columns.contains(c))
    require(missing.isEmpty,
      s"snapshotDiff: column(s) absent from a side: ${missing.mkString(", ")}")
    def packed(df: DataFrame, as: String): DataFrame =
      df.select(col(keyCol).as("__key"),
        struct(compareCols.map(col): _*).as(as),
        lit(true).as(s"${as}_present"))
    packed(oldSnap, "__o")
      .join(packed(newSnap, "__n"), Seq("__key"), "full_outer")
      .select(col("__key").as(keyCol),
        when(col("__o_present").isNull, "added")
          .when(col("__n_present").isNull, "removed")
          .when(col("__o") <=> col("__n"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Reclaim retained tombstones once they can no longer be contradicted:
    * drops tombstone rows whose version is <= `versionWatermark`. Safe
    * when the CDC source guarantees no update older than the watermark
    * can still arrive (e.g. the source's own retention horizon). Run
    * periodically on snapshots maintained with `retainTombstones = true`
    * so deleted keys don't accumulate forever. */
  def compactTombstones(
      snapshot: DataFrame,
      versionCol: String,
      deletedCol: String,
      versionWatermark: Long): DataFrame =
    snapshot.filter(
      !coalesce(col(deletedCol), lit(false)) || col(versionCol) > versionWatermark)
}
