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
  *  - winner has `deletedCol` true → row dropped (tombstone)
  *
  * One shuffle on the key for both sides; at 100 TB the update batch is
  * normally dimension-sized relative to the snapshot, so AQE broadcasts
  * it and the snapshot never re-shuffles. Re-running the same merge is a
  * no-op (idempotent), which is what makes retry-at-the-orchestrator
  * safe.
  */
object SnapshotMerge {

  /** Merge `updates` into `current`. Schemas must match exactly.
    *
    * @param deletedCol optional boolean tombstone column; when the winning
    *                   row has it true, the key disappears from the output
    */
  def merge(
      current: DataFrame,
      updates: DataFrame,
      keyCol: String,
      versionCol: String,
      deletedCol: Option[String] = None): DataFrame = {
    require(current.columns.sameElements(updates.columns),
      s"schemas must match: ${current.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val cols = current.columns.toSeq
    def packed(df: DataFrame, as: String): DataFrame =
      df.select(col(keyCol).as("__key"), struct(cols.map(col): _*).as(as))
    val joined = packed(current, "__cur")
      .join(packed(updates, "__upd"), Seq("__key"), "full_outer")
    val winner: Column =
      when(col("__upd").isNull, col("__cur"))
        .when(col("__cur").isNull, col("__upd"))
        .when(col(s"__upd.$versionCol") >= col(s"__cur.$versionCol"), col("__upd"))
        .otherwise(col("__cur"))
    val out = joined.select(winner.as("__row")).select(col("__row.*"))
    deletedCol.fold(out)(d => out.filter(!col(d)))
  }
}
