package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: each left row is matched with the LATEST right
  * row whose time is <= the left row's time, per key — the point-in-time
  * lookup every feature/config/rate table needs.
  *
  * Spark has no native as-of join. A naive formulation — inequality theta
  * join + argmax — degenerates to a per-key cartesian. This operator uses
  * the union-and-carry form instead: tag both sides, union them, and per
  * key carry the most recent right payload forward with
  * `last(ignoreNulls) over (ORDER BY time, side ROWS UNBOUNDED
  * PRECEDING)`. Cost is ONE shuffle on the key and a per-key sort —
  * exactly a sort-merge join's cost envelope, with no pair blow-up at any
  * key cardinality or time density. Right rows sort before left rows at
  * equal time (side 0 < 1), so a same-instant right update is visible to
  * the left row, matching DuckDB's `ASOF JOIN ... ON l.t >= r.t`
  * inclusive semantics (the driver's oracle).
  *
  * Requirements: `rightRows` must be unique per (keys..., timeCol) —
  * pre-aggregate if not (ambiguous same-instant versions have no defined
  * winner). Output: every left row + the matched right payload columns
  * (null when no right row precedes it).
  */
object AsofJoin {

  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payloadCols.nonEmpty, "as-of join needs at least one payload column")
    require(!payloadCols.exists(leftCols.contains),
      s"payload columns ${payloadCols.mkString(",")} must not collide with left columns")

    // align schemas: left carries null payloads, right carries null left-only cols
    val leftOnly = leftCols.filterNot(c => keys.contains(c) || c == timeCol)
    val taggedLeft = payloadCols.foldLeft(left.withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val taggedRight = leftOnly.foldLeft(
      right.select((keys :+ timeCol).map(col) ++ payloadCols.map(col): _*)
        .withColumn("__side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = taggedLeft.unionByName(taggedRight)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select((leftCols ++ payloadCols).map(col): _*)
  }

  /** Convenience single-payload form. */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      payloadCol: String): DataFrame =
    apply(left, right, keys, timeCol, Seq(payloadCol))

  // Scale note: if a single key's history ever exceeds a sort partition
  // (not the case in realistic feature stores), the refinement is to
  // pre-bucket time into coarse ranges, run the carry per (key, bucket),
  // and seed each bucket with the previous bucket's final value — same
  // operator applied twice, still one shuffle per pass.
}
