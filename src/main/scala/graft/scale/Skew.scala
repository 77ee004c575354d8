package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) splits oversized sort-merge partitions at runtime and is the
  * first line of defense — these helpers cover the two cases it does not:
  * a skewed shuffle *aggregation*, and a skewed join against a table that
  * is too big to broadcast but small enough to replicate `saltFactor`
  * times.
  *
  * Salts are deterministic (hash of the row's remaining columns, never
  * `rand()`): retried tasks must salt identically or shuffle retries
  * produce wrong results — nondeterministic expressions force Spark to
  * recompute whole stages on retry.
  */
object Skew {

  /** Deterministic salt in [0, saltFactor) from the given columns. */
  def saltFrom(saltFactor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(saltFactor.toLong)).cast("int")

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (keys + salt), final aggregate on keys. `partial` and `merge` must
    * form a decomposable aggregate (sum/sum, count/sum, min/min, ...).
    *
    * Example: `saltedAgg(df, Seq("k"), 16, count(lit(1)).as("c"), sum(col("c")).as("c"))`
    *
    * Spark's hash aggregation already does map-side partial aggregation,
    * which absorbs most key skew; this helper is for the residual case
    * where a single reducer key still overflows (e.g. collect_list-style
    * or high-cardinality-payload aggregates on a hot key). */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      partial: Column,
      merge: Column): DataFrame = {
    val salted = df.withColumn(
      "__salt", saltFrom(saltFactor, df.columns.filterNot(keys.contains).map(col).toSeq: _*))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial)
      .groupBy(keys.map(col): _*)
      .agg(merge)
  }

  /** Salted equi-join: the skewed (large) side gets a deterministic salt;
    * the replicated side is exploded across all `saltFactor` values, so
    * each hot key spreads over `saltFactor` reducers. Inner/left joins
    * only (the replicated side must not produce unmatched duplicates). */
  def saltedJoin(
      skewed: DataFrame,
      replicated: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, got $joinType")
    val saltedLarge = skewed.withColumn(
      "__salt", saltFrom(saltFactor, skewed.columns.filterNot(keys.contains).map(col).toSeq: _*))
    val replicatedSalted = replicated.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge
      .join(replicatedSalted, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
