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
  *
  * Limitation of content-derived salts: when a hot key's rows are *exact
  * duplicates* (the degenerate-skew case) every copy hashes to the same
  * salt and nothing spreads. There is no deterministic, retry-safe way to
  * distinguish identical rows without a pre-existing disambiguator — so if
  * rows may be full duplicates, pass an explicit `saltCols` carrying one
  * (a source row id, file offset, `input_file_name()`-derived column, ...)
  * rather than relying on the non-key-column default.
  */
object Skew {

  /** Deterministic salt in [0, saltFactor) from the given columns. */
  def saltFrom(saltFactor: Int, cols: Column*): Column = {
    require(cols.nonEmpty,
      "salt needs at least one input column: with zero inputs xxhash64 is a " +
        "constant and every row lands on one reducer (pass saltCols explicitly " +
        "when the key covers all columns)")
    pmod(xxhash64(cols: _*), lit(saltFactor.toLong)).cast("int")
  }

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
      merge: Column,
      saltCols: Seq[Column] = Nil): DataFrame = {
    val saltInputs =
      if (saltCols.nonEmpty) saltCols
      else df.columns.filterNot(keys.contains).map(col).toSeq
    val salted = df.withColumn("__salt", saltFrom(saltFactor, saltInputs: _*))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial)
      .groupBy(keys.map(col): _*)
      .agg(merge)
  }

  /** Multi-aggregate [[saltedAgg]]: each `(partial, merge)` pair must form
    * a decomposable aggregate; merges reference the partial aliases. */
  def saltedAggs(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      aggs: Seq[(Column, Column)],
      saltCols: Seq[Column] = Nil): DataFrame = {
    require(aggs.nonEmpty, "need at least one (partial, merge) aggregate pair")
    val saltInputs =
      if (saltCols.nonEmpty) saltCols
      else df.columns.filterNot(keys.contains).map(col).toSeq
    df.withColumn("__salt", saltFrom(saltFactor, saltInputs: _*))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._1, aggs.tail.map(_._1): _*)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2, aggs.tail.map(_._2): _*)
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
      joinType: String = "inner",
      saltCols: Seq[Column] = Nil): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, got $joinType")
    val saltInputs =
      if (saltCols.nonEmpty) saltCols
      else skewed.columns.filterNot(keys.contains).map(col).toSeq
    val saltedLarge = skewed.withColumn("__salt", saltFrom(saltFactor, saltInputs: _*))
    val replicatedSalted = replicated.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge
      .join(replicatedSalted, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
