package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass table profiling — the Deequ/Glue-shaped data-quality report a
  * pipeline runs before trusting a new corpus drop: per-column
  * completeness (nulls), cardinality, range, and size, computed for ALL
  * columns in a SINGLE corpus pass of mergeable aggregates (no
  * per-column scans, no shuffle beyond the final partial-agg merge).
  *
  * Cardinality uses the [[graft.functions.KmvDistinct]] bottom-k sketch
  * (exact below capacity, bit-deterministic estimate above — the one
  * sketch whose APPROXIMATE path the DuckDB gate can mirror to the
  * hash); numeric columns are hashed by their canonical decimal string
  * so the sketch and its mirror agree across engines.
  *
  * Output (one row per profiled column):
  * (col_name, n_rows, n_nulls, n_distinct, is_exact,
  *  min_num, max_num   — doubles, NULL for string columns,
  *  min_str, max_str   — NULL for numeric columns,
  *  total_len          — summed `length` (code points), strings only).
  *
  * Scale: the aggregation state is (k + a few scalars) per column —
  * independent of row count; a 100 TB table profiles in one scan with a
  * single 1-row exchange. The row→column melt happens on the 1-row
  * aggregate frame (driver-sized). */
object Profile {

  private def checkCols(df: DataFrame, columns: Seq[String]): Seq[String] = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): ${missing.mkString(", ")}")
    cols
  }

  def profile(
      df: DataFrame,
      columns: Seq[String] = Nil,
      kmvK: Int = 64): DataFrame = {
    val cols = checkCols(df, columns)
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val dt = df.schema(c).dataType
      val numeric = dt.isInstanceOf[NumericType]
      require(numeric || dt == StringType,
        s"profile: unsupported type ${dt.catalogString} for column $c")
      Seq(
        count(col(c)).as(s"__nn_$c"),
        graft.functions.KmvDistinct(col(c).cast("string"), kmvK).as(s"__kmv_$c"),
        (if (numeric) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__minn_$c"),
        (if (numeric) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__maxn_$c"),
        (if (numeric) lit(null).cast("string") else min(col(c))).as(s"__mins_$c"),
        (if (numeric) lit(null).cast("string") else max(col(c))).as(s"__maxs_$c"),
        (if (numeric) lit(null).cast("long")
         else sum(length(col(c))).cast("long")).as(s"__len_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(
          lit(c).as("col_name"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__nn_$c")).as("n_nulls"),
          col(s"__kmv_$c").getField("n_distinct").as("n_distinct"),
          col(s"__kmv_$c").getField("is_exact").as("is_exact"),
          col(s"__minn_$c").as("min_num"),
          col(s"__maxn_$c").as("max_num"),
          col(s"__mins_$c").as("min_str"),
          col(s"__maxs_$c").as("max_str"),
          col(s"__len_$c").as("total_len"))
      }: _*)).as("p"))
      .select("p.*")
  }

  /** Per-DROP profile STATE — the incremental form of [[profile]]. One
    * row per profiled column with every aggregate in its MERGEABLE
    * representation: counts/sums/min/max verbatim, cardinality as the
    * KMV bottom-k hash array itself ([[graft.functions.KmvHashes]])
    * rather than the finished estimate. The output is flat-relational
    * (the hash set is a bounded `array<long>`), so a daily pipeline
    * persists one dimension-sized state table per drop and answers
    * "profile of everything so far" via [[merge]] in O(drops) driver-sized
    * work — the corpus is scanned exactly once per drop, never again. */
  def state(
      df: DataFrame,
      columns: Seq[String] = Nil,
      kmvK: Int = 64): DataFrame = {
    val cols = checkCols(df, columns)
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val dt = df.schema(c).dataType
      val numeric = dt.isInstanceOf[NumericType]
      require(numeric || dt == StringType,
        s"profile: unsupported type ${dt.catalogString} for column $c")
      Seq(
        count(col(c)).as(s"__nn_$c"),
        graft.functions.KmvHashes(col(c).cast("string"), kmvK).as(s"__kmv_$c"),
        (if (numeric) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__minn_$c"),
        (if (numeric) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__maxn_$c"),
        (if (numeric) lit(null).cast("string") else min(col(c))).as(s"__mins_$c"),
        (if (numeric) lit(null).cast("string") else max(col(c))).as(s"__maxs_$c"),
        (if (numeric) lit(null).cast("long")
         else sum(length(col(c))).cast("long")).as(s"__len_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(
          lit(c).as("col_name"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__nn_$c")).as("n_nulls"),
          col(s"__kmv_$c").as("kmv"),
          col(s"__minn_$c").as("min_num"),
          col(s"__maxn_$c").as("max_num"),
          col(s"__mins_$c").as("min_str"),
          col(s"__maxs_$c").as("max_str"),
          col(s"__len_$c").as("total_len"))
      }: _*)).as("p"))
      .select("p.*")
  }

  /** Merge per-drop [[state]] tables into the [[profile]] of their
    * union — bit-identical to a single-pass profile over the
    * concatenated drops, in any merge order. Counts/sums add, min/max
    * fold, and the KMV identity (bottom-k of a union = bottom-k of the
    * united bottom-k sets) makes even the ESTIMATE path reproduce
    * exactly. All inputs are dimension-sized (columns × drops rows), so
    * the merge never touches corpus data. */
  def merge(states: Seq[DataFrame], kmvK: Int = 64): DataFrame = {
    require(states.nonEmpty, "profile merge: no states given")
    val M = graft.llm.TextHash.Prime
    states.reduce(_ unionByName _)
      .groupBy("col_name")
      .agg(
        sum("n_rows").as("n_rows"),
        sum("n_nulls").as("n_nulls"),
        slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))),
          1, kmvK).as("__kmv"),
        min("min_num").as("min_num"),
        max("max_num").as("max_num"),
        min("min_str").as("min_str"),
        max("max_str").as("max_str"),
        sum("total_len").as("total_len"))
      .select(
        col("col_name"),
        col("n_rows"),
        col("n_nulls"),
        when(size(col("__kmv")) < kmvK, size(col("__kmv")).cast("long"))
          .otherwise(expr(
            s"CAST(${kmvK - 1} AS BIGINT) * CAST($M AS BIGINT) DIV element_at(__kmv, $kmvK)"))
          .as("n_distinct"),
        (size(col("__kmv")) < kmvK).as("is_exact"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"),
        col("total_len"))
  }
}
