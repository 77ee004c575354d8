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

  def profile(
      df: DataFrame,
      columns: Seq[String] = Nil,
      kmvK: Int = 64): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): ${missing.mkString(", ")}")
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
}
