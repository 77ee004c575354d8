package graft.pipeline

import graft.config.FloodConfig
import graft.transforms.{Geometry, Normalize}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-time threshold preparation: unify the per-return-period threshold
  * tables into a single per-cell table with WKT geometry.
  *
  * Semantics (reference: databricks/threshold-data-joining.py:70-131):
  * round keys on each input, assert row counts agree, fold inner joins on
  * (latitude, longitude), add geometry, global sort by (latitude,
  * longitude) for read locality, write Parquet.
  *
  * Scale notes: the inputs share one row per grid cell, so the fold of
  * inner joins co-partitions on the same key — one shuffle partitioning
  * reused across the fold (or pure broadcast when small). The final sort is
  * a range partition + local sort; it buys clustered reads for the
  * serving-side point lookups.
  */
object ThresholdJoin {

  /** `validate = true` mirrors the reference's count-preservation asserts
    * (threshold-data-joining.py:84-100) at the cost of N+1 extra actions;
    * the default path runs a single job (the asserts are a data-quality
    * check on dimension-sized inputs, not pipeline logic). */
  def run(
      inputs: Seq[DataFrame],
      cfg: FloodConfig = FloodConfig(),
      validate: Boolean = false
  ): DataFrame = {
    require(inputs.nonEmpty, "at least one threshold table required")
    val rounded = inputs.map(Normalize.roundKeys(_, cfg.precision))
    val unified = rounded.reduce((a, b) => a.join(b, Seq("latitude", "longitude"), "inner"))

    if (validate) {
      val cached = rounded.map(_.cache())
      val counts = cached.map(_.count())
      require(counts.distinct.size == 1,
        s"threshold tables must have identical cell counts, got $counts")
      require(unified.count() == counts.head,
        "join must preserve the per-cell row count (1:1 on every input)")
      cached.foreach(_.unpersist())
    }

    Geometry.addWkt(unified, cfg.halfGridSize, cfg.precision)
      .orderBy("latitude", "longitude")
  }

  def runFromPaths(spark: SparkSession, paths: Seq[String], outPath: String, cfg: FloodConfig): Unit =
    run(paths.map(spark.read.parquet(_)), cfg)
      .write.mode("overwrite").parquet(outPath)
}
