package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixture accounting and per-stratum quota sampling — the
  * source/domain-balancing step of training-data assembly.
  *
  * [[report]] is one hash aggregation plus a broadcast of the one-row
  * totals; [[stratifiedSample]] is a per-stratum top-`perStratum` by a
  * deterministic hash order — the distributed, reproducible replacement
  * for "shuffle and take N per domain" (same [[Sampling]] integer-hash
  * family: stable under partitioning, retries, and engines). Stratum
  * cardinality is domain-count-sized, so the rank window partitions
  * cleanly; no stratum ever concentrates on one reducer beyond its own
  * rows.
  */
object Mixture {

  /** Per-(stratum...) mixture report: doc/char counts and corpus shares.
    * `docShare`/`charShare` are exact integer ratios cast to double. */
  def report(docs: DataFrame, strataCols: Seq[String], charsCol: String): DataFrame = {
    val grouped = docs.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(charsCol)).as("n_chars_total"))
    val totals = docs.agg(
      count(lit(1)).as("total_docs"), sum(col(charsCol)).as("total_chars"))
    grouped.crossJoin(broadcast(totals))
      .select(strataCols.map(col) ++ Seq(
        col("n_docs"),
        col("n_chars_total"),
        (col("n_docs").cast("double") / col("total_docs")).as("doc_share"),
        (col("n_chars_total").cast("double") / col("total_chars")).as("char_share")): _*)
  }

  /** One-row corpus health report: totals, stratum cardinalities, and
    * quality-bucket counts. Everything is an integer aggregate (bucket
    * counts instead of a mean score — double sums are
    * aggregation-order-dependent and would break exact cross-engine
    * comparison); a single hash aggregation with map-side combine. */
  def corpusReport(docs: DataFrame, idCol: String, textCol: String, charsCol: String): DataFrame =
    docs
      .join(TextAnalysis.qualityScore(docs, idCol, textCol)
        .select(col("doc_id").as(idCol), col("quality_bucket")), Seq(idCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(charsCol)).as("n_chars_total"),
        count_distinct(col("lang")).as("n_langs"),
        count_distinct(col("source")).as("n_sources"),
        sum(when(col("quality_bucket") === "high", 1L).otherwise(0L)).as("n_high"),
        sum(when(col("quality_bucket") === "medium", 1L).otherwise(0L)).as("n_medium"),
        sum(when(col("quality_bucket") === "low", 1L).otherwise(0L)).as("n_low"))

  /** Hierarchical mixture accounting: one pass producing per-(stratum...)
    * rows PLUS every rollup level up to the grand total, tagged by the
    * grouping bitmask — the "report at every granularity" query that would
    * otherwise be N unions of [[report]]. Spark plans ROLLUP as a single
    * Expand + hash aggregation (rows replicate once per level, combine
    * map-side), so it is one shuffle regardless of depth. Counts stay
    * integer (no shares here — each level has a different denominator).
    * Returns (strataCols..., grp, n_docs, n_chars_total). */
  def rollupReport(docs: DataFrame, strataCols: Seq[String], charsCol: String): DataFrame = {
    require(strataCols.nonEmpty, "rollup needs at least one stratum column")
    docs.rollup(strataCols.map(col): _*)
      .agg(
        grouping_id().as("grp"),
        count(lit(1)).as("n_docs"),
        sum(col(charsCol)).as("n_chars_total"))
  }

  /** Cross-tab (pivot): one row per `rowCol` value, one count column per
    * `values` entry. Values are EXPLICIT — `pivot(col)` without them runs
    * a driver-side distinct pass over the corpus first, and an unbounded
    * value set would turn the schema itself into a scale hazard; with the
    * list given the plan is a single hash aggregation over conditional
    * counts. Missing cells are 0, not null (matching the conditional-sum
    * SQL form). Column names are `n_<value>`. */
  def pivotCounts(docs: DataFrame, rowCol: String, pivotCol: String, values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "pivot needs an explicit value list")
    docs.groupBy(col(rowCol))
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
      .select(col(rowCol) +: values.map(v => coalesce(col(s"`$v`"), lit(0L)).as(s"n_$v")): _*)
  }

  /** Deterministic per-stratum quota: keeps the `perStratum` docs with the
    * lowest (hash bucket, id) rank in each stratum. Reproducible across
    * runs/engines; strata smaller than the quota keep everything. */
  def stratifiedSample(
      docs: DataFrame,
      idCol: String,
      strataCol: String,
      perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(Sampling.hashBucket(col(idCol), 100), col(idCol))
    docs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perStratum)
      .drop("rank")
  }

  /** Per-registrable-domain document cap — the C4/RefinedWeb-style "no
    * domain dominates the corpus" gate: derive each doc's registrable
    * domain from its URL ([[TextAnalysis.withRegistrableDomain]], a
    * zero-shuffle kernel projection) and keep the `perDomain`
    * hash-priority winners per domain ([[stratifiedSample]] — one
    * (domain)-keyed window). Docs whose URL yields no registrable domain
    * (no authority, suffix-only host, malformed labels) are dropped: a
    * capless bucket of unattributable docs would defeat the cap.
    *
    * 100 TB posture: domains are Zipf-hot, but the window's per-key state
    * is one running counter and rows stream through sorted partitions —
    * and the cap CUTS the hot key to `perDomain` rows; AQE skew-split
    * handles the sort spill of the raw hot partition (AqeSkewSpec's
    * scenario). Returns the input columns plus `domain`. */
  def domainCap(
      docs: DataFrame,
      idCol: String,
      urlCol: String,
      perDomain: Int,
      suffixes: Option[DataFrame] = None): DataFrame = {
    val tagged = TextAnalysis.withRegistrableDomain(docs, urlCol, suffixes)
      .filter(col("domain").isNotNull)
      .drop("host", "url_canon")
    stratifiedSample(tagged, idCol, "domain", perDomain)
  }

  /** TOKEN-BUDGET mixture sampling — the Dolma/Pile-style mixing step
    * that [[report]] only measures: draw documents per source in
    * deterministic hash-priority order until each source's token budget
    * is exhausted. A doc is admitted iff the tokens taken BEFORE it (in
    * priority order within its source) are still under `budget` — so
    * every source contributes ≥1 doc when it has any, budgets are
    * overshot by at most one document (the standard greedy cut), and the
    * result is a pure function of the data: stable across partitioning,
    * retries, and engines, like every sampler here.
    *
    * Output: (doc_id, source, n_tokens, take_order, cum_before) for the
    * ADMITTED docs — `take_order` the 1-based priority rank inside the
    * source, `cum_before` the source's tokens before this doc.
    *
    * Scale shape: one window over (source) — the same single shuffle as
    * [[stratifiedSample]]; Spark's WindowGroupLimit cannot prune here
    * (the cut depends on the running sum, not a row count), so the full
    * source partitions sort once; at 100 TB pre-bucket the corpus by
    * source to make that sort partition-local. */
  def budgetSample(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budgetSample needs a positive budget, got $budget")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(Sampling.hashBucket(col(idCol), 100), col(idCol))
    docs
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("take_order", row_number().over(w))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") < budget)
  }
}
