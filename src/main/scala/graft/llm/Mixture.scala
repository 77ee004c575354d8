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
  /** Downsample to a TARGET mixture — the Pile/Dolma reweighting draw:
    * given per-stratum target shares (fractions of the kept corpus),
    * compute each stratum's keep rate and take the deterministic hash
    * sample at that rate.
    *
    * Rates solve `kept_s ≈ target_s · N_kept` under the constraint that
    * no stratum can yield more docs than it has: `rate_s = min(1,
    * target_ppm_s · N / (n_s · totalTarget_ppm))` — i.e. the largest
    * proportional downscale that meets the ratios, keeping every fully-
    * consumed stratum whole (strata with no target are dropped). All
    * arithmetic is integer ppm over exact counts, the keep decision is
    * the [[Sampling]] hash family at ppm resolution, so the kept SET is
    * a pure function of the data — partitioning/retry/engine-invariant
    * and exactly mirrorable. One aggregation for the counts (broadcast
    * back), zero additional shuffles: the draw itself is a filter.
    *
    * Returns the input rows kept, plus `rate_ppm`. */
  def rebalance(
      docs: DataFrame,
      idCol: String,
      strataCol: String,
      targetsPpm: Map[String, Long]): DataFrame = {
    require(targetsPpm.nonEmpty && targetsPpm.values.forall(_ > 0),
      "rebalance: need positive ppm targets")
    val total = targetsPpm.values.sum
    val targetLit = typedlit(targetsPpm)
    val counts = docs.groupBy(col(strataCol).as("__s"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint() // stratum-cardinality-sized; also severs the
                         // self-join lineage with the N aggregate below
    val withN = counts.crossJoin(
      broadcast(counts.agg(sum("__n").as("__grand"))))
    // fixed INTEGER-op order (`div`, not `/` — Column `/` is double
    // division), overflow-safe to N ~ 9e12 docs: share_ppm =
    // target_ppm·1e6 div total (≤ 1e6, truncation ≤ 1 ppm), then
    // rate_ppm = min(1e6, share_ppm·N div n). Untargeted strata must
    // stay NULL explicitly: least() skips nulls, so least(1e6, null)
    // would silently admit them at rate 1e6.
    val tp = element_at(targetLit, col("__s"))
    val rates = withN
      .withColumn("__tp", tp)
      .select(col("__s"),
        when(col("__tp").isNull, lit(null).cast("long"))
          .otherwise(least(lit(1000000L),
            expr(s"((__tp * 1000000) div $total) * __grand div __n")))
          .as("rate_ppm"))
    // ppm draw: TWO multiply-mod rounds before the modulus (the KMV
    // scatter) — one round mod 1e6 is ~linear in small sequential ids
    // (1000003 ≡ 3 mod 1e6), which would concentrate every doc in the
    // bottom buckets instead of sampling
    val draw = pmod(
      (pmod(col(idCol) * lit(1000003L) + lit(17L), lit(TextHash.Prime))
        * lit(1000003L) + lit(17L)) % lit(TextHash.Prime),
      lit(1000000L))
    docs
      .join(broadcast(rates.filter(col("rate_ppm").isNotNull)),
        col(strataCol) === col("__s"))
      .filter(draw < col("rate_ppm"))
      .drop("__s")
  }

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
