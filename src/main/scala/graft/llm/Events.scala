package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Event-stream analytics in batch form: tumbling-window aggregation and
  * gap-based sessionization over the `events` table. The Structured
  * Streaming variants live in [[graft.streaming.EventStream]]; these batch
  * forms define the semantics and are what the DuckDB oracle checks.
  *
  * Determinism rules for the oracle hash-compare:
  *  - `value` sums are aggregated as micro-unit longs
  *    (`round(value * 1e6)`) — double summation order differs between
  *    Spark's partial/final aggregation and a single-threaded oracle, so a
  *    raw `sum(double)` can never hash-compare exactly. Min/max/count stay
  *    exact on doubles.
  *  - timestamps are normalized to epoch microseconds (long) on input and
  *    output. The testdata parquet has carried `ts` as both
  *    TIMESTAMP(NANOS) (read as a nanos long under
  *    `spark.sql.legacy.parquet.nanosAsLong`, set in Verify/Bench
  *    sessions) and TIMESTAMP(MICROS) (read as timestamp/timestamp_ntz),
  *    so [[tsMicros]] dispatches on the actual column type — every
  *    event-time consumer (batch, streaming, registry entries, specs)
  *    must go through it rather than assume a unit. Integer micro
  *    instants are the representation Spark and DuckDB agree on. Window
  *    bounds are pure integer arithmetic on the micros, which for
  *    epoch-aligned tumbling windows is exactly Spark's `window()`
  *    semantics.
  */
object Events {

  /** Event time as epoch micros, whatever the physical ts type:
    * nanos-long (legacy parquet read), timestamp, or timestamp_ntz.
    * The single source of truth for the events `ts` unit — shared by the
    * streaming surface and the query registry. */
  private[graft] def tsMicros(events: DataFrame): Column =
    events.schema("ts").dataType match {
      case LongType => expr("ts DIV 1000") // nanos -> micros; integer div (double math would lose precision above 2^53)
      case _ => unix_micros(col("ts").cast("timestamp"))
    }

  private def valueMicros: Column = round(col("value") * 1e6).cast("long")

  /** Tumbling-window counts per event type:
    * (window_start_us, event_type, n_events, n_users, value_micros,
    * value_min, value_max). One shuffle on (window, type); partial
    * aggregation map-side-combines before it. */
  def windowedCounts(events: DataFrame, windowUs: Long = 3600000000L): DataFrame =
    events
      .select(tsMicros(events).as("ts_us"), col("event_type"), col("user_id"), col("value"))
      .groupBy((expr(s"ts_us DIV $windowUs") * windowUs).as("window_start_us"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(valueMicros).as("value_micros"),
        min(col("value")).as("value_min"),
        max(col("value")).as("value_max"))

  /** Hopping (sliding) window counts: like [[windowedCounts]] but windows
    * of `windowUs` sliding every `slideUs` overlap, so each event lands in
    * `windowUs / slideUs` windows. The explode factor IS that ratio —
    * bounded and chosen by the caller, the same cost model as Spark's own
    * `window(col, len, slide)` (whose epoch-aligned window set this
    * reproduces exactly — reproduced rather than used so the window starts
    * are pure integer arithmetic the oracle can mirror). */
  def hoppingCounts(
      events: DataFrame,
      windowUs: Long = 3600000000L,
      slideUs: Long = 1800000000L): DataFrame = {
    require(windowUs % slideUs == 0, "windowUs must be a multiple of slideUs")
    val m = (windowUs / slideUs).toInt
    events
      .select(tsMicros(events).as("ts_us"), col("event_type"), col("user_id"), col("value"))
      .select(
        explode(transform(sequence(lit(0), lit(m - 1)), k =>
          (expr(s"ts_us DIV $slideUs") - k) * slideUs)).as("window_start_us"),
        col("event_type"), col("user_id"), col("value"))
      .groupBy("window_start_us", "event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(valueMicros).as("value_micros"))
  }

  /** Weekly cohort retention: users grouped by first-seen week; for every
    * (cohort_week, weeks_since) cell, how many of the cohort were active
    * and the retained fraction. One distinct + one aggregation + two
    * windows, no joins: after `distinct()` each user contributes at most
    * one row per week, so the per-cell active count is a plain `count`
    * (no distinct-aggregate Expand), the cohort week is a per-user window
    * `min`, and the cohort size is the cell where `weeks_since = 0`
    * (every user is active in their own first week) read back via a
    * per-cohort window `max` — which replaces both the `first_seen
    * groupBy` and the `sizes` join of the textbook formulation. Ratios
    * are integer/integer → deterministic. Returns (cohort_week,
    * weeks_since, n_active, cohort_size, retention). */
  def retention(events: DataFrame, weekUs: Long = 7L * 24 * 3600 * 1000000): DataFrame = {
    val e = events
      .select(col("user_id"), tsMicros(events).as("ts_us"))
      .select(col("user_id"), expr(s"ts_us DIV $weekUs").as("week")) // integer div: no double rounding at week boundaries
      .distinct()
    val byUser = Window.partitionBy("user_id")
    val byCohort = Window.partitionBy("cohort_week")
    e.withColumn("cohort_week", min(col("week")).over(byUser))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(count(lit(1)).as("n_active"))
      .withColumn("cohort_size",
        max(when(col("weeks_since") === 0, col("n_active"))).over(byCohort))
      .withColumn("retention", col("n_active").cast("double") / col("cohort_size"))
  }

  /** Semi-structured metadata extraction: parse the JSON `props` column
    * into typed fields. `get_json_object` evaluates per row inside
    * codegen — no UDF, no shuffle; at scale prefer this narrow projection
    * over `from_json` with a full schema when only a few keys are read
    * (the JSON parser short-circuits on the path). */
  def extractProps(events: DataFrame, key: String = "k"): DataFrame =
    events.select(
      col("event_id"),
      col("event_type"),
      get_json_object(col("props"), s"$$.$key").cast("long").as(key))

  /** Strictly-ordered funnel: per user, the earliest time of step 1, then
    * the earliest step-2 event AFTER that, then the earliest step-3 event
    * after THAT, and so on; `stage` counts consecutive steps reached.
    *
    * Each step is one conditional min-aggregation plus an equi-join back
    * on user_id — every shuffle keys on the same column, so the
    * partitioning is planned once and reused across all k steps (no
    * quadratic pair expansion, no per-user collect). Returns
    * (user_id, t1_us..tk_us, stage). */
  def funnel(
      events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col("user_id"), col("event_type"), tsMicros(events).as("ts_us"))
    val users = e.select("user_id").distinct()
    val (joined, _) = steps.zipWithIndex.foldLeft((users, Option.empty[String])) {
      case ((acc, prev), (step, i)) =>
        val name = s"t${i + 1}_us"
        val candidates = prev match {
          case None => e.filter(col("event_type") === step)
          case Some(p) => e
            .join(acc.select(col("user_id"), col(p)), Seq("user_id"))
            .filter(col("event_type") === step && col("ts_us") > col(p))
        }
        val mins = candidates.groupBy("user_id").agg(min(col("ts_us")).as(name))
        (acc.join(mins, Seq("user_id"), "left"), Some(name))
    }
    joined.withColumn("stage",
      steps.indices
        .map(i => when(col(s"t${i + 1}_us").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  /** Per-user ordered event analytics over an explicit ROWS frame: lag /
    * lead neighbors and a trailing moving sum/count of the last `window`
    * rows — the smoothing/delta features of per-entity time series. One
    * shuffle + sort on the natural user_id key (every window shares the
    * (user_id, ts, event_id) spec, so Spark plans a single Window node);
    * all emitted values are longs (value in micros), so the frame
    * arithmetic is engine-exact at any parallelism. Returns (event_id,
    * user_id, ts_us, value_micros, prev_value_micros, next_value_micros,
    * moving_sum_micros, n_in_window, seq). */
  def movingStats(events: DataFrame, window: Int = 4): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val frame = byUser.rowsBetween(-(window - 1), Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), tsMicros(events).as("ts_us"),
        valueMicros.as("value_micros"))
      .select(
        col("event_id"), col("user_id"), col("ts_us"), col("value_micros"),
        lag(col("value_micros"), 1).over(byUser).as("prev_value_micros"),
        lead(col("value_micros"), 1).over(byUser).as("next_value_micros"),
        sum(col("value_micros")).over(frame).as("moving_sum_micros"),
        count(lit(1)).over(frame).as("n_in_window"),
        row_number().over(byUser).cast("long").as("seq"))
  }

  /** IQR (Tukey-fence) outlier detection per event type: a value outside
    * [q1 - factor*iqr, q3 + factor*iqr] for its group is flagged. The
    * per-group quartiles are one hash aggregation over the group key and
    * broadcast back over the unshuffled scan (event-type cardinality is
    * dimension-sized). `exact = true` uses exact `percentile` — bit-equal
    * to DuckDB `quantile_cont`, the oracle path; production at 100 TB
    * flips to the mergeable `percentile_approx` sketch (the
    * ThresholdPercentages precedent). Fence arithmetic is plain double
    * add/multiply of bit-exact inputs, so the flags are engine-exact too. Returns
    * (event_id, event_type, value, q1, q3, lo, hi, is_outlier). */
  def outliers(events: DataFrame, factor: Double = 1.5, exact: Boolean = true): DataFrame = {
    val e = events.select(col("event_id"), col("event_type"), col("value"))
    val quartiles =
      if (exact)
        e.groupBy("event_type").agg(
          percentile(col("value"), lit(0.25)).as("q1"),
          percentile(col("value"), lit(0.75)).as("q3"))
      else
        e.groupBy("event_type").agg(
          percentile_approx(col("value"), lit(0.25), lit(10000)).as("q1"),
          percentile_approx(col("value"), lit(0.75), lit(10000)).as("q3"))
    val iqr = col("q3") - col("q1")
    e.join(broadcast(quartiles), Seq("event_type"))
      .select(
        col("event_id"), col("event_type"), col("value"), col("q1"), col("q3"),
        (col("q1") - lit(factor) * iqr).as("lo"),
        (col("q3") + lit(factor) * iqr).as("hi"))
      .withColumn("is_outlier", col("value") < col("lo") || col("value") > col("hi"))
  }

  /** Ranking analytics per event type: rank, percent_rank, cume_dist and
    * ntile over the value ordering — the distribution-position features
    * (score normalization, quantile bucketing) of per-group analysis.
    * The ordering carries an event_id tiebreak so every rank function is
    * total and engine-exact (percent_rank/cume_dist are then ratios of
    * integers — deterministic doubles). One shuffle + sort on the group
    * key. Returns (event_id, event_type, value, rnk, pct_rank, cume,
    * quartile). */
  def rankStats(events: DataFrame, nTiles: Int = 4): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    events
      .select(col("event_id"), col("event_type"), col("value"))
      .select(
        col("event_id"), col("event_type"), col("value"),
        rank().over(w).cast("long").as("rnk"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        ntile(nTiles).over(w).cast("long").as("quartile"))
  }

  /** Fixed-range equi-width histogram per event type: `nBuckets` buckets
    * over [lo, hi), out-of-range values clamped to the edge buckets. The
    * bucket index is `floor((value - lo) / width)` — one double subtract/
    * divide on bit-identical inputs, so bucket boundaries are engine-exact
    * — and the aggregation is a single groupBy with map-side combine.
    * Bounds are caller-fixed (a data-derived range would need a min/max
    * pre-pass; at 100 TB the serving range is a config, not a scan).
    * Returns (event_type, bucket, bucket_lo, n_events, value_micros). */
  def histogram(
      events: DataFrame,
      lo: Double = 0.0,
      hi: Double = 500.0,
      nBuckets: Int = 20): DataFrame = {
    require(hi > lo && nBuckets > 0, "need hi > lo and nBuckets > 0")
    val width = (hi - lo) / nBuckets
    val bucket = least(greatest(
      floor((col("value") - lo) / width).cast("long"), lit(0L)), lit(nBuckets - 1L))
    events
      .select(col("event_type"), col("value"), bucket.as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(
        count(lit(1)).as("n_events"),
        sum(valueMicros).as("value_micros"))
      .withColumn("bucket_lo", lit(lo) + col("bucket") * width)
  }

  /** Gap-based sessionization: a new session starts after `gapMinutes` of
    * user inactivity. Returns one row per session:
    * (user_id, session_id, n_events, session_start_us, session_end_us,
    * value_micros). Two shuffles (window by user, then group by
    * user+session — same key prefix, so the sort-window partitioning is
    * reused); at 100 TB the user key is the natural partitioner and
    * per-user data is small, so the sort window does not skew. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val prevTs = lag(col("ts_us"), 1).over(byUser)
    events
      .select(col("user_id"), col("event_id"), tsMicros(events).as("ts_us"), col("value"))
      .withColumn("new_session",
        when(prevTs.isNull || col("ts_us") - prevTs > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        sum(valueMicros).as("value_micros"))
  }
}
