package graft.streaming

import graft.llm.Events
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the event analytics in
  * [[graft.llm.Events]]. The reference pipeline is pure batch re-run daily
  * (SURVEY §2.9) — these are the incremental path a continuously-ingesting
  * deployment would use: a file-source stream over the event folder,
  * `Trigger.AvailableNow` for catch-up-then-stop runs, watermarked windowed
  * aggregation, and custom session state via `flatMapGroupsWithState`.
  *
  * Scale posture: the stateful operators key on (window, type) and user_id
  * respectively — state is sharded by the shuffle partitioning, per-key
  * state is O(1) (counts) or O(open sessions), and the watermark bounds
  * state growth for the windowed aggregation.
  */
object EventStream {

  /** File-source stream over an events folder. File-source streams require
    * an explicit schema; hardcoding one is how a µs/ns unit swap in the
    * input becomes silently-wrong windows, so take the schema from a batch
    * read of the same path (a one-time driver-side footer read) — `ts`
    * then resolves to whatever the files physically carry (nanos long
    * under `spark.sql.legacy.parquet.nanosAsLong`, or
    * timestamp/timestamp_ntz) and [[graft.llm.Events.tsMicros]] dispatches
    * on it. */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)

  /** Event-time column for watermarking: the shared µs normalization
    * re-materialized as a TimestampType column. */
  private def eventTime(events: DataFrame) = timestamp_micros(Events.tsMicros(events))

  /** Streaming tumbling-window counts per event type, watermarked.
    * Mirrors [[graft.llm.Events.windowedCounts]]; the one semantic
    * difference is `approx_count_distinct` — exact distinct aggregation is
    * unsupported in streaming, and the HLL sketch is the right tool at
    * scale anyway. */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withColumn("event_time", eventTime(events))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowLength).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("n_users_approx"),
        sum(round(col("value") * 1e6).cast("long")).as("value_micros"),
        min(col("value")).as("value_min"),
        max(col("value")).as("value_max"))
      .select(
        unix_micros(col("w.start").cast("timestamp")).as("window_start_us"),
        col("event_type"), col("n_events"), col("n_users_approx"),
        col("value_micros"), col("value_min"), col("value_max"))

  /** Watermarked stream–stream join: each view event joined with the same
    * user's click events that follow within `withinMinutes`. Both sides
    * carry watermarks and the join condition bounds the event-time gap,
    * so Spark can size the join state buffers and evict rows once the
    * watermark passes — the canonical bounded-state stream–stream join
    * (unbounded conditions would grow state forever). Append-mode output:
    * a pair emits once both sides are certain. */
  def viewClickJoin(
      events: DataFrame,
      withinMinutes: Int = 30,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val base = events.withColumn("event_time", eventTime(events))
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("event_time").as("view_time"))
      .withWatermark("view_time", watermarkDelay)
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", watermarkDelay)
    views.join(
      clicks,
      col("user_id") === col("click_user") &&
        col("click_time") > col("view_time") &&
        col("click_time") <= col("view_time") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        unix_micros(col("view_time")).as("view_us"),
        unix_micros(col("click_time")).as("click_us"))
  }

  // ---------------------------------------------------------- sessionization

  final case class EventRow(user_id: Long, event_id: Long, ts_us: Long, value_micros: Long)

  final case class Session(
      user_id: Long,
      session_id: Long,
      n_events: Long,
      session_start_us: Long,
      session_end_us: Long,
      value_micros: Long)

  /** Per-user state: next session ordinal + the currently-open session. */
  final case class UserSessions(nextId: Long, open: Option[Session])

  /** Gap-based streaming sessionization with custom state: completed
    * sessions are emitted (append mode) as soon as a later event proves the
    * gap; the open session stays in state. Equivalent to the batch
    * [[graft.llm.Events.sessionize]] on all-but-the-open sessions when
    * events arrive in time order. */
  def sessionize(events: Dataset[EventRow], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000

    def update(
        userId: Long,
        rows: Iterator[EventRow],
        state: GroupState[UserSessions]): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var st = state.getOption.getOrElse(UserSessions(1L, None))
      val completed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        st.open match {
          case Some(s) if e.ts_us - s.session_end_us <= gapUs =>
            st = st.copy(open = Some(s.copy(
              n_events = s.n_events + 1,
              session_end_us = e.ts_us,
              value_micros = s.value_micros + e.value_micros)))
          case maybeOpen =>
            maybeOpen.foreach(completed += _)
            st = UserSessions(
              st.nextId + 1,
              Some(Session(userId, st.nextId, 1L, e.ts_us, e.ts_us, e.value_micros)))
        }
      }
      state.update(st)
      completed.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Batch→typed adapter for [[sessionize]] inputs (ts may be nanos-long
    * or timestamp, same normalization as the batch path). */
  def toEventRows(events: DataFrame): Dataset[EventRow] = {
    import events.sparkSession.implicits._
    val tsUs = Events.tsMicros(events)
    events.select(
      col("user_id"),
      col("event_id"),
      tsUs.as("ts_us"),
      round(col("value") * 1e6).cast("long").as("value_micros")).as[EventRow]
  }
}
