package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Event-time processing over the `events` stream (SURVEY.md §2.8).
  *
  * The reference's incremental loop is a hand-rolled micro-batch stream
  * (watermark file + idempotent upsert, reference `src/run.py:142-152`);
  * this module is the Structured Streaming expression of the same
  * semantics: `withWatermark` bounds state exactly like the reference's
  * cursor bounds re-fetch, and the windowed aggregations are the
  * streaming twins of the dashboard's daily rollups.
  *
  * Every transform is a pure `DataFrame => DataFrame`, so the SAME code
  * runs in batch (oracle-checked in [[graft.queries.WindowQueries]]) and
  * on an unbounded stream (spec-checked with MemoryStream). That is the
  * property that makes the engine's batch/streaming results consistent
  * by construction — one logical plan, two execution modes.
  *
  * Scale notes: windowed aggs shuffle on (window, key) — state per key ×
  * window is bounded by the watermark horizon; dropDuplicates state is
  * bounded the same way. Nothing here keeps unbounded state.
  */
object EventStream {

  /** Unbounded file-source read of the events table; micro-batches pick
    * up new files as they land (the streaming analogue of the
    * reference's watermark-driven incremental fetch).
    *
    * FileStreamSource requires an explicit schema, and the fixture's
    * physical `ts` type has changed across driver vintages
    * (TIMESTAMP(NANOS) vs timestamp[us]) — so the stored schema is
    * resolved from the footer (one cached batch-side inference), then
    * `ts` is normalized to TimestampType exactly as the batch reader
    * does ([[graft.io.Tables.normalizeEventTs]]): one normalizer, two
    * execution modes. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    // Engine-wide pinned conf (set at session construction by the graft
    // builders; re-asserted for foreign sessions) — see Tables.events.
    // Must precede the footer inference below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stored = graft.io.Tables.storedSchema(spark, s"$dir/events.parquet")
    // NTZ vintage reads through the forced TimestampType schema (scan
    // emits session-zoned ts, predicates stay pushdown-eligible) — the
    // batch reader's exact recipe.
    val schema = graft.io.Tables.eventsReadSchema(stored).getOrElse(stored)
    // Stream the directory with a glob filter: FileStreamSource requires a
    // directory basePath (the fixture is a single events.parquet file).
    graft.io.Tables.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Tumbling 1-hour counts/sums per event type. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding 1-hour windows every 30 minutes. */
  def slidingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("total_value"))

  /** Session windows per user with a 5-minute inactivity gap. */
  def userSessions(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_value"))

  /** Watermarked variant for streaming: late data beyond `delay` is
    * dropped and window state is reclaimed. */
  def withEventWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)

  /** Streaming exact dedup by event_id with watermark-bounded state —
    * the reference's idempotent re-ingest (delete-then-insert upsert)
    * expressed as stream dedup. */
  def dedupedStream(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each left event is correlated with
    * right-side events of the SAME user landing within
    * [l.ts, l.ts + horizon] (click→error attribution, order→refund
    * matching, …). Both sides are watermarked with the horizon, and the
    * range predicate gives Spark the bound it needs to reclaim each
    * side's join state once the other side's watermark passes — bounded
    * state, so the correlation can run forever on an unbounded stream.
    * The equi-key (user_id) keeps the physical join a hash/sort-merge
    * shuffle on the key at any scale, never nested-loop.
    *
    * Pure transform: the same function is oracle-checked in batch
    * ([[graft.queries.WindowQueries]] w5) and spec-checked on
    * MemoryStreams ([[EventStreamSpec]]). */
  /** `joinType` "inner" (w5), "left_outer" (w6), or "full_outer" (w7):
    * the OUTER variants are the alert shape — "every click, WITH its
    * error if one followed" — and in streaming they exercise real
    * state-eviction semantics: an unmatched left row is held in the
    * join state until the watermark passes l_ts + horizon (only then
    * can Spark PROVE no match is coming) and emits with NULL right
    * columns in a later micro-batch. FULL outer adds the one remaining
    * eviction branch: an unmatched RIGHT row's no-match proof is
    * earlier — a future left match would need l_ts ≥ r_ts − horizon, so
    * the row emits once the watermark passes r_ts itself (its own event
    * time), with NULL left columns; user_id therefore coalesces across
    * the two sides. Both sides are watermarked and the time condition
    * bounds state on both, so state stays O(horizon), never
    * O(stream). */
  def correlateWithin(
      left: DataFrame, right: DataFrame,
      horizon: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", horizon)
      .select(col("user_id"), col("event_id").as("l_id"),
        col("event_type").as("l_type"), col("ts").as("l_ts"))
    val r = right.withWatermark("ts", horizon)
      .select(col("user_id").as("r_user_id"), col("event_id").as("r_id"),
        col("event_type").as("r_type"), col("ts").as("r_ts"))
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      // one uniform projection for all three join types: inner/left rows
      // always carry the left key, right-only rows (full outer) carry
      // only r_user_id — coalesce is the identity for the first two
      .select(coalesce(col("user_id"), col("r_user_id")).as("user_id"),
        col("l_id"), col("l_type"), col("l_ts"),
        col("r_id"), col("r_type"), col("r_ts"))
  }

  // ---------------------------------------------------------------------
  // Custom state: running per-user counters via mapGroupsWithState
  // ---------------------------------------------------------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Running per-user totals with explicit state — the
    * `mapGroupsWithState` surface for custom stateful logic that
    * windowed aggs can't express. ProcessingTimeTimeout-free: state
    * lives for the stream's lifetime, so use only for bounded key
    * cardinality (per-user counters), not per-event keys. */
  def runningUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserRunning(uid, prev.n_events + batch.size,
            prev.total_value + batch.map(_.value).sum)
          state.update(next)
          next
      }
      .toDF()
  }

  case class Alert(user_id: Long, threshold: Double, total_value: Double)

  /** (running total, highest level already alerted) per user. */
  case class AlertState(total: Double, maxLevel: Long)

  /** Threshold alerts via `flatMapGroupsWithState` — the 1→N stateful
    * shape `mapGroupsWithState` can't express: a batch emits ONE alert
    * row per `step` boundary the user's running total crosses (possibly
    * zero, possibly several). State per user is a (total, high-water
    * level) pair — the HIGH-WATER mark, not the raw total, decides what
    * has fired, so a total that dips (refund-style negative values) and
    * re-crosses an already-alerted boundary does NOT duplicate the alert
    * in Append output. Bounded by key cardinality, not stream length. */
  def thresholdAlerts(spark: SparkSession, events: DataFrame, step: Double): DataFrame = {
    require(step > 0, s"alert step must be positive, got $step")
    import spark.implicits._
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AlertState, Alert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[AlertState]) =>
          val prev = state.getOption.getOrElse(AlertState(0.0, 0L))
          val total = prev.total + rows.map(_.value).sum
          val level = math.max(prev.maxLevel, math.floor(total / step).toLong)
          state.update(AlertState(total, level))
          (prev.maxLevel + 1 to level).iterator.map(l => Alert(uid, l * step, total))
      }
      .toDF()
  }

  /** The reference's idempotent incremental load as a STREAMING sink:
    * each micro-batch is upserted (delete-then-insert by key) into the
    * parquet table via foreachBatch — re-delivered or updated rows within
    * the watermark replace their previous versions, exactly like the
    * reference's re-fetch window absorbing updates
    * (reference `src/etl/load/duckdb_client.py:53-57`). */
  def startUpsertSink(
      spark: SparkSession, df: DataFrame, path: String, keys: Seq[String],
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.etl.Load.upsertParquet(spark, path, batch, keys)
      }
      .start()

  /** Start a memory-sink query for tests/demos. */
  def startToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    ()
  }
}
