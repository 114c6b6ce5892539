package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.StableAgg._
import graft.functions.{Oracle => O}

/** Stream-semantics queries over the events table (SURVEY.md §1.1: the
  * reference is batch-only — its daily "last-14-days upsert" is exactly a
  * micro-batch with late-data overwrite, so Structured Streaming is the
  * idiomatic upgrade path). Each query here is the *batch-equivalent*
  * plan, verified against the DuckDB oracle; graft.streaming.EventStream
  * runs the same transforms incrementally with readStream + watermarks
  * (exercised in ScalaTest via the file source and memory sink).
  */
object StreamQueries {

  /** Tumbling-window aggregation: hourly event counts / value sums per
    * event type — the windowed-agg core of any metrics stream. Stated as
    * date_trunc so the identical expression runs in batch and streaming.
    */
  val st01 = QueryDef(
    "st01_hourly_rollup",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
    },
    Some(s"""
      SELECT date_trunc('hour', ts) AS hour, event_type,
        COUNT(*) AS n_events,
        ${O.dsum("value")} AS total_value,
        COUNT(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY 1, 2
    """.stripMargin.trim))

  /** Sessionization: per-user sessions split on >30-minute inactivity
    * gaps (lag + running flag-sum), then per-session stats. The
    * streaming form is `flatMapGroupsWithState` keyed by user
    * (graft.streaming.EventStream.sessionize); this batch form is the
    * oracle-checkable reference semantics. Gap math is in microseconds on
    * both engines so sub-second timestamps can't flip a session break.
    */
  val st02 = QueryDef(
    "st02_sessionization",
    (s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val flagged = Tables.events(s, dir)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_seq",
          sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0))
            .cast("int"))
      flagged
        .groupBy(col("user_id"), col("session_seq"))
        .agg(
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("session_value"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"))
    },
    Some(s"""
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
               THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id, ts, value,
          CAST(SUM(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_seq
        FROM flagged)
      SELECT user_id, session_seq,
        COUNT(*) AS n_events,
        ${O.dsum("value")} AS session_value,
        epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
      FROM sessions
      GROUP BY user_id, session_seq
    """.stripMargin.trim))

  /** Event-order funnel: first view → first click → first purchase per
    * user, as conditional min-timestamps with order constraints — the
    * conversion query a product-analytics stream needs.
    */
  val st03 = QueryDef(
    "st03_funnel",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val perUser = ev.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "click", col("ts"))).as("first_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      perUser.agg(
        count(col("first_view")).as("n_viewed"),
        count(when(col("first_click") > col("first_view"), lit(1))).as("n_clicked_after_view"),
        count(when(col("first_purchase") > col("first_click") &&
          col("first_click") > col("first_view"), lit(1))).as("n_full_funnel"))
    },
    Some("""
      SELECT
        COUNT(first_view) AS n_viewed,
        COUNT(CASE WHEN first_click > first_view THEN 1 END) AS n_clicked_after_view,
        COUNT(CASE WHEN first_purchase > first_click AND first_click > first_view
              THEN 1 END) AS n_full_funnel
      FROM (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
          MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
          MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events GROUP BY user_id)
    """.stripMargin.trim))

  /** As-of attribution: each purchase joined to the user's latest view
    * at-or-before it (graft.operators.AsOfJoin — union-window plan, one
    * shuffle, no range-join pair explosion). The oracle is DuckDB's
    * native ASOF LEFT JOIN, so the operator semantics are pinned against
    * an independent implementation.
    */
  val st04 = QueryDef(
    "st04_asof_attribution",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("view_ts"))
        .agg(max(col("event_id")).as("view_id"))
      graft.operators.AsOfJoin.latestPreceding(
        purchases, views,
        key = "user_id", leftTime = "ts", rightTime = "view_ts",
        payload = Seq("view_id", "view_ts"))
        .select(col("purchase_id"), col("user_id"), col("view_id"),
          (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"))
    },
    Some("""
      WITH views AS (
        SELECT user_id, ts AS view_ts, MAX(event_id) AS view_id
        FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      p AS (
        SELECT user_id, ts, event_id AS purchase_id
        FROM events WHERE event_type = 'purchase')
      SELECT p.purchase_id, p.user_id, v.view_id,
        epoch_us(p.ts) - epoch_us(v.view_ts) AS gap_us
      FROM p ASOF LEFT JOIN views v
        ON p.user_id = v.user_id AND v.view_ts <= p.ts
    """.stripMargin.trim))

  /** Interval self-join: pairs of same-type events within 10 minutes —
    * the stream-stream interval-join shape, computed with
    * graft.operators.RangeJoin's exact bucket banding (plain equi-join
    * on (key, bucket), no per-key cross product). The oracle is the
    * brute inequality join.
    */
  val st05 = QueryDef(
    "st05_interval_self_join",
    (s, dir) => {
      val e = Tables.events(s, dir).select(
        col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("t"))
      graft.operators.RangeJoin.within(e,
        key = "event_type", timeCol = "t", idCol = "event_id",
        width = 600L * 1000000L)
        .groupBy(col("a_event_type").as("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(abs(col("a_t") - col("b_t"))).as("total_gap_us"))
    },
    Some("""
      WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS t FROM events)
      SELECT a.event_type,
        COUNT(*) AS n_pairs,
        CAST(SUM(ABS(a.t - b.t)) AS BIGINT) AS total_gap_us
      FROM e a JOIN e b
        ON a.event_type = b.event_type
        AND a.event_id < b.event_id
        AND ABS(a.t - b.t) < 600 * 1000000
      GROUP BY 1
    """.stripMargin.trim))

  /** Ingest-side exact dedup at (user, event_type, day) grain — the
    * batch-equivalent semantics of `EventStream.dedupKeys` (streaming
    * `dropDuplicatesWithinWatermark` with watermark-bounded state):
    * one surviving row per key, plus the duplicate count and the
    * first event id. The streaming form keeps the first ARRIVAL
    * (processing order) where this batch form keeps min(event_id);
    * `StreamingSpec` compares the two on the key set, which is
    * identical by construction.
    */
  val st06 = QueryDef(
    "st06_stream_dedup",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"),
          date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_dups"),
          min(col("event_id")).as("first_event_id"))
    },
    Some("""
      SELECT user_id, event_type, date_trunc('day', ts) AS day,
        COUNT(*) AS n_dups, MIN(event_id) AS first_event_id
      FROM events
      GROUP BY 1, 2, 3
    """.stripMargin.trim))

  def all: Seq[QueryDef] = Seq(st01, st02, st03, st04, st05, st06)
}
