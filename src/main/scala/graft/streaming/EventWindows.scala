package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** SURVEY §2.8: event-time windowing — each operator is a batch DataFrame
  * query (oracle-checkable) whose logic is identical under Structured
  * Streaming (`window()`/lag-gap sessionization work the same on a stream;
  * the streaming twins run in the ScalaTest suite over MemoryStream).
  *
  * All event-time arithmetic is on exact nanosecond longs or the derived µs
  * `ts2`; emitted times are formatted strings / epoch longs (SURVEY §7.3.3).
  */
object EventWindows {

  /** q54: tumbling 1h windows — per-hour per-type counts and value sums. */
  def q54(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts2"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), decSum(col("value")).as("sum_val"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("cnt"), col("sum_val"))
      .orderBy("ws", "event_type")

  /** q55: sliding windows (1h, slide 30min) — every event lands in exactly
    * two windows; emitted as epoch-second window starts. */
  def q55(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts2"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"), (decSum(col("value")) / count(lit(1))).as("avg_val"))
      .select(col("w.start").cast("long").as("ws"), col("cnt"), col("avg_val"))
      .orderBy("ws")

  /** q56: session windows via the lag-gap/cumsum form (30-min gap) — the
    * oracle-translatable twin of session_window(), binding of
    * [[graft.api.PortraitOps.sessionize]]; scales as two window passes on
    * one user_id shuffle. */
  def q56(s: SparkSession, d: String): DataFrame = {
    graft.api.PortraitOps.sessionize(events(s, d), "user_id", "ts",
        tieCol = "event_id", gap = 1800000000000L)
      .withColumnRenamed("session_id", "sid")
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("cnt"),
        expr("(max(ts) - min(ts)) div 1000000000").as("dur_sec"),
        date_format(timestamp_micros(expr("min(ts) div 1000")),
          "yyyy-MM-dd HH:mm:ss").as("start_s"))
      .orderBy("user_id", "sid")
  }

  /** q59: stream-static enrichment join (batch twin; streaming twin in
    * tests) — events enriched with the customer dim, rolled up by segment. */
  def q59(s: SparkSession, d: String): DataFrame =
    events(s, d).join(customer(s, d), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), countDistinct("user_id").as("uniq_users"),
        decSum(col("value")).as("sum_val"))
      .orderBy("c_mktsegment")

  /** q89: conversion funnel view → click → purchase over the event stream
    * — binding of [[graft.api.PortraitOps.funnelSteps]] on the µs
    * timestamps (`ts2`; the testdata stores µs, the parity precision on
    * both engines). `level` = conversion depth per user. */
  def q89(s: SparkSession, d: String): DataFrame =
    graft.api.PortraitOps.funnelSteps(events(s, d), "user_id", "event_type",
      "ts2", Seq("view", "click", "purchase"))
      .select(col("user_id"), unix_micros(col("step0_ts")).as("t_view"),
        unix_micros(col("step1_ts")).as("t_click"),
        unix_micros(col("step2_ts")).as("t_purchase"), col("level"))
      .orderBy("user_id")

  /** q91: weekly retention cohorts over the event stream — binding of
    * [[graft.api.PortraitOps.retentionCohorts]] on the µs timestamps. */
  def q91(s: SparkSession, d: String): DataFrame =
    graft.api.PortraitOps.retentionCohorts(events(s, d), "user_id", "ts2",
      periodDays = 7)
      .orderBy("cohort_start", "offset")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_tumbling_window" -> q54, "q55_sliding_window" -> q55,
    "q56_session_window" -> q56, "q59_stream_static_join" -> q59,
    "q89_event_funnel" -> q89, "q91_retention_cohorts" -> q91)

  val oracle: Map[String, String] = Map(
    "q91_retention_cohorts" ->
      """WITH per_user AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        |  FROM events GROUP BY user_id),
        |coh AS (
        |  SELECT user_id, first_day
        |    - CAST(datediff('day', DATE '1970-01-01', first_day) % 7 AS INT)
        |      AS cohort_start
        |  FROM per_user),
        |sizes AS (SELECT cohort_start, COUNT(DISTINCT user_id) AS cohort_size
        |          FROM coh GROUP BY cohort_start),
        |activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |cells AS (
        |  SELECT c.cohort_start,
        |    CAST(datediff('day', c.cohort_start, a.day) // 7 AS INT) AS "offset",
        |    COUNT(DISTINCT a.user_id) AS active_users
        |  FROM activity a JOIN coh c USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT cells.cohort_start, "offset", active_users, cohort_size,
        |  CAST(active_users AS DOUBLE) / cohort_size AS retention
        |FROM cells JOIN sizes USING (cohort_start)
        |ORDER BY cohort_start, "offset"""".stripMargin,
    "q89_event_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s0 AS (SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t1
        |       FROM events e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE e.event_type = 'click' AND epoch_us(e.ts) > s0.t0
        |       GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
        |       FROM events e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s1.t1
        |       GROUP BY e.user_id)
        |SELECT u.user_id, s0.t0 AS t_view, s1.t1 AS t_click,
        |  s2.t2 AS t_purchase,
        |  CAST(CAST(s0.t0 IS NOT NULL AS INT) + CAST(s1.t1 IS NOT NULL AS INT)
        |     + CAST(s2.t2 IS NOT NULL AS INT) AS INT) AS level
        |FROM u LEFT JOIN s0 USING (user_id) LEFT JOIN s1 USING (user_id)
        |      LEFT JOIN s2 USING (user_id)
        |ORDER BY u.user_id""".stripMargin,
    "q54_tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
        |  event_type, COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "q55_sliding_window" ->
      """WITH s AS (SELECT epoch_ns(ts) // 1000000000 AS sec, value FROM events),
        |w AS (SELECT (sec // 1800) * 1800 AS ws, value FROM s
        |      UNION ALL
        |      SELECT (sec // 1800) * 1800 - 1800 AS ws, value FROM s)
        |SELECT ws, COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_val
        |FROM w GROUP BY ws ORDER BY ws""".stripMargin,
    "q56_session_window" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
        |    lag(epoch_ns(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS prev_tns,
        |    ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, tns, ts,
        |    CASE WHEN prev_tns IS NULL OR tns - prev_tns > 1800000000000 THEN 1
        |         ELSE 0 END AS is_new
        |  FROM o),
        |sess AS (
        |  SELECT user_id, event_id, tns, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tns ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, CAST(sid AS BIGINT) AS sid, COUNT(*) AS cnt,
        |  (MAX(tns) - MIN(tns)) // 1000000000 AS dur_sec,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_s
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin,
    "q59_stream_static_join" ->
      """SELECT c_mktsegment, COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS uniq_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
}
