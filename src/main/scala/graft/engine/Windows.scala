package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** SURVEY §2.5: window functions, sorts, limits, set ops.
  *
  * Contract: every Window orderBy carries a unique trailing tiebreaker
  * (o_orderkey / event_id), per SURVEY §7.3.6 — ntile/rank are
  * tie-order-sensitive and the oracle must agree bit-for-bit.
  */
object Windows {

  /** q27: top-3 orders per customer (rank-filter pattern). */
  def q27(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** q28: lag/lead — inter-event gap seconds + next event type per user.
    * Gap computed on exact ns longs with integer div. */
  def q28(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events(s, d)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("gap_sec", expr("(ts - prev_ts) div 1000000000"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .select("user_id", "event_id", "gap_sec", "next_type")
      .orderBy("user_id", "event_id")
  }

  /** q29: ROWS frame — moving 3-row sum of order totals per customer. */
  def q29(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(to_date(col("o_orderdate")).asc, col("o_orderkey").asc)
      .rowsBetween(-2, Window.currentRow)
    orders(s, d)
      .withColumn("mov3",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "mov3")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q30: RANGE frame — 30-day trailing revenue per customer over epoch-day. */
  def q30(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("day_num"))
      .rangeBetween(-30, Window.currentRow)
    orders(s, d)
      .withColumn("day_num",
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")))
      .withColumn("sum30",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "day_num", "sum30")
      .orderBy("o_custkey", "day_num", "o_orderkey")
  }

  /** q31: analytic functions — ntile/percent_rank/cume_dist/first/last. */
  def q31(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d).select(
      col("o_orderkey"), col("o_orderstatus"),
      ntile(5).over(w).as("nt"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"),
      first(col("o_orderkey")).over(wFull).as("first_key"),
      last(col("o_orderkey")).over(wFull).as("last_key"))
      .orderBy("o_orderkey")
  }

  /** q32: global multi-key sort, explicit null ordering (SURVEY §7.4). */
  def q32(s: SparkSession, d: String): DataFrame =
    orders(s, d).select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").desc_nulls_last, col("o_orderkey").asc)

  /** q33: top-k — TakeOrderedAndProject (per-partition heap + merge). */
  def q33(s: SparkSession, d: String): DataFrame =
    orders(s, d).select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)

  /** q34: pagination — LIMIT/OFFSET after a total order. */
  def q34(s: SparkSession, d: String): DataFrame =
    orders(s, d).select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .offset(100).limit(50)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)

  /** q35: UNION ALL + DISTINCT across heterogeneous sources. */
  def q35(s: SparkSession, d: String): DataFrame = {
    val a = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"), lit("urgent").as("src"))
    val b = customer(s, d).filter(col("c_acctbal") > 8000)
      .select(col("c_custkey").as("custkey"), lit("rich").as("src"))
    a.unionByName(b).distinct()
      .select("src", "custkey").orderBy("src", "custkey")
  }

  /** q36: INTERSECT / EXCEPT (set semantics, deduplicated — §7.4). */
  def q36(s: SparkSession, d: String): DataFrame = {
    val a = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
    val b = customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey"))
    a.intersect(b).withColumn("op", lit("intersect"))
      .unionByName(a.except(b).withColumn("op", lit("except")))
      .select("op", "custkey").orderBy("op", "custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_window_rank" -> q27, "q28_window_lag_lead" -> q28,
    "q29_window_frame_rows" -> q29, "q30_window_frame_range" -> q30,
    "q31_window_analytic" -> q31, "q32_sort_multi" -> q32,
    "q33_topk_limit" -> q33, "q34_limit_offset" -> q34,
    "q35_union_all" -> q35, "q36_intersect_except" -> q36)

  val oracle: Map[String, String] = Map(
    "q27_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q28_window_lag_lead" ->
      """SELECT user_id, event_id,
        |  (epoch_ns(ts) - lag(epoch_ns(ts), 1) OVER w) // 1000000000 AS gap_sec,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin,
    "q29_window_frame_rows" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q30_window_frame_range" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INT) AS day_num,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum30
        |FROM orders ORDER BY o_custkey, day_num, o_orderkey""".stripMargin,
    "q31_window_analytic" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(NTILE(5) OVER w AS INT) AS nt,
        |  PERCENT_RANK() OVER w AS pr,
        |  CUME_DIST() OVER w AS cd,
        |  FIRST_VALUE(o_orderkey) OVER wf AS first_key,
        |  LAST_VALUE(o_orderkey) OVER wf AS last_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice ASC, o_orderkey ASC),
        |  wf AS (PARTITION BY o_orderstatus
        |         ORDER BY o_totalprice ASC, o_orderkey ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q32_sort_multi" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority DESC NULLS LAST, o_orderkey ASC""".stripMargin,
    "q33_topk_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q34_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50 OFFSET 100""".stripMargin,
    "q35_union_all" ->
      """SELECT DISTINCT src, custkey FROM (
        |  SELECT o_custkey AS custkey, 'urgent' AS src FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT c_custkey, 'rich' FROM customer WHERE c_acctbal > 8000)
        |ORDER BY src, custkey""".stripMargin,
    "q36_intersect_except" ->
      """SELECT 'intersect' AS op, custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |UNION ALL
        |SELECT 'except' AS op, custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |ORDER BY op, custkey""".stripMargin)
}
