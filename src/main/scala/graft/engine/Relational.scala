package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** SURVEY §2.1–§2.4: scans, predicates, joins, aggregations.
  *
  * Scale notes (100 TB): every scan here projects/filters before anything
  * else so parquet pushdown + pruning apply; small dimensions are broadcast
  * explicitly; big-big joins shuffle on their natural keys and rely on AQE
  * for skew/partition coalescing. No collect(), no driver-side loops.
  */
object Relational {

  // ---- §2.1 scans ---------------------------------------------------------

  /** q01: projection-only scan — vectorized parquet read, column pruning. */
  def q01(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** q02: scan + predicate pushdown (row-group stats skip at scale). */
  def q02(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("ship_date", to_date(col("l_shipdate")))
      .filter(col("ship_date") >= lit("1998-01-01").cast("date") &&
        col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), date_format(col("ship_date"), "yyyy-MM-dd").as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber")

  /** q03: semi-structured ingestion — JSON props → typed column. */
  def q03(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .filter(col("k_val") >= 50)
      .orderBy("event_id")

  /** q04: partitioned materialization round-trip (date-partitioned layout is
    * the 100 TB story; here partitioned by l_returnflag into a temp dir). */
  def q04(s: SparkSession, d: String): DataFrame = {
    val tmp = Tables.scratchDir("graft_q04_")
    // explicit exchange on the partition key before the write (guide
    // §6): the single-split source otherwise encodes every partition's
    // parquet from ONE task; keyed distribution writes each
    // l_returnflag dir from its own task — same one-file-per-partition
    // layout, 3× the encode parallelism (AQE would coalesce a bare
    // keyed repartition of this size back to one task)
    lineitem(s, d).select("l_orderkey", "l_quantity", "l_returnflag")
      .repartition(math.max(s.sparkContext.defaultParallelism, 1),
        col("l_returnflag"))
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(tmp)
    s.read.parquet(tmp)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")
  }

  // ---- §2.2 projections / predicates -------------------------------------

  /** q05: computed projection (revenue expression used by every TPC-H-ish q). */
  def q05(s: SparkSession, d: String): DataFrame = {
    val ep = col("l_extendedprice").cast("decimal(12,2)")
    val oneMinusD = lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")
    val onePlusT = lit(1).cast("decimal(3,2)") + col("l_tax").cast("decimal(3,2)")
    lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      concat_ws("-", col("l_returnflag"), col("l_linestatus")).as("flag_status"),
      (ep * oneMinusD).cast("double").as("revenue"),
      (ep * oneMinusD * onePlusT).cast("double").as("charge"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q06: predicate taxonomy — IN / LIKE / BETWEEN / <> / IS NOT NULL. */
  def q06(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter((col("o_orderpriority").isin("1-URGENT", "2-HIGH") ||
        col("o_orderpriority").like("3-%")) &&
        col("o_totalprice").between(10000, 200000) &&
        col("o_orderstatus") =!= "P" &&
        col("o_orderkey").isNotNull)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice")
      .orderBy("o_orderkey")

  /** q07: CASE/WHEN banding (the reference's range-rule evaluator shape). */
  def q07(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey"), col("c_acctbal"),
      when(col("c_acctbal") < 0, "negative")
        .when(col("c_acctbal") < 2000, "low")
        .when(col("c_acctbal") < 5000, "mid")
        .when(col("c_acctbal") < 8000, "high")
        .otherwise("top").as("band"))
      .orderBy("c_custkey")

  // ---- §2.3 joins ---------------------------------------------------------

  /** q08: equi inner join, both sides above broadcast threshold at scale. */
  def q08(s: SparkSession, d: String): DataFrame =
    orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")
      .orderBy("o_orderkey")

  /** q09: star join through broadcast dims (nation 25 rows, region 5). */
  def q09(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("cnt"), (decSum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      .orderBy("r_name", "n_name")

  /** q10: big-big join, sort-merge hinted (AQE may re-pick; result-stable). */
  def q10(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).hint("merge")
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(
        revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_orderstatus")

  /** q11: left outer join, null-extended side aggregated with COALESCE. */
  def q11(s: SparkSession, d: String): DataFrame = {
    val big = orders(s, d).filter(col("o_totalprice") > 300000)
    customer(s, d).join(big, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_orderkey")).as("big_cnt"),
        coalesce(decSum(col("o_totalprice")), lit(0.0)).as("big_sum"))
      .orderBy("c_custkey")
  }

  /** q12: full outer join on partially-overlapping key sets. */
  def q12(s: SparkSession, d: String): DataFrame = {
    val a = customer(s, d).filter(col("c_acctbal") > 8000)
      .select("c_custkey", "c_acctbal")
    val b = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_custkey").agg(count(lit(1)).as("urgent_cnt"))
    a.join(b, col("c_custkey") === col("o_custkey"), "full")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_acctbal"), col("urgent_cnt"))
      .orderBy("custkey")
  }

  /** q13: left-semi (EXISTS). */
  def q13(s: SparkSession, d: String): DataFrame =
    customer(s, d).join(
      orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
      col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey")

  /** q14: left-anti (NOT EXISTS). */
  def q14(s: SparkSession, d: String): DataFrame =
    customer(s, d).join(
      orders(s, d).filter(col("o_orderpriority") === "5-LOW"),
      col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")

  /** q15: cartesian product of tiny dims. */
  def q15(s: SparkSession, d: String): DataFrame =
    region(s, d).crossJoin(nation(s, d))
      .select("r_regionkey", "n_nationkey", "r_name", "n_name")
      .orderBy("r_regionkey", "n_nationkey")

  /** q16: theta/range join against a broadcast band table (BNLJ). */
  def q16(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("budget", 0.0, 500.0), ("standard", 500.0, 1000.0),
      ("premium", 1000.0, 1500.0), ("luxury", 1500.0, 1e9))
      .toDF("band", "lo", "hi")
    part(s, d).join(broadcast(bands),
      col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .select("p_partkey", "p_retailprice", "band")
      .orderBy("p_partkey")
  }

  /** q17: time-interval join — views within the hour before each purchase.
    * Equi on user_id + ns-long range predicate ⇒ shuffled join on user, no
    * cartesian blow-up at scale. */
  def q17(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select("event_id", "user_id", "event_type", "ts")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
    p.join(v, col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - lit(3600000000000L) && col("v_ts") <= col("p_ts"),
      "left")
      .groupBy(col("p_id").as("event_id"), col("p_user").as("user_id"))
      .agg(count(col("v_id")).as("view_cnt"))
      .orderBy("event_id")
  }

  /** q18: as-of join — latest click at-or-before each purchase, per user.
    * Binding of [[graft.api.GraftOps.asofJoin]]: Spark has no native ASOF,
    * so the operator unions both sides and carries the click id forward
    * with a last_value(IGNORE NULLS) window — one shuffle on user_id, no
    * self-join explosion. */
  def q18(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("prev_click_id"), col("user_id"), col("ts"))
    graft.api.GraftOps.asofJoin(purchases, clicks, "user_id", "ts",
      payload = Seq("prev_click_id"), tieBreak = Seq("prev_click_id"))
      .select("event_id", "user_id", "prev_click_id")
      .orderBy("event_id")
  }

  // ---- §2.4 aggregations --------------------------------------------------

  /** q19: TPC-H Q1-shape hash aggregation — partial+final combine at scale. */
  def q19(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag", "l_linestatus").agg(
      sum("l_quantity").as("sum_qty"),
      decSum(col("l_extendedprice")).as("sum_base_price"),
      revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
      chargeSum(col("l_extendedprice"), col("l_discount"), col("l_tax")).as("sum_charge"),
      (sum("l_quantity") / count(lit(1))).as("avg_qty"),
      (decSum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
      (sum(col("l_discount").cast("decimal(3,2)")).cast("double") / count(lit(1))).as("avg_disc"),
      count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q20: exact distinct counts (two-phase distinct aggregation). */
  def q20(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy("event_type")
      .agg(countDistinct("user_id").as("uniq_users"), count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** q21: HLL approximate distinct — the 100 TB cardinality path (no oracle;
    * tests assert ±2% vs exact). */
  def q21(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy("event_type")

  /** q22: ROLLUP + grouping_id over (returnflag, linestatus). */
  def q22(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).rollup("l_returnflag", "l_linestatus").agg(
      sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"),
      (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
        .cast("int").as("gid"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("grp_flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("grp_status"),
        col("gid"), col("sum_qty"), col("cnt"))
      .orderBy("gid", "grp_flag", "grp_status")

  /** q23: set aggregation — sorted + joined for determinism (§7.3.5). */
  def q23(s: SparkSession, d: String): DataFrame =
    orders(s, d).groupBy(col("o_custkey"))
      .agg(array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("prio_set"))
      .orderBy("o_custkey")

  /** q24: pivot with an explicit value list (determinism + single job). */
  def q24(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = events(s, d).groupBy("user_id")
      .pivot("event_type", types).agg(count(lit(1)))
    p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("user_id")
  }

  /** q25: higher moments per group (stddev rounded — float-sensitive). */
  def q25(s: SparkSession, d: String): DataFrame =
    orders(s, d).groupBy("o_orderstatus").agg(
      count(lit(1)).as("cnt"),
      (decSum(col("o_totalprice")) / count(lit(1))).as("avg_price"),
      r2(stddev_samp(col("o_totalprice"))).as("std_price"))
      .orderBy("o_orderstatus")

  /** q26: custom typed UDAF surface — max-by via Aggregator (graft.functions). */
  def q26(s: SparkSession, d: String): DataFrame = {
    val maxOrder = udaf(graft.functions.MaxOrderAgg)
    orders(s, d).groupBy("o_custkey")
      .agg(maxOrder(col("o_totalprice"), col("o_orderkey")).as("top_orderkey"))
      .orderBy("o_custkey")
  }

  /** q77: bucketed co-located join — both sides persisted bucketed+sorted
    * by the join key, so the sort-merge join runs with NO exchange on
    * either input (the Exchange that remains belongs to the final groupBy).
    * This is the pre-partitioning story for repeated 100 TB fact-fact
    * joins: pay the shuffle once at write time, never again at read time.
    * Catalog entries are overwritten idempotently with explicit temp-dir
    * locations (bucket metadata lives in the catalog, data on disk;
    * scratch dirs are swept at JVM exit). The fixed table names assume a
    * SINGLE-TENANT catalog — two processes sharing one warehouse would
    * re-point each other's tables mid-query (the harness runs
    * single-tenant; use per-run names if yours does not). */
  def q77(s: SparkSession, d: String): DataFrame = {
    val tmp = Tables.scratchDir("graft_q77_")
    lineitem(s, d).select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").option("path", s"$tmp/li")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_q77_lineitem")
    orders(s, d).select("o_orderkey", "o_orderstatus")
      .write.mode("overwrite").option("path", s"$tmp/ord")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_q77_orders")
    s.table("graft_q77_lineitem")
      .join(s.table("graft_q77_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(sum("l_quantity").as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_orderstatus")
  }

  /** q78: skew-mitigating salted join — the dimension side is replicated
    * across N salt buckets and the fact side hashes into them, splitting a
    * hot key's rows across N tasks instead of one straggler. Result is
    * provably identical to the unsalted join (the oracle is the plain
    * join); AQE's skew-join handles moderate skew automatically, explicit
    * salting is the hammer for the pathological keys. */
  def q78(s: SparkSession, d: String): DataFrame = {
    val nSalt = 8
    val fact = lineitem(s, d)
      .withColumn("salt",
        pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(nSalt)))
    val dim = part(s, d).select("p_partkey", "p_brand")
      .withColumn("salt", explode(sequence(lit(0), lit(nSalt - 1))))
    fact.join(dim,
        fact("l_partkey") === dim("p_partkey") && fact("salt") === dim("salt"))
      .groupBy("p_brand")
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("p_brand")
  }

  /** q83: CSV + JSONL interchange round-trip — the text source/sink
    * surface. Writes an orders projection to both formats, reads each back
    * with an EXPLICIT schema (inference is banned: one pass saved, no type
    * drift — §1.2), and aggregates per (format, status); matching the
    * parquet-side oracle proves the round-trip is lossless. Dates travel as
    * formatted strings; 2dp money doubles round-trip exactly through
    * shortest-decimal formatting, and the DECIMAL-sum discipline absorbs
    * them either way. */
  def q83(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val tmp = Tables.scratchDir("graft_q83_")
    val src = orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    src.write.mode("overwrite").json(s"$tmp/jsonl")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType), StructField("od", StringType)))
    val c = s.read.option("header", "true").schema(schema).csv(s"$tmp/csv")
      .withColumn("fmt", lit("csv"))
    val j = s.read.schema(schema).json(s"$tmp/jsonl")
      .withColumn("fmt", lit("jsonl"))
    c.unionByName(j)
      .groupBy("fmt", "o_orderstatus")
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("sum_price"),
        max("od").as("max_date"))
      .orderBy("fmt", "o_orderstatus")
  }

  /** q85: ORC source/sink round-trip — the second columnar interchange
    * format beyond parquet. Writes an orders projection to ORC, reads it
    * back with a pushed-down predicate (ORC does min/max stripe skipping +
    * column pruning like parquet), and aggregates; the parquet-derived
    * oracle proves losslessness. */
  def q85(s: SparkSession, d: String): DataFrame = {
    val tmp = Tables.scratchDir("graft_q85_")
    orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .write.mode("overwrite").orc(s"$tmp/orc")
    s.read.orc(s"$tmp/orc")
      .filter(col("o_totalprice") > 100000)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("sum_price"),
        max("o_orderkey").as("max_key"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_orc_roundtrip" -> q85,
    "q83_csv_jsonl_roundtrip" -> q83,
    "q01_scan_project" -> q01, "q02_scan_filter" -> q02,
    "q03_json_source" -> q03, "q04_partitioned_write" -> q04,
    "q05_derived_cols" -> q05, "q06_predicates" -> q06,
    "q07_case_when_band" -> q07, "q08_join_inner_hash" -> q08,
    "q09_join_broadcast" -> q09, "q10_join_sortmerge" -> q10,
    "q11_join_left_outer" -> q11, "q12_join_full_outer" -> q12,
    "q13_join_semi" -> q13, "q14_join_anti" -> q14,
    "q15_join_cross" -> q15, "q16_join_theta_range" -> q16,
    "q17_join_interval" -> q17, "q18_join_asof" -> q18,
    "q19_hash_agg" -> q19, "q20_count_distinct" -> q20,
    "q21_approx_distinct" -> q21, "q22_grouping_sets" -> q22,
    "q23_collect_set" -> q23, "q24_pivot" -> q24,
    "q25_stddev_skew" -> q25, "q26_typed_udaf" -> q26,
    "q77_bucketed_join" -> q77, "q78_salted_join" -> q78)

  private val decSumSql = (x: String) =>
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  private val revenueSumSql =
    """CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      | * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)""".stripMargin.replace("\n", " ")
  private val chargeSumSql =
    """CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      | * (1 - CAST(l_discount AS DECIMAL(3,2)))
      | * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)""".stripMargin.replace("\n", " ")

  val oracle: Map[String, String] = Map(
    "q85_orc_roundtrip" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  ${decSumSql("o_totalprice")} AS sum_price,
        |  MAX(o_orderkey) AS max_key
        |FROM orders WHERE o_totalprice > 100000
        |GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q83_csv_jsonl_roundtrip" ->
      s"""WITH f AS (SELECT * FROM (VALUES ('csv'), ('jsonl')) t(fmt)),
        |a AS (SELECT o_orderstatus, COUNT(*) AS n,
        |  ${decSumSql("o_totalprice")} AS sum_price,
        |  MAX(strftime(o_orderdate, '%Y-%m-%d')) AS max_date
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT fmt, o_orderstatus, n, sum_price, max_date
        |FROM f CROSS JOIN a ORDER BY fmt, o_orderstatus""".stripMargin,
    "q77_bucketed_join" ->
      s"""SELECT o_orderstatus, SUM(l_quantity) AS sum_qty,
        |  ${decSumSql("l_extendedprice")} AS sum_price, COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q78_salted_join" ->
      s"""SELECT p_brand, $revenueSumSql AS revenue, COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_json_source" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
        |ORDER BY event_id""".stripMargin,
    "q04_partitioned_write" ->
      """SELECT l_returnflag, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q05_derived_cols" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_returnflag || '-' || l_linestatus AS flag_status,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (1 - CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (1 - CAST(l_discount AS DECIMAL(3,2)))
        |    * (1 + CAST(l_tax AS DECIMAL(3,2))) AS DOUBLE) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q06_predicates" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        |FROM orders
        |WHERE (o_orderpriority IN ('1-URGENT','2-HIGH') OR o_orderpriority LIKE '3-%')
        |  AND o_totalprice BETWEEN 10000 AND 200000
        |  AND o_orderstatus <> 'P' AND o_orderkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "q07_case_when_band" ->
      """SELECT c_custkey, c_acctbal,
        |  CASE WHEN c_acctbal < 0 THEN 'negative' WHEN c_acctbal < 2000 THEN 'low'
        |       WHEN c_acctbal < 5000 THEN 'mid' WHEN c_acctbal < 8000 THEN 'high'
        |       ELSE 'top' END AS band
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q08_join_inner_hash" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q09_join_broadcast" ->
      s"""SELECT r_name, n_name, COUNT(*) AS cnt,
        |  ${decSumSql("c_acctbal")} / COUNT(*) AS avg_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q10_join_sortmerge" ->
      s"""SELECT o_orderstatus,
        |  $revenueSumSql AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q11_join_left_outer" ->
      s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS big_cnt,
        |  COALESCE(${decSumSql("o_totalprice")}, 0) AS big_sum
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q12_join_full_outer" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_acctbal, urgent_cnt
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 8000) a
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS urgent_cnt FROM orders
        |           WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) b
        |  ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q13_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q14_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '5-LOW')
        |ORDER BY c_custkey""".stripMargin,
    "q15_join_cross" ->
      """SELECT r_regionkey, n_nationkey, r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,
    "q16_join_theta_range" ->
      """SELECT p_partkey, p_retailprice, band
        |FROM part JOIN (VALUES ('budget', 0.0, 500.0), ('standard', 500.0, 1000.0),
        |  ('premium', 1000.0, 1500.0), ('luxury', 1500.0, 1e9)) AS b(band, lo, hi)
        |  ON p_retailprice >= lo AND p_retailprice < hi
        |ORDER BY p_partkey""".stripMargin,
    "q17_join_interval" ->
      """SELECT p.event_id, p.user_id, COUNT(v.event_id) AS view_cnt
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        |  AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
        |GROUP BY p.event_id, p.user_id ORDER BY p.event_id""".stripMargin,
    "q18_join_asof" ->
      """SELECT event_id, user_id, prev_click_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts ASC,
        |              (CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) DESC,
        |              event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_click_id
        |  FROM events WHERE event_type IN ('click', 'purchase'))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q19_hash_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  ${decSumSql("l_extendedprice")} AS sum_base_price,
        |  $revenueSumSql AS sum_disc_price,
        |  $chargeSumSql AS sum_charge,
        |  SUM(l_quantity) / COUNT(*) AS avg_qty,
        |  ${decSumSql("l_extendedprice")} / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q20_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS uniq_users, COUNT(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q22_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS grp_flag,
        |  COALESCE(l_linestatus, 'ALL') AS grp_status,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
        |  SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, grp_flag, grp_status""".stripMargin,
    "q23_collect_set" ->
      """SELECT o_custkey,
        |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prio_set
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q24_pivot" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q25_stddev_skew" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
        |  ${decSumSql("o_totalprice")} / COUNT(*) AS avg_price,
        |  ROUND(STDDEV_SAMP(o_totalprice), 2) AS std_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q26_typed_udaf" ->
      """SELECT o_custkey, top_orderkey FROM (
        |  SELECT o_custkey, o_orderkey AS top_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin)
}
