package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** SURVEY §2.6: scalar function library + UDF/UDTF surface.
  *
  * One kitchen-sink projection per family; built-in `functions._` only
  * (codegen'd, pushdown-friendly) except the single demonstrative Scala UDF
  * in q26b-style banding inside q40 is deliberately avoided — built-ins
  * stay on the whole-stage-codegen hot path. Regexes stay in the
  * Java∩RE2 dialect intersection (SURVEY §7.4).
  */
object Scalars {

  /** q37: string functions over part. */
  def q37(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      substring(col("p_name"), 1, 8).as("sub8"),
      length(col("p_name")).as("len"),
      concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
      regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
      expr("replace(p_name, ' ', '_')").as("snake"),
      lpad(col("p_size").cast("string"), 3, "0").as("size_pad"),
      instr(col("p_name"), "a").as("pos_a"),
      trim(concat(lit(" "), col("p_brand"), lit(" ")), " ").as("trimmed"),
      col("p_type").like("%a%").cast("int").as("has_a"))
      .orderBy("p_partkey")

  /** q38: date/time functions over o_orderdate (fixed anchor, never now()). */
  def q38(s: SparkSession, d: String): DataFrame = {
    val dt = to_date(col("o_orderdate"))
    orders(s, d).select(
      col("o_orderkey"),
      year(dt).as("y"), month(dt).as("m"), dayofmonth(dt).as("dd"),
      dayofweek(dt).as("dow"),
      date_format(date_trunc("month", dt), "yyyy-MM-dd").as("month_start"),
      datediff(lit(OrdersAnchor).cast("date"), dt).as("days_to_anchor"),
      date_format(add_months(dt, 3), "yyyy-MM-dd").as("plus3m"),
      ((lit(2001) - year(dt)) * 12 + (lit(9) - month(dt))).as("month_diff"),
      unix_timestamp(dt.cast("timestamp")).as("epoch_s"),
      date_format(dt, "yyyy/MM/dd").as("fmt"))
      .orderBy("o_orderkey")
  }

  /** q39: math functions over part. */
  def q39(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_partkey"),
      r2(col("p_retailprice")).as("price2"),
      abs(col("p_size") - 25).as("ab"),
      ceil(col("p_retailprice")).cast("long").as("ce"),
      floor(col("p_retailprice")).cast("long").as("fl"),
      pow(col("p_size"), 2).cast("long").as("pw"),
      r4(sqrt(col("p_retailprice"))).as("sq"),
      r4(log(col("p_retailprice"))).as("ln_"),
      r4(log10(col("p_retailprice"))).as("lg"),
      pmod(col("p_size"), lit(7)).as("pm"),
      signum(col("p_retailprice") - 1000).cast("int").as("sg"))
      .orderBy("p_partkey")

  /** q40: conditional functions over customer. */
  def q40(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("SUPPRESSED")).as("seg2"),
      greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
      least(col("c_acctbal"), lit(5000.0)).as("bal_cap"),
      when(col("c_acctbal") < 0, "neg").otherwise("pos").as("flag"),
      nullif(col("c_nationkey"), lit(0)).as("nz"))
      .orderBy("c_custkey")

  /** q41: array functions + higher-order lambdas over document tokens. */
  def q41(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", toks(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tok"),
        array_contains(col("toks"), "data").cast("int").as("has_data"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        array_join(slice(col("toks"), 1, 3), "-").as("first3"),
        array_join(slice(sort_array(array_distinct(col("toks"))), 1, 5), "-").as("sorted5"),
        expr("aggregate(toks, 0, (acc, x) -> acc + length(x))").cast("long").as("total_chars"),
        expr("size(filter(toks, x -> length(x) > 4))").as("long_toks"),
        array_join(sequence(lit(1), size(col("toks")) % 5 + 1), "-").as("seq_str"))
      .orderBy("doc_id")

  /** q42: generator/UDTF surface — explode to a word count (LATERAL VIEW). */
  def q42(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"), countDistinct("doc_id").as("n_docs"))
      .orderBy("word")

  /** q43: map/JSON functions over events.props. */
  def q43(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")))
      .select(
        col("event_id"),
        element_at(col("m"), "k").as("k_val"),
        size(map_keys(col("m"))).as("n_keys"),
        array_join(map_keys(col("m")), ",").as("keys_str"),
        get_json_object(col("props"), "$.k").as("k_str"))
      .orderBy("event_id")

  /** q26b: the 1-arg Scala UDF surface — size banding via udf(). Kept off
    * every other query's hot path deliberately: a Scala UDF is an opaque
    * function to Catalyst (kills pushdown + codegen), so built-ins or a
    * native Expression (graft_dot) are always preferred; this row exists to
    * cover the registration surface itself. */
  def q26b(s: SparkSession, d: String): DataFrame = {
    val sizeBand = udf((sz: Int) =>
      if (sz < 10) "small" else if (sz < 30) "medium" else "large")
    part(s, d).select(col("p_partkey"), col("p_size"),
      sizeBand(col("p_size")).as("size_band"))
      .orderBy("p_partkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_string_funcs" -> q37, "q38_date_funcs" -> q38,
    "q39_math_funcs" -> q39, "q40_conditional" -> q40,
    "q41_array_funcs" -> q41, "q42_explode_udtf" -> q42,
    "q43_map_json_funcs" -> q43, "q26b_scala_udf" -> q26b)

  val oracle: Map[String, String] = Map(
    "q26b_scala_udf" ->
      """SELECT p_partkey, p_size,
        |  CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium'
        |       ELSE 'large' END AS size_band
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q37_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS up, substring(p_name, 1, 8) AS sub8,
        |  CAST(length(p_name) AS INT) AS len, p_brand || '|' || p_type AS cat,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  replace(p_name, ' ', '_') AS snake,
        |  lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
        |  CAST(instr(p_name, 'a') AS INT) AS pos_a,
        |  trim(' ' || p_brand || ' ', ' ') AS trimmed,
        |  CAST(p_type LIKE '%a%' AS INT) AS has_a
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q38_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS y,
        |  CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS m,
        |  CAST(day(CAST(o_orderdate AS DATE)) AS INT) AS dd,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
        |  strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-09-01') AS INT) AS days_to_anchor,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |  CAST((2001 - year(CAST(o_orderdate AS DATE))) * 12
        |    + (9 - month(CAST(o_orderdate AS DATE))) AS INT) AS month_diff,
        |  CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS epoch_s,
        |  strftime(CAST(o_orderdate AS DATE), '%Y/%m/%d') AS fmt
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q39_math_funcs" ->
      """SELECT p_partkey, ROUND(p_retailprice, 2) AS price2,
        |  abs(p_size - 25) AS ab,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(pow(p_size, 2) AS BIGINT) AS pw,
        |  ROUND(sqrt(p_retailprice), 4) AS sq,
        |  ROUND(ln(p_retailprice), 4) AS ln_,
        |  ROUND(log10(p_retailprice), 4) AS lg,
        |  ((p_size % 7) + 7) % 7 AS pm,
        |  CAST(sign(p_retailprice - 1000) AS INT) AS sg
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q40_conditional" ->
      """SELECT c_custkey,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS seg2,
        |  GREATEST(c_acctbal, 0.0) AS bal_pos,
        |  LEAST(c_acctbal, 5000.0) AS bal_cap,
        |  CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS flag,
        |  NULLIF(c_nationkey, 0) AS nz
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q41_array_funcs" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
        |  CAST(list_contains(string_split(text, ' '), 'data') AS INT) AS has_data,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
        |  array_to_string(string_split(text, ' ')[1:3], '-') AS first3,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], '-') AS sorted5,
        |  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS total_chars,
        |  CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS INT) AS long_toks,
        |  array_to_string(range(1, (len(string_split(text, ' ')) % 5 + 1) + 1), '-') AS seq_str
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q42_explode_udtf" ->
      """SELECT word, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY word""".stripMargin,
    "q43_map_json_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |  CAST(len(json_keys(props)) AS INT) AS n_keys,
        |  array_to_string(json_keys(props), ',') AS keys_str,
        |  json_extract_string(props, '$.k') AS k_str
        |FROM events ORDER BY event_id""".stripMargin)
}
