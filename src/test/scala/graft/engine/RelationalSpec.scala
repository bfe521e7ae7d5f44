package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, count, lit}

/** SURVEY §5.2.2 — relational operators over the hermetic fixtures.
  * Expectations are hand-computed from SparkTestBase's literal rows. */
class RelationalSpec extends SparkTestBase {

  test("q07 banding: edges land in the declared bands (boundary = next band)") {
    val bands = Relational.q07(spark, fx).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(bands === Map(0L -> "low", 1L -> "mid", 2L -> "high", 3L -> "top",
      4L -> "negative", 5L -> "top"))
  }

  test("q13/q14: semi and anti joins partition customers correctly") {
    val semi = Relational.q13(spark, fx).collect().map(_.getLong(0)).toSet
    assert(semi === Set(0L)) // only cust 0 has a 1-URGENT order
    val anti = Relational.q14(spark, fx).collect().map(_.getLong(0)).toSet
    assert(anti === Set(0L, 2L, 3L, 4L, 5L)) // cust 1 holds the only 5-LOW
  }

  test("q19 hash agg: (N,O) group sums hand-checked") {
    val no = Relational.q19(spark, fx).collect()
      .find(r => r.getString(0) == "N" && r.getString(1) == "O").get
    assert(no.getAs[Double]("sum_qty") === 11.0) // 5+3+2+1
    assert(no.getAs[Long]("count_order") === 4L)
    assert(no.getAs[Double]("sum_base_price") === 100.0 + 200.0 + 150.0 + 120.0)
  }

  test("q26 typed max-by Aggregator: price tie resolved to larger order key") {
    val top = Relational.q26(spark, fx).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top(1L) === 21L) // orders 20 and 21 tie at 300.00
    assert(top(0L) === 11L)
  }

  test("q12 full outer join keeps both unmatched sides") {
    val rows = Relational.q12(spark, fx).collect()
    // rich-only: cust 3 (8000) & 5 (9000.25) [> 8000 strictly: only 5]; urgent-only: cust 0
    val keys = rows.map(_.getLong(0)).toSet
    assert(keys.contains(0L) && keys.contains(5L))
    val c0 = rows.find(_.getLong(0) == 0L).get
    assert(c0.isNullAt(1) && c0.getLong(2) === 2L) // no acctbal row, 2 urgent orders
  }

  test("q22 rollup emits detail, subtotal and grand-total rows") {
    val rows = Relational.q22(spark, fx).collect()
    val gids = rows.map(_.getInt(2)).toSet
    assert(gids === Set(0, 1, 3))
    val total = rows.find(_.getInt(2) == 3).get
    assert(total.getAs[Long]("cnt") === 8L)
  }

  test("q27 window rank: totalprice tie broken by order key ascending") {
    val cust1 = Windows.q27(spark, fx).collect().filter(_.getLong(0) == 1L)
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(cust1 === Map(1 -> 20L, 2 -> 21L, 3 -> 22L))
  }

  test("q33/q34: top-k and pagination windows are consistent") {
    val top = Windows.q33(spark, fx).collect().map(_.getLong(0))
    assert(top.head === 30L) // 400000.75 is the max
    assert(Windows.q34(spark, fx).collect().isEmpty) // offset 100 > 7 orders
  }

  test("q37 scalar strings: snake/sub8/trim behave") {
    val r = Scalars.q37(spark, fx).collect().find(_.getLong(0) == 0L).get
    assert(r.getAs[String]("snake") === "azure_metal_plate")
    assert(r.getAs[String]("sub8") === "azure me")
    assert(r.getAs[String]("trimmed") === "Brand#1")
  }

  test("q41 array HOFs: token math hand-checked") {
    val r = Scalars.q41(spark, fx).collect().find(_.getLong(0) == 3L).get
    assert(r.getAs[Int]("n_tok") === 3) // "omega psi chi"
    assert(r.getAs[Long]("total_chars") === 11L) // 5+3+3
  }

  test("q77 bucketed join: scans are bucketed and the join needs no exchange") {
    val df = Relational.q77(spark, fx)
    // drive the full query (result correctness)
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows("O") === 5L && rows("F") === 2L && rows("P") === 1L)
    // physical property: co-located SMJ — the only Exchange belongs to the
    // final groupBy, not the join inputs. The fixture tables are tiny, so
    // force the join path by disabling auto-broadcast for this check.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Relational.q77(spark, fx).queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), "scans must be bucketed")
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, "expected a sort-merge join")
      assert(!plan.substring(joinIdx).contains("Exchange"),
        "no shuffle below the bucketed join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q78 salted join: identical result to the plain unsalted join") {
    val salted = Relational.q78(spark, fx).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val plain = Tables.lineitem(spark, fx)
      .join(Tables.part(spark, fx), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(Tables.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("p_brand").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted === plain)
  }
}
