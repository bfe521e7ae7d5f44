package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SimpleMode

/** Plan-inspection tool (SURVEY §4.2): prints the physical-plan lines that
  * prove the scale-critical properties — parquet filter pushdown, column
  * pruning, broadcast vs shuffle join selection, partial aggregation, and
  * the native dot-product expression staying inside codegen.
  * Run: `sbt "runMain graft.tools.ExplainCheck [sfDir]"`. */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    def show(name: String, df: org.apache.spark.sql.DataFrame,
        greps: Seq[String]): Unit = {
      val plan = df.queryExecution.explainString(SimpleMode)
      println(s"=== $name ===")
      greps.foreach { g =>
        plan.linesIterator.filter(_.contains(g)).take(2)
          .foreach(l => println("  " + l.trim.take(170)))
      }
    }
    show("q02 pushdown", graft.engine.Relational.q02(spark, d),
      Seq("PushedFilters", "ReadSchema"))
    show("q01 pruning", graft.engine.Relational.q01(spark, d), Seq("ReadSchema"))
    show("q09 broadcast", graft.engine.Relational.q09(spark, d),
      Seq("BroadcastHashJoin", "BroadcastExchange"))
    show("q10 smj", graft.engine.Relational.q10(spark, d), Seq("SortMergeJoin"))
    show("q08 big join", graft.engine.Relational.q08(spark, d),
      Seq("ShuffledHashJoin", "SortMergeJoin", "BroadcastHashJoin"))
    show("q19 partial agg", graft.engine.Relational.q19(spark, d),
      Seq("HashAggregate"))
    show("q66 native dot", graft.engine.VectorOps.q66(spark, d),
      Seq("BroadcastNestedLoopJoin", "graft_dot"))
    // dedup family: band joins must be equi-joins (no nested loop), and the
    // self-join sides must share one ReusedExchange over the fingerprint
    // pipeline rather than computing it twice.
    show("q79 simhash bands", graft.engine.TextOps.q79(spark, d),
      Seq("ReusedExchange", "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"))
    show("q81 shingle buckets", graft.engine.TextOps.q81(spark, d),
      Seq("ReusedExchange", "BroadcastHashJoin", "SortMergeJoin"))
    show("q80 cosine pairs", graft.engine.VectorOps.q80(spark, d),
      Seq("BroadcastNestedLoopJoin", "graft_dot"))
    spark.stop()
  }
}
