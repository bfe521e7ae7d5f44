package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, IntersectSize}

/** Session extension wiring for graft's native expressions.
  *
  * Two registration paths:
  *  - cluster deploy: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    injects the functions at session build time;
  *  - library use: `GraftExtensions.register(spark)` is idempotent and safe
  *    to call inside any query builder (the harness builds its own session,
  *    so query fns self-register — SURVEY §3.2 purity rule).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private val injections: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("graft_intersect_size",
      new ExpressionInfo(classOf[IntersectSize].getName,
        "graft_intersect_size"),
      (args: Seq[Expression]) => IntersectSize(args(0), args(1))))

  /** Idempotent per-session registration (temp functions).
    *
    * Registers only when the name is absent: `createOrReplaceTempFunction`
    * logs a "replaced a temporary function" WARN on every replace, and the
    * purity rule calls register() inside every query builder — 145 registry
    * keys × several passes flooded the bench driver's captured stdout tail
    * with that warning, displacing the final JSON line (VERDICT r15 §wrong
    * 2). The exists-check keeps the call idempotent and silent.
    */
  def register(s: SparkSession): Unit = {
    val reg: FunctionRegistry = s.sessionState.functionRegistry
    injections.foreach { case (name, _, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name))) {
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
      }
    }
  }
}
