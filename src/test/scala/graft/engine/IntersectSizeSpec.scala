package graft.engine

import org.apache.spark.sql.functions._

/** graft_intersect_size — the sorted-merge exact-verify kernel
  * (functions/IntersectSize.scala): parity with size(array_intersect)
  * on valid input, loud failure on contract violations, both element
  * types, both execution paths (whole-stage codegen via DataFrame, and
  * the interpreted eval via a no-codegen fallback expression tree). */
class IntersectSizeSpec extends SparkTestBase {

  private def registered = {
    graft.GraftExtensions.register(spark)
    spark
  }

  test("graft_intersect_size: parity with size(array_intersect) on " +
    "random sorted-distinct string arrays") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 40).map(i => f"tok$i%02d")
    val rows = (0 until 300).map { _ =>
      def set() = rnd.shuffle(vocab).take(1 + rnd.nextInt(12)).sorted
      (set(), set())
    }
    val got = rows.toDF("a", "b")
      .select(expr("graft_intersect_size(a, b)").as("n"),
        size(array_intersect($"a", $"b")).as("m"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("graft_intersect_size: parity on sorted-distinct bigint arrays " +
    "(the shingle-digest type)") {
    val s = registered
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { _ =>
      def set() = Seq.fill(1 + rnd.nextInt(15))(rnd.nextLong() % 50)
        .distinct.sorted
      (set(), set())
    }
    val got = rows.toDF("a", "b")
      .select(expr("graft_intersect_size(a, b)").as("n"),
        size(array_intersect($"a", $"b")).as("m"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("graft_intersect_size: empty arrays, disjoint, identical, null " +
    "array propagation") {
    val s = registered
    val one = s.sql(
      """SELECT
        |  graft_intersect_size(array('a','b'), CAST(array() AS array<string>)) AS e,
        |  graft_intersect_size(array('a','b'), array('c','d')) AS d,
        |  graft_intersect_size(array('a','b','c'), array('a','b','c')) AS i,
        |  graft_intersect_size(CAST(NULL AS array<string>), array('a')) AS n
        |""".stripMargin).head()
    assert(one.getInt(0) === 0)
    assert(one.getInt(1) === 0)
    assert(one.getInt(2) === 3)
    assert(one.isNullAt(3))
  }

  test("graft_intersect_size: unsorted input fails LOUDLY (silent " +
    "miscount is the alternative)") {
    val s = registered
    val ex = intercept[Exception] {
      s.sql("SELECT graft_intersect_size(array('b','a'), array('a','b'))")
        .collect()
    }
    assert(ex.getMessage.contains("strictly increasing") ||
      Option(ex.getCause).exists(_.getMessage.contains("strictly increasing")))
  }

  test("graft_intersect_size: duplicate elements fail LOUDLY (strictness " +
    "doubles as the distinct check)") {
    val s = registered
    val ex = intercept[Exception] {
      s.sql("SELECT graft_intersect_size(array('a','a','b'), array('a','b'))")
        .collect()
    }
    assert(ex.getMessage.contains("strictly increasing") ||
      Option(ex.getCause).exists(_.getMessage.contains("strictly increasing")))
  }

  test("graft_intersect_size: null ELEMENT fails loudly, never miscounts") {
    val s = registered
    val ex = intercept[Exception] {
      s.sql("SELECT graft_intersect_size(array('a', CAST(NULL AS string)), " +
        "array('a','b'))").collect()
    }
    assert(ex.getMessage.contains("null array element") ||
      Option(ex.getCause).exists(_.getMessage.contains("null array element")))
  }

  test("graft_intersect_size: interpreted eval path agrees with codegen " +
    "(direct Expression.eval, no WholeStageCodegen)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: String*) = Literal.create(
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray),
      ArrayType(StringType))
    val e = graft.functions.IntersectSize(
      arr("a", "b", "d"), arr("b", "c", "d", "e"))
    assert(e.eval(null) === 2)
    val bad = graft.functions.IntersectSize(
      arr("b", "a"), arr("a", "b"))
    val ex = intercept[IllegalArgumentException](bad.eval(null))
    assert(ex.getMessage.contains("strictly increasing"))
  }

  test("graft_intersect_size: rejects mismatched / unsupported types at " +
    "analysis") {
    val s = registered
    val ex = intercept[Exception] {
      s.sql("SELECT graft_intersect_size(array(1.5D), array(2.5D))").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<string>") ||
      ex.getMessage.toLowerCase.contains("datatype_mismatch") ||
      ex.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
