package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}
import graft.functions.Vec

/** graft_dot (the native codegen'd fold, plans/DotProduct.scala) must be
  * BIT-identical to the composed higher-order form it replaced — the ANN
  * oracles' hash equality with DuckDB's `list_dot_product` depends on the
  * exact `((0+a0·b0)+a1·b1)+…` left-fold order, so "close" is not enough.
  */
class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native dot is bit-identical to the HOF fold on the real corpus") {
    val v = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Vec.toDouble(col("embedding")).as("e"))
    val pairs = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
    val diff = pairs.select(
        Vec.dot(col("a.e"), col("b.e")).as("fast"),
        Vec.dotHof(col("a.e"), col("b.e")).as("slow"))
      // <=> is exact on doubles (NaN-safe); any last-bit divergence counts
      .filter(!(col("fast") <=> col("slow")))
      .count()
    assert(diff == 0)
  }

  test("null semantics match the HOF fold: null array, null element, length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))), // 11.0
      (None, Some(Seq(Some(1.0), Some(2.0)))),                            // null array
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(3.0), Some(4.0)))),      // null element
      (Some(Seq(Some(1.0))), Some(Seq(Some(3.0), Some(4.0))))             // length mismatch
    ).toDF("a", "b")
    val rows = df.select(
      Vec.dot(col("a"), col("b")).as("fast"),
      Vec.dotHof(col("a"), col("b")).as("slow")).collect()
    assert(rows.head.getDouble(0) == 11.0)
    rows.foreach { r => assert(r.isNullAt(0) == r.isNullAt(1),
      s"null semantics diverge: $r") }
    // the composed form poisons to null in all three degenerate cases
    assert(rows.drop(1).forall(_.isNullAt(0)))
  }

  test("interpreted eval (nullSafeEval) agrees with codegen") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import graft.plans.DotProduct

    val expected = 0.1 * 0.4 + 0.2 * 0.5 + 0.3 * 0.6 // same fold order
    val df = Seq((Seq(0.1, 0.2, 0.3), Seq(0.4, 0.5, 0.6))).toDF("a", "b")
    val viaCodegen = df.select(Vec.dot(col("a"), col("b"))).head.getDouble(0)
    assert(viaCodegen == expected)

    // 1) exercise nullSafeEval DIRECTLY — BinaryExpression.eval handles
    // null inputs then dispatches to nullSafeEval, so .eval(null) runs
    // the interpreted body, not the generated code.
    def arr(xs: Seq[java.lang.Double]) =
      Literal.create(xs, ArrayType(DoubleType))
    def d(x: Double): java.lang.Double = x
    val viaInterp = DotProduct(arr(Seq(d(0.1), d(0.2), d(0.3))),
      arr(Seq(d(0.4), d(0.5), d(0.6)))).eval(null)
    assert(viaInterp == expected, "interpreted result diverges from codegen")
    // degenerate cases must null out on the interpreted path too
    assert(DotProduct(Literal.create(null, ArrayType(DoubleType)),
      arr(Seq(d(1.0)))).eval(null) == null, "null array")
    assert(DotProduct(arr(Seq(d(1.0), null)),
      arr(Seq(d(3.0), d(4.0)))).eval(null) == null, "null element")
    assert(DotProduct(arr(Seq(d(1.0))),
      arr(Seq(d(3.0), d(4.0)))).eval(null) == null, "length mismatch")

    // 2) and through the full execution stack with codegen disabled —
    // the fallback path a codegen compile failure would actually take.
    val conf = spark.conf
    val oldWs = conf.get("spark.sql.codegen.wholeStage", "true")
    val oldFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val viaNoCodegen = df.select(Vec.dot(col("a"), col("b"))).head.getDouble(0)
      assert(viaNoCodegen == expected)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", oldWs)
      conf.set("spark.sql.codegen.factoryMode", oldFm)
    }
  }
}
