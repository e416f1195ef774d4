package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Sequential-fold dot product of two `array<double>` columns as a NATIVE
  * codegen'd expression (`graft_dot`).
  *
  * Bit-identical by construction to the composed higher-order form the
  * engine used before (Vec.dot):
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * i.e. a STRICT left fold `((0 + a0·b0) + a1·b1) + …` in IEEE double —
  * the same order DuckDB's `list_dot_product` on `DOUBLE[]` evaluates, so
  * the ANN oracles stay hash-green (DotProductSpec pins the equivalence
  * property against the composed form).
  *
  * Why native: Spark's higher-order functions (`ZipWith`, `ArrayAggregate`)
  * evaluate their lambda INTERPRETED per element — the ANN hot path
  * (|probes|·n pair scores at dim elements each) pays a closure dispatch
  * and boxing per element, and the surrounding whole-stage codegen breaks
  * at the HOF. `doGenCode` emits one tight fused Java loop per pair.
  *
  * Null semantics mirror the composed form: null array → null (standard
  * null propagation); length mismatch → null (zip_with pads with null, the
  * product poisons the fold); any null ELEMENT → null (same poisoning).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two array<double> arguments, got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc = acc + x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // nullSafeCodeGen has already handled null INPUTS; the body may still
      // null the RESULT (length mismatch / null element) via ev.isNull.
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc = $acc + $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
