package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Document-fingerprint rolling hash as a NATIVE Catalyst expression:
  * `h = fold(bytes, (h, b) => (h * 31 + b) mod 1_000_000_007)`.
  *
  * Why an Expression and not a UDF: `doGenCode` emits a tight Java loop
  * that fuses into whole-stage codegen — no boxing, no Scala closure call
  * per row, and the expression participates in constant folding and
  * null propagation like any built-in. This is the preference order the
  * engine follows when built-ins can't express a scalar (SURVEY.md §2.12):
  * native Expression > Scala UDF.
  *
  * The polynomial-mod form is the classic Rabin-Karp fingerprint; the
  * modulus keeps the fold in 63-bit range (31·(1e9+7)+255 < 2^63) so the
  * arithmetic is exact and engine-independent — DuckDB reproduces it with
  * a list_reduce over codepoints (ASCII inputs: byte == codepoint).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  private val Mod = 1000000007L

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xff)) % ${Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Engine extensions, registered at session build
  * (`spark.sql.extensions=graft.plans.GraftExtensions`): the custom
  * expression surface, callable from SQL and from
  * `functions.call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // arity is checked HERE: children.head alone would silently discard
    // extra arguments (wrong fingerprints on a user typo) and crash with a
    // bare NoSuchElementException on zero
    def unary(name: String, mk: Expression => Expression): Seq[Expression] => Expression =
      children => {
        require(children.length == 1, s"$name takes exactly one argument, got ${children.length}")
        mk(children.head)
      }
    ext.injectFunction((
      new FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      unary("graft_rolling_hash", RollingHash(_))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingles"),
      unary("graft_shingles", ShingleSet(_))))
    def binary(name: String, mk: (Expression, Expression) => Expression): Seq[Expression] => Expression =
      children => {
        require(children.length == 2, s"$name takes exactly two arguments, got ${children.length}")
        mk(children.head, children(1))
      }
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      binary("graft_dot", DotProduct(_, _))))
    // Spark's own runtime-filter machinery (InjectRuntimeFilter's bloom
    // aggregate + probe), surfaced as callable functions so the library's
    // semi-join reduction (functions/RuntimeFilter) can apply it where the
    // optimizer's injection heuristics decline. Analysis wraps the
    // AggregateFunction into an AggregateExpression as for any registered
    // aggregate.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      binary("graft_bloom_agg",
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(_, _))))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      binary("graft_might_contain",
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(_, _))))
    // frame ⋈ globalAgg(frame) → single-pass window (see the rule's doc;
    // born from the measured Q2/Q15/Q11 double-subtree regressions)
    ext.injectOptimizerRule(_ => GlobalScalarToWindow)
  }
}
