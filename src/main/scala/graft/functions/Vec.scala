package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over `array<float>` embedding columns — built-in higher-order
  * functions only (codegen-friendly, no UDFs).
  *
  * Determinism contract: floats are widened to double BEFORE multiplying
  * (each float×float product is then exact in double), and the sum is a
  * strict sequential left fold (`aggregate`), which matches DuckDB's
  * `list_dot_product` on `::DOUBLE[]` bit-for-bit — verified empirically.
  * A parallel/pairwise reduction would be faster on very wide vectors but
  * loses cross-engine bit-equality; at embedding widths (≤ few k) the fold
  * is fine.
  */
object Vec {

  /** Cast a float array to double (exact widening). */
  def toDouble(a: Column): Column = transform(a, x => x.cast(DoubleType))

  /** Sequential-fold dot product of two double arrays — the native
    * codegen'd `graft_dot` expression (plans/DotProduct.scala), bit-identical
    * to the composed higher-order form it replaced
    * (`aggregate(zip_with(a,b,_*_), 0.0, _+_)`, kept as [[dotHof]] for the
    * equivalence property test). HOFs interpret their lambda per ELEMENT;
    * the ANN pair-scoring path evaluates |pairs|·dim of them, so the fused
    * loop is the difference between interpreted and compiled inner loops.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** The pre-native composed form; the DotProductSpec property pins
    * `dot == dotHof` bit-for-bit so oracle equality is preserved forever.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity, written exactly as dot/(sqrt·sqrt) so the oracle
    * can mirror the operation order.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine with pre-computed self-dot norms: bitwise-identical to
    * `cosine` (same fold, same operand order) but the O(dim) self-dots are
    * computed once per VECTOR instead of once per PAIR — the difference
    * between O(pairs·dim) and O(3·pairs·dim) in the join hot path.
    */
  def cosinePre(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (sqrt(normA) * sqrt(normB))

  /** Sign-LSH bucket: an integer code from the signs of the first `bits`
    * components (axis-aligned random-hyperplane LSH — deterministic here so
    * the oracle agrees; production would draw R gaussian hyperplanes and
    * multiprobe neighboring codes).
    */
  def signBucket(a: Column, bits: Int): Column =
    (1 to bits).map(j => when(element_at(a, j) > 0, lit(1 << (j - 1))).otherwise(lit(0)))
      .reduce(_ + _)
}
