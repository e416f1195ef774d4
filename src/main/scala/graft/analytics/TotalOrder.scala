package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global-order machinery — rank and running sum over a corpus-wide
  * total order — WITHOUT a single-partition window.
  *
  * `row_number().over(Window.orderBy(...))` funnels the ENTIRE input
  * through one task (Spark itself warns "No Partition Defined for Window
  * operation"); at 100 TB that is a non-starter. But a global ORDER BY is
  * not inherently serial — a distributed sort range-partitions on the sort
  * key and every partition's global position is its range bucket's offset.
  * This helper states that decomposition explicitly:
  *
  *  1. **Bucket** each row by a deterministic, order-monotone range split
  *     of the primary sort value (arithmetic split of [min, max], or a
  *     caller-supplied a-priori range when the value is bounded by
  *     construction, e.g. a quality score in [0, 1]). Equal values land in
  *     the same bucket, so bucket order refines to the full
  *     (value DESC, tiebreak ASC) order.
  *  2. **Histogram** the buckets — one partial-aggregated job reducing the
  *     corpus to ≤ nBuckets rows; the per-bucket totals come back to the
  *     driver (control-plane, the k13-probe-keys precedent) and re-enter
  *     the plan as a LITERAL offset map, so the main plan needs no extra
  *     join and no window over the tiny table.
  *  3. **Rank within buckets** — `Window.partitionBy(__bkt)` — fully
  *     parallel, plus the bucket's exclusive prefix offset.
  *
  * The result is bit-identical to the single-partition form (the offsets
  * are exact counts, the within-bucket order is the same total order), so
  * oracle SQL stating the plain `OVER (ORDER BY ...)` still matches. Cost:
  * one extra pruned pass over the input (two when min/max must be
  * measured) versus a serialization point — at scale the scans win by
  * construction; a skewed bucket degrades to that bucket's size, never the
  * corpus (raise nBuckets, or feed a pre-aggregated stats table).
  *
  * Determinism: the bucket expression is a pure per-row function of the
  * (lo, hi) literals; min/max are order-insensitive aggregates; so the
  * histogram job and the main plan assign every row the same bucket.
  */
private[analytics] object TotalOrder {

  private val DefaultBuckets = 64

  /** Order-monotone range bucket for DESCENDING order on `value`: larger
    * values map to smaller bucket ids, ties share a bucket.
    */
  private def descBucket(value: Column, lo: Double, hi: Double, nB: Int): Column =
    if (!(hi > lo)) lit(0)
    else least(lit(nB - 1), greatest(lit(0),
      floor((lit(hi) - value.cast("double")) * nB / (hi - lo)).cast("int")))

  private def minMax(df: DataFrame, value: Column): (Double, Double) = {
    val r = df.agg(min(value).cast("double"), max(value).cast("double")).head()
    if (r.isNullAt(0)) (0.0, 0.0) else (r.getDouble(0), r.getDouble(1))
  }

  /** Exclusive prefix offset per bucket: one corpus-reducing histogram job
    * (≤ nB rows collected — control-plane), folded into a literal map.
    */
  private def offsetExpr(bucketed: DataFrame, weight: Column): Column = {
    val rows = bucketed.groupBy("__bkt").agg(sum(weight).cast("long").as("__w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    if (rows.isEmpty) lit(0L)
    else {
      val offs = rows.map(_._1).zip(rows.map(_._2).scanLeft(0L)(_ + _))
      element_at(map(offs.flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*),
        col("__bkt"))
    }
  }

  /** Adds `rkName` = exact 0-based global rank by (value DESC, tie ASC).
    * `knownRange` skips the min/max pass when the value is bounded by
    * construction.
    */
  def rankDesc(df: DataFrame, value: Column, tie: Column, rkName: String,
               knownRange: Option[(Double, Double)] = None,
               nB: Int = DefaultBuckets): DataFrame = {
    val (lo, hi) = knownRange.getOrElse(minMax(df, value))
    val b = df.withColumn("__bkt", descBucket(value, lo, hi, nB))
    val w = Window.partitionBy("__bkt").orderBy(value.desc, tie)
    b.withColumn(rkName, offsetExpr(b, lit(1L)) + row_number().over(w) - 1)
      .drop("__bkt")
  }

  /** Adds `cumName` = exact inclusive running sum of `sumCol` in
    * (value DESC, tie ASC) order — the distributed prefix sum.
    */
  def runningSumDesc(df: DataFrame, value: Column, tie: Column, sumCol: Column,
                     cumName: String, knownRange: Option[(Double, Double)] = None,
                     nB: Int = DefaultBuckets): DataFrame = {
    val (lo, hi) = knownRange.getOrElse(minMax(df, value))
    val b = df.withColumn("__bkt", descBucket(value, lo, hi, nB))
    val w = Window.partitionBy("__bkt").orderBy(value.desc, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn(cumName, offsetExpr(b, sumCol) + sum(sumCol).over(w))
      .drop("__bkt")
  }
}
