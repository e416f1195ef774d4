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
  *     (value DESC, tiebreak ASC) order. NULL values go to the LAST
  *     bucket and NaN to the FIRST, matching Spark's `value DESC` window
  *     semantics exactly (DESC defaults to NULLS LAST; NaN orders above
  *     every non-NaN double) — so the bit-equality contract extends to
  *     null/NaN inputs instead of silently mis-bucketing them.
  *  2. **Histogram** the buckets — one partial-aggregated job reducing the
  *     corpus to ≤ nBuckets rows; the per-bucket totals come back to the
  *     driver (control-plane, the k13-probe-keys precedent) and re-enter
  *     the plan as a LITERAL offset map, so the main plan needs no extra
  *     join and no window over the tiny table.
  *  3. **Skew refinement** — a VALUE-DEGENERATE corpus (most docs carrying
  *     one quality score / token count) puts most rows in ONE bucket and
  *     re-creates the funnel with a non-empty partitionSpec the scale
  *     guard cannot see (the r10 verdict's finding #3). The histogram
  *     already knows each bucket's row count and its value/tie ranges, so
  *     any bucket above `maxPartRows` is split a second level:
  *     - by a finer VALUE range when the bucket still spans distinct
  *       values (plain recursion of step 1 on [minᵦ, maxᵦ]);
  *     - by an ascending range split of the TIE key when the bucket is a
  *       single value (ties only — there the within-bucket order is
  *       purely `tie ASC`, so a tie-monotone split preserves it; applied
  *       only when the bucket's tie projection is fully non-null).
  *     Offsets stay exact counts and the within-partition order is the
  *     same total order, so the refinement is invisible to results. One
  *     refinement level; the extra histogram pass is paid ONLY when a
  *     saturated bucket exists.
  *  4. **Rank within partitions** — `Window.partitionBy(__pkt)` — fully
  *     parallel, plus the partition's exclusive prefix offset.
  *
  * The result is bit-identical to the single-partition form (the offsets
  * are exact counts, the within-bucket order is the same total order), so
  * oracle SQL stating the plain `OVER (ORDER BY ...)` still matches. Cost:
  * one extra pruned pass over the input (two when min/max must be
  * measured, three when a bucket saturates) versus a serialization point —
  * at scale the scans win by construction.
  *
  * Determinism: the bucket expression is a pure per-row function of the
  * (lo, hi) literals; min/max are order-insensitive aggregates; so the
  * histogram job and the main plan assign every row the same bucket.
  *
  * Tie-key contract: the second-level tie split projects `tie` through
  * `cast("double")`. That projection is WEAKLY order-monotone for numeric
  * ties (long → double rounding can merge neighbors, never reorder them;
  * merged ties simply share a sub-bucket), and NULL (e.g. a string tie)
  * for anything non-numeric — such buckets are left unsplit, degrading to
  * the documented one-task-per-bucket behavior rather than mis-ordering.
  */
private[analytics] object TotalOrder {

  private val DefaultBuckets = 64

  /** Rows allowed in one window partition before the second-level split
    * engages. 2^20 rows ≈ tens of MB per task at typical row widths —
    * comfortably inside executor memory, far above any oracle SF.
    */
  private val DefaultMaxPartRows = 1L << 20

  /** Order-monotone range bucket for DESCENDING order on `value`: larger
    * values map to smaller bucket ids, ties share a bucket; NULL → last
    * bucket (DESC ⇒ NULLS LAST), NaN → bucket 0 (NaN sorts above every
    * double, so DESC puts it first).
    */
  private def descBucket(value: Column, lo: Double, hi: Double, nB: Int): Column = {
    val v = value.cast("double")
    val arith =
      if (!(hi > lo)) lit(0)
      else least(lit(nB - 1), greatest(lit(0),
        floor((lit(hi) - v) * nB / (hi - lo)).cast("int")))
    when(value.isNull, lit(nB - 1)).when(isnan(v), lit(0)).otherwise(arith)
  }

  /** Ascending split for the TIE key inside a single-value bucket: smaller
    * ties map to smaller sub-buckets. Callers guarantee non-null input
    * (the histogram's count(tie) == count(*) check).
    */
  private def ascBucket(tieNum: Column, lo: Double, hi: Double, nB: Int): Column =
    if (!(hi > lo)) lit(0)
    else least(lit(nB - 1), greatest(lit(0),
      floor((tieNum - lit(lo)) * nB / (hi - lo)).cast("int")))

  private def minMax(df: DataFrame, value: Column): (Double, Double) = {
    val r = df.agg(min(value).cast("double"), max(value).cast("double")).head()
    if (r.isNullAt(0)) (0.0, 0.0) else (r.getDouble(0), r.getDouble(1))
  }

  /** Exclusive prefix offset per partition key from collected (key, total)
    * rows, folded into a literal map keyed on `keyCol`.
    */
  private def offsetExpr(rows: Seq[(Int, Long)], keyCol: Column): Column =
    if (rows.isEmpty) lit(0L)
    else {
      val sorted = rows.sortBy(_._1)
      val offs = sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _))
      element_at(map(offs.flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*), keyCol)
    }

  /** The shared partition-key assignment: adds `__pkt` (the window
    * partition key — range bucket, second-level-split when saturated) and
    * returns the exact exclusive-prefix offset expression over it.
    * `private[analytics]` so TotalOrderSpec can pin the partition-size
    * bound directly.
    */
  private[analytics] def keyed(df: DataFrame, value: Column, tie: Column,
      weight: Column, knownRange: Option[(Double, Double)], nB: Int,
      maxPartRows: Long): (DataFrame, Column) = {
    val (lo, hi) = knownRange.getOrElse(minMax(df, value))
    val vd = value.cast("double")
    // try_cast: a non-numeric tie (string ids) projects to null under ANSI
    // instead of throwing — the histogram then declines the tie split
    val td = tie.try_cast("double")
    val b = df.withColumn("__bkt", descBucket(value, lo, hi, nB))
    // ONE histogram job: per-bucket count + weight total + value/tie ranges
    // (≤ nB rows collected — control-plane)
    val stats = b.groupBy("__bkt").agg(
        count(lit(1)).as("c"), sum(weight).cast("long").as("w"),
        min(vd).as("vlo"), max(vd).as("vhi"),
        min(td).as("tlo"), max(td).as("thi"), count(td).as("tn"),
        count(vd).as("vn"))
      .collect()
    def wOf(r: org.apache.spark.sql.Row) = if (r.isNullAt(2)) 0L else r.getLong(2)
    // second-level splitters for saturated buckets: finer VALUE range when
    // the bucket spans distinct non-null values; ascending TIE range when
    // every row shares ONE ordered value (all-equal doubles, or all nulls —
    // mixed null/non-null buckets can't tie-split because nulls order after
    // every value) and the tie projection is total (non-null)
    val subOf: Map[Int, Column] = stats.iterator.filter(_.getLong(1) > maxPartRows)
      .flatMap { r =>
        val bkt = r.getInt(0)
        val c = r.getLong(1)
        val nonNullV = r.getLong(8)
        // a mixed null/value bucket may still VALUE-split: descBucket routes
        // nulls to the last sub-bucket, where DESC NULLS LAST wants them
        val vSpan = !r.isNullAt(3) && !r.isNullAt(4) &&
          java.lang.Double.compare(r.getDouble(3), r.getDouble(4)) != 0 &&
          !r.getDouble(3).isNaN && !r.getDouble(4).isNaN
        val singleOrderedValue = nonNullV == 0 ||
          (nonNullV == c && !r.isNullAt(3) && !r.isNullAt(4) &&
            java.lang.Double.compare(r.getDouble(3), r.getDouble(4)) == 0)
        val tSpan = singleOrderedValue && r.getLong(7) == c &&
          !r.isNullAt(5) && !r.isNullAt(6) && r.getDouble(5) < r.getDouble(6)
        if (vSpan) Some(bkt -> descBucket(value, r.getDouble(3), r.getDouble(4), nB))
        else if (tSpan) Some(bkt -> ascBucket(td, r.getDouble(5), r.getDouble(6), nB))
        else None // identical (value, tie) mass — no order-preserving split exists
      }.toMap
    if (subOf.isEmpty) {
      val offs = stats.map(r => r.getInt(0) -> wOf(r)).toSeq
      (b.withColumn("__pkt", col("__bkt")),
        offsetExpr(offs, col("__pkt")))
    } else {
      // composite key bkt*nB + sub is lexicographic in (bkt, sub), so the
      // refined partitions still enumerate the same total order
      val subExpr = subOf.foldLeft(lit(0)) { case (acc, (bkt, e)) =>
        when(col("__bkt") === bkt, e).otherwise(acc)
      }
      val b2 = b.withColumn("__pkt", col("__bkt") * lit(nB) + subExpr)
      // the one extra pass, paid only on saturation: exact per-partition
      // weight totals for the refined key
      val offs = b2.groupBy("__pkt").agg(sum(weight).cast("long").as("w"))
        .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
        .toSeq
      (b2, offsetExpr(offs, col("__pkt")))
    }
  }

  /** Adds `rkName` = exact 0-based global rank by (value DESC, tie ASC).
    * `knownRange` skips the min/max pass when the value is bounded by
    * construction.
    */
  def rankDesc(df: DataFrame, value: Column, tie: Column, rkName: String,
               knownRange: Option[(Double, Double)] = None,
               nB: Int = DefaultBuckets,
               maxPartRows: Long = DefaultMaxPartRows): DataFrame = {
    val (b, off) = keyed(df, value, tie, lit(1L), knownRange, nB, maxPartRows)
    val w = Window.partitionBy("__pkt").orderBy(value.desc, tie)
    b.withColumn(rkName, off + row_number().over(w) - 1)
      .drop("__bkt", "__pkt")
  }

  /** Adds `cumName` = exact inclusive running sum of `sumCol` in
    * (value DESC, tie ASC) order — the distributed prefix sum.
    */
  def runningSumDesc(df: DataFrame, value: Column, tie: Column, sumCol: Column,
                     cumName: String, knownRange: Option[(Double, Double)] = None,
                     nB: Int = DefaultBuckets,
                     maxPartRows: Long = DefaultMaxPartRows): DataFrame = {
    val (b, off) = keyed(df, value, tie, sumCol, knownRange, nB, maxPartRows)
    val w = Window.partitionBy("__pkt").orderBy(value.desc, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn(cumName, off + sum(sumCol).over(w))
      .drop("__bkt", "__pkt")
  }
}
