package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Z-order (Morton-curve) clustered layout — multi-dimensional file
  * skipping. MergeSink's range clustering prunes on ONE key; analytic
  * predicates come on several (date AND customer, user AND time). Sorting
  * by dimension A makes B-predicates scan everything; interleaving the bit
  * patterns of both dimensions into one z-value and range-partitioning on
  * it keeps every file's bounding box TIGHT in both dimensions, so a
  * selective predicate on EITHER prunes most files (the Delta/Iceberg
  * `OPTIMIZE ZORDER BY` layout, done with plain Spark primitives).
  *
  * Layout job: one min/max agg per dimension (4 scalars to the driver) →
  * normalize each dim to a `bits`-wide integer rank → interleave →
  * `repartitionByRange` on the z-value (distributed sampled range split —
  * no global sort) → one directory per range bucket, plus a driver-written
  * manifest of per-bucket bounding boxes (the same manifest-is-the-index
  * pattern as MergeSink). Readers intersect predicate intervals with the
  * boxes and scan only overlapping buckets; the residual exact filter
  * runs inside the scan as usual. At 100 TB the layout pass is one shuffle
  * of the table — paid once, amortized over every pruned query after.
  */
object ZOrderLayout {

  /** Per-bucket bounding box (inclusive) over the two cluster dimensions. */
  final case class Bucket(zb: Int, min1: Double, max1: Double,
      min2: Double, max2: Double, rows: Long)

  private def manifestFile(path: String) = new java.io.File(path, "_zorder_manifest.tsv")

  /** Normalized `bits`-wide integer rank of `c` within [lo, hi]. Layout
    * only — correctness never depends on this mapping, so double rounding
    * is fine; clamping guards values at the extremes.
    */
  private def norm(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val scale = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else least(lit(scale), greatest(lit(0L),
      ((c.cast(DoubleType) - lit(lo)) / lit(hi - lo) * lit(scale.toDouble)).cast(LongType)))
  }

  /** Morton interleave of two `bits`-wide values: z = …a1 b1 a0 b0. */
  private def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Write `df` clustered into ~`buckets` files. `zorder = false` clusters
    * on dim1 alone (the single-dimension sorted layout, kept for the
    * comparison the spec makes: it prunes dim1 queries equally well and
    * dim2 queries not at all).
    */
  def write(spark: SparkSession, path: String, df: DataFrame,
      dim1: String, dim2: String, buckets: Int, bits: Int = 16,
      zorder: Boolean = true): Unit = {
    val mm = df.agg(min(col(dim1)).cast(DoubleType), max(col(dim1)).cast(DoubleType),
      min(col(dim2)).cast(DoubleType), max(col(dim2)).cast(DoubleType)).head()
    // min/max are NULL on an empty input or an all-NULL dimension; the
    // getDouble below would then throw an opaque NPE, and NULL dim values
    // would z-key to NULL with NULL bounding-box stats. A clustered layout
    // of nothing (or of an undefined dimension) has no meaning — reject
    // loudly instead.
    require(!mm.isNullAt(0) && !mm.isNullAt(2),
      s"ZOrderLayout.write: input is empty or '$dim1'/'$dim2' is all-NULL")
    val (lo1, hi1, lo2, hi2) = (mm.getDouble(0), mm.getDouble(1), mm.getDouble(2), mm.getDouble(3))
    val nullRows = df.where(col(dim1).isNull || col(dim2).isNull).limit(1).count()
    require(nullRows == 0,
      s"ZOrderLayout.write: NULL values in cluster dimension '$dim1'/'$dim2' — " +
        "coalesce them to a sentinel before layout")
    val key =
      if (zorder) interleave(norm(col(dim1), lo1, hi1, bits), norm(col(dim2), lo2, hi2, bits), bits)
      else norm(col(dim1), lo1, hi1, bits)
    df.withColumn("__z", key)
      .repartitionByRange(buckets, col("__z"))
      .withColumn("zb", spark_partition_id())
      .drop("__z")
      .write.partitionBy("zb").mode("overwrite").parquet(path)
    // per-bucket bounding boxes: one scan of the fresh layout, O(buckets)
    // rows to the driver — control-plane, like the MergeSink manifest
    val stats = spark.read.parquet(path).groupBy("zb")
      .agg(min(col(dim1)).cast(DoubleType), max(col(dim1)).cast(DoubleType),
        min(col(dim2)).cast(DoubleType), max(col(dim2)).cast(DoubleType),
        count(lit(1)))
      .collect()
      .map(r => Bucket(r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
      .sortBy(_.zb)
    val body = s"$dim1\t$dim2\n" + stats.map(b =>
      s"${b.zb}\t${b.min1}\t${b.max1}\t${b.min2}\t${b.max2}\t${b.rows}").mkString("\n")
    java.nio.file.Files.writeString(manifestFile(path).toPath, body)
  }

  def buckets(path: String): Seq[Bucket] =
    java.nio.file.Files.readAllLines(manifestFile(path).toPath)
      .toArray(Array.empty[String]).toSeq.drop(1).map { l =>
        val a = l.split('\t')
        Bucket(a(0).toInt, a(1).toDouble, a(2).toDouble, a(3).toDouble, a(4).toDouble, a(5).toLong)
      }

  private def overlaps(lo: Double, hi: Double, r: Option[(Double, Double)]): Boolean =
    r.forall { case (a, b) => hi >= a && lo <= b }

  /** The bucket ids a (dim1-interval, dim2-interval) predicate must scan. */
  def pruned(path: String, r1: Option[(Double, Double)],
      r2: Option[(Double, Double)]): Seq[Int] =
    buckets(path).filter(b =>
      overlaps(b.min1, b.max1, r1) && overlaps(b.min2, b.max2, r2)).map(_.zb)

  /** Scan only the buckets that can satisfy the intervals; callers apply
    * the exact residual predicate on the result (the boxes give a
    * superset, never a miss — `ZOrderSpec` proves equality with the full
    * scan).
    */
  def scan(spark: SparkSession, path: String, r1: Option[(Double, Double)],
      r2: Option[(Double, Double)]): DataFrame = {
    val keep = pruned(path, r1, r2)
    val full = spark.read.option("basePath", path)
    if (keep.isEmpty) spark.read.parquet(path).limit(0)
    else full.parquet(keep.map(zb => s"$path/zb=$zb"): _*)
  }
}
