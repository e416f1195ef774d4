package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** HLL sketch mergeability — the property that makes sketches the right
  * distinct-count answer at 100 TB: per-partition (or per-day) partial
  * sketches combine associatively into exactly the sketch of the union, so
  * a rollup never rescans history. a7_approx_distinct proves the accuracy
  * postcondition through the oracle; this spec proves the algebra.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("union of disjoint-slice sketches equals the whole-table sketch") {
    val users = Tables.events(spark, sf).select("user_id")
    def sketchOf(df: org.apache.spark.sql.DataFrame) =
      df.agg(hll_sketch_agg(col("user_id")).as("sk"))
    val whole = sketchOf(users)
      .select(hll_sketch_estimate(col("sk"))).head().getLong(0)
    // split on a key predicate (any partitioning works — that's the point)
    val merged = sketchOf(users.filter(col("user_id") % 2 === 0))
      .unionByName(sketchOf(users.filter(col("user_id") % 2 =!= 0)))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0)
    assert(merged == whole, "sketch union must equal the union's sketch")
  }

  test("sketch estimate lands within the error bound of exact") {
    val users = Tables.events(spark, sf).select("user_id")
    val exact = users.distinct().count()
    val est = users.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head().getLong(0)
    assert(math.abs(est - exact) <= 0.15 * exact, s"est=$est exact=$exact")
  }

  test("count-min sketch: one-sided error bound holds and partials merge") {
    // the frequency complement to HLL: estimate >= exact always, and
    // estimate <= exact + eps*N with confidence 1-delta; partial sketches
    // merge associatively — the same at-scale rollup property
    import org.apache.spark.util.sketch.CountMinSketch
    val eps = 0.01
    val events = Tables.events(spark, sf).select("user_id")
    val n = events.count()
    def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch =
      CountMinSketch.readFrom(
        df.agg(count_min_sketch(col("user_id"), lit(eps), lit(0.99), lit(42)))
          .head().getAs[Array[Byte]](0))
    val whole = sketchOf(events)
    val exact = events.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (uid, cnt) =>
      val est = whole.estimateCount(uid)
      assert(est >= cnt, s"CMS must never under-count: uid=$uid est=$est exact=$cnt")
      assert(est <= cnt + (eps * n).toLong, s"uid=$uid est=$est exact=$cnt n=$n")
    }
    // merge of disjoint slices == sketch of the union (same params/seed)
    val a = sketchOf(events.filter(col("user_id") % 2 === 0))
    val b = sketchOf(events.filter(col("user_id") % 2 =!= 0))
    a.mergeInPlace(b)
    exact.keys.foreach { uid =>
      assert(a.estimateCount(uid) == whole.estimateCount(uid),
        s"merged CMS diverges from whole-table CMS at uid=$uid")
    }
  }

  test("approx_percentile: rank-error bound holds at any partitioning") {
    // the quantile sketch (Greenwald-Khanna): the estimate's RANK is
    // within accuracy⁻¹ relative rank error of the target — and the bound
    // must survive repartitioning, because at scale the sketch is always
    // built from merged per-partition partials
    val acc = 100 // rank error <= n/acc
    val vals = Tables.events(spark, sf).select("value")
    val n = vals.count()
    val sorted = vals.orderBy("value").collect().map(_.getDouble(0))
    Seq(1, 7, 32).foreach { parts =>
      val est = vals.repartition(parts)
        .agg(percentile_approx(col("value"), lit(0.5), lit(acc)))
        .head().getDouble(0)
      // rank of the estimate in the sorted data
      val rank = sorted.count(_ <= est).toLong
      val err = math.abs(rank - n / 2)
      assert(err <= n / acc + 1,
        s"parts=$parts: p50 est=$est rank=$rank target=${n / 2} err=$err bound=${n / acc}")
    }
  }
}
