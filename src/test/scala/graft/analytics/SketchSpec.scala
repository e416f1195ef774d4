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
}
