package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.functions.RuntimeFilter

/** Bloom-filter semi-join reduction (functions/RuntimeFilter): the
  * pre-filtered probe must return EXACTLY the rows of the plain semi join
  * (no false negatives, false positives removed by the exact join), and the
  * Bloom pre-filter must actually reduce the probe side (the point of
  * shipping the sketch).
  */
class SemiJoinReductionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("bloom-prefiltered semi join ≡ plain semi join, with real reduction") {
    // selective build side: customers of urgent 'F' orders
    val build = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    val probe = Tables.customer(spark, sf)

    val exact = probe.join(build.distinct(),
      col("c_custkey") === col("o_custkey"), "left_semi")

    val bloom = RuntimeFilter.buildBloom(build, col("o_custkey"), expectedItems = 10000L)
    val reduced = probe.filter(RuntimeFilter.mightContain(bloom, col("c_custkey")))
    val viaBloom = reduced.join(build.distinct(),
      col("c_custkey") === col("o_custkey"), "left_semi")

    val exactN = exact.count()
    assert(viaBloom.count() === exactN)
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty,
      "bloom-reduced semi join diverged from the exact semi join")

    // the sketch must do real work: no false negatives (≥ exact), and a
    // genuine cut of the probe side (< all rows)
    val kept = reduced.count()
    assert(kept >= exactN, "bloom filter produced false negatives")
    assert(kept < probe.count(), "bloom filter pruned nothing")
  }
}
