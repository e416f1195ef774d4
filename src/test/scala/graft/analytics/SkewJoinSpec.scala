package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Skew handling — the failure mode that kills 100-TB joins: one hot key
  * puts an entire shuffle partition on one executor. Two defenses are
  * proven here on a deliberately skewed dataset (~90% of fact rows on one
  * key):
  *
  *  1. MANUAL SALTING (the portable fix): the fact side appends a salt
  *     `hash(row) % S`, the dim side explodes ×S, and the join key becomes
  *     (key, salt) — the hot key spreads over S partitions. Result equality
  *     with the plain join is asserted row-for-row.
  *
  *  2. AQE SKEW SPLIT (the built-in fix): with thresholds scaled to test
  *     size, AQE's OptimizeSkewedJoin splits the oversized partition at
  *     runtime — asserted from the final adaptive plan's skew markers.
  *     This is why Sessions.local keeps AQE on for every entry point.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  // ~90% of events land on hot key 0; the rest spread over 1..99
  private def fact = Tables.events(spark, sf)
    .select(col("event_id"),
      when(col("event_id") % 10 < 9, 0L).otherwise(col("user_id") % 100).as("k"),
      col("value"))
  private def dim = {
    import spark.implicits._
    (0L until 100L).map(k => (k, s"seg_$k")).toDF("k", "segment")
  }

  test("salted join equals the plain join, row for row") {
    val S = 8
    val plain = fact.join(dim, "k").select("event_id", "k", "segment", "value")

    val saltedFact = fact.withColumn("salt", pmod(hash(col("event_id")), lit(S)))
    val saltedDim = dim.withColumn("salt", explode(array((0 until S).map(lit): _*)))
    val salted = saltedFact.join(saltedDim, Seq("k", "salt"))
      .select("event_id", "k", "segment", "value")

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join diverged from the plain join")
  }

  test("AQE splits the hot partition at runtime (OptimizeSkewedJoin)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      // scale the skew thresholds down to test-data size, and disable
      // broadcast so the join actually shuffles (the skew path under test)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // self-join of the skewed fact on k. The left side is spread over 16
      // map tasks first: AQE splits a skewed reduce partition at MAPPER
      // granularity, and this one-file test scan would otherwise produce a
      // single unsplittable map block — a real 100-TB scan always has
      // thousands of mappers, which is what the repartition stands in for.
      val left = fact.select(col("k"), col("event_id").as("l_id"))
        .repartition(16, col("event_id"))
      val right = fact.select(col("k"), col("event_id").as("r_id"))
        .filter(col("r_id") % 997 === 0) // keep the output small, input skewed
      val joined = left.join(right, "k")
      joined.collect() // drive AQE to its final plan on THIS query execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew handling in plan:\n${plan.take(1500)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
