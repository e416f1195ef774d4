package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Contract for the frame⋈globalAgg(frame) → window optimizer rule: the
  * natural (join) formulation must plan with ONE scan of the frame's
  * source and a Window node, and produce exactly the rows of the manual
  * single-pass form. Negative cases pin the sound-ness guards: grouped
  * aggregates, distinct aggregates, and different frames must NOT fire.
  */
class GlobalScalarToWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def lineitem = spark.read.parquet(s"$sf/lineitem.parquet")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("crossJoin with a global aggregate of the same frame collapses to one scan + window") {
    val rev = lineitem.groupBy("l_suppkey")
      .agg(sum("l_extendedprice").as("total"))
    val natural = rev.crossJoin(broadcast(rev.agg(max("total").as("mx"))))
    val p = planOf(natural)
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1,
      s"frame subtree still planned twice:\n${p.take(2000)}")
    assert(p.contains("Window"), "expected the single-partition window")

    val manual = rev.withColumn("mx",
      max("total").over(Window.partitionBy()))
    assert(natural.collect().toSet == manual.collect().toSet)
  }

  test("equality-join against the frame's own max collapses and keeps the filter semantics") {
    val rev = lineitem.groupBy("l_suppkey")
      .agg(sum("l_extendedprice").as("total"))
    val natural = rev
      .join(broadcast(rev.agg(max("total").as("mx"))), col("total") === col("mx"))
    val p = planOf(natural)
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1,
      s"frame subtree still planned twice:\n${p.take(2000)}")

    val manual = rev
      .withColumn("mx", max("total").over(Window.partitionBy()))
      .filter(col("total") === col("mx"))
    assert(natural.collect().toSet == manual.collect().toSet)
    assert(natural.count() >= 1)
  }

  test("compound scalar (fraction-of-total threshold) collapses and filters correctly") {
    val perKey = lineitem.groupBy("l_suppkey")
      .agg(sum("l_quantity").as("qty"))
    val natural = perKey
      .crossJoin(broadcast(perKey.agg((sum("qty") * 0.001).as("thr"))))
      .filter(col("qty") > col("thr"))
    val p = planOf(natural)
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1)

    val manual = perKey
      .withColumn("thr", sum("qty").over(Window.partitionBy()) * 0.001)
      .filter(col("qty") > col("thr"))
    assert(natural.collect().toSet == manual.collect().toSet)
  }

  test("guard: grouped aggregate on the right does NOT fire") {
    val rev = lineitem.groupBy("l_suppkey")
      .agg(sum("l_extendedprice").as("total"))
    val grouped = rev.groupBy("l_suppkey").agg(max("total").as("mx"))
      .withColumnRenamed("l_suppkey", "sk")
    val joined = rev.join(grouped, col("l_suppkey") === col("sk"))
    // plans the frame twice — and must, the right side is not a scalar
    assert(planOf(joined).linesIterator.count(_.contains("lineitem.parquet")) == 2)
    assert(joined.count() > 0)
  }

  test("guard: DISTINCT aggregate does NOT fire") {
    val rev = lineitem.groupBy("l_suppkey")
      .agg(sum("l_extendedprice").as("total"))
    val natural = rev.crossJoin(broadcast(
      rev.agg(countDistinct("total").as("n"))))
    assert(planOf(natural).linesIterator.count(_.contains("lineitem.parquet")) == 2)
    assert(natural.count() > 0)
  }

  test("guard: a DIFFERENT frame on the right does NOT fire") {
    val rev = lineitem.groupBy("l_suppkey")
      .agg(sum("l_extendedprice").as("total"))
    val other = lineitem.groupBy("l_partkey")
      .agg(sum("l_extendedprice").as("total2"))
    val joined = rev.crossJoin(broadcast(other.agg(max("total2").as("mx"))))
    assert(planOf(joined).linesIterator.count(_.contains("lineitem.parquet")) == 2)
    assert(joined.count() > 0)
  }
}
