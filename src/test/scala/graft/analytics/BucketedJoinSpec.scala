package graft.analytics

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Co-located joins via bucketing (SURVEY.md §4 / the 100-TB posture):
  * writing both join sides bucketed by the join key lets Spark plan a
  * SortMergeJoin with ZERO Exchange — the shuffle is paid once at write
  * time and amortized over every subsequent join. This is the technique
  * the fact tables would use at lake scale; demonstrated and asserted on
  * the orders⋈lineitem key.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-bucket").toString
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")

    // warehouse.dir is static conf; anchor the tables at an explicit
    // temp location instead (external bucketed tables)
    graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b")
      .mode("overwrite").saveAsTable("orders_b")
    graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b")
      .mode("overwrite").saveAsTable("lineitem_b")

    // force SMJ so the bucketing (not a broadcast) carries the join —
    // the hint goes on a join INPUT, not the joined result
    val smj = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
    val plan = smj.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n${plan.take(1500)}")
    // and it computes the right thing
    val expected = graft.Tables.lineitem(spark, "/root/testdata/sf0.001").count()
    assert(smj.count() == expected) // every lineitem has its order
  }
}
