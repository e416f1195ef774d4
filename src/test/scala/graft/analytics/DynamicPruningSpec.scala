package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Dynamic partition pruning (DPP) — the runtime counterpart of the static
  * partition pruning DedupSinkPruneSpec proves. When a partitioned fact is
  * joined to a filtered dimension, the dimension's surviving join keys are
  * only known at RUNTIME; Catalyst inserts a dynamic-pruning subquery into
  * the fact scan's PartitionFilters, reusing the dimension's broadcast, so
  * the fact side reads only the partitions that can match. At 100 TB this
  * is the difference between scanning one day/segment and scanning the
  * whole lake for every dimension-filtered query — and it falls out of a
  * plain declarative join against the partitioned layout, with zero
  * engine-side code: the proof here is that our layout (partitioned sink
  * dirs, DedupSink/IngestJob's partitionBy) actually triggers it.
  */
class DynamicPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("join against a filtered dim prunes fact partitions at runtime") {
    val base = java.nio.file.Files.createTempDirectory("graft_dpp").toFile
    try {
      val factPath = s"${base.getPath}/orders_by_prio"
      Tables.orders(spark, sf)
        .write.partitionBy("o_orderpriority").parquet(factPath)
      val fact = spark.read.parquet(factPath)

      // the filtered dimension: 1 of 5 priorities survives. The filter is
      // on a NON-join column so no static predicate can be inferred onto
      // the fact side (a same-column filter would constraint-propagate and
      // prune statically — good, but not the runtime path under test);
      // the surviving key set is only known once the dim is evaluated.
      // parquet-backed (an in-memory Seq would have its filter folded into
      // a LocalRelation at optimization time, leaving no selective-Filter
      // node for the pruning rule to key on), and a COMPARISON filter (the
      // rule's isLikelySelective accepts comparisons/IN/LIKE — a bare
      // boolean attribute does not qualify)
      import spark.implicits._
      val dimPath = s"${base.getPath}/priority_dim"
      Seq(("1-URGENT", 1), ("2-HIGH", 0), ("3-MEDIUM", 0),
        ("4-NOT SPECIFIED", 0), ("5-LOW", 0)).toDF("p", "expedite")
        .write.parquet(dimPath)
      val dim = spark.read.parquet(dimPath).filter(col("expedite") > 0)

      val joined = fact.join(broadcast(dim), col("o_orderpriority") === col("p"))
      val n = joined.count()
      val expected = fact.filter(col("o_orderpriority") === "1-URGENT").count()
      assert(n === expected)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic pruning subquery in the fact scan:\n${plan.take(1500)}")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(); ()
      }
      rm(base)
    }
  }
}
