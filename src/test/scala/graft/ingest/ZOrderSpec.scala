package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Z-order layout (E47): correctness (pruned scan ≡ full scan for any
  * interval predicate) and the property that justifies the layout — a
  * selective predicate on EITHER dimension prunes a large share of
  * buckets, where the single-dimension sorted layout prunes only its own
  * dimension.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"
  private val Buckets = 32

  private def withLayouts(f: (String, String) => Unit): Unit = {
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toFile
    try {
      val orders = Tables.orders(spark, sf)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val zPath = s"${base.getPath}/z"
      val sPath = s"${base.getPath}/sorted"
      ZOrderLayout.write(spark, zPath, orders, "o_orderkey", "o_custkey", Buckets)
      ZOrderLayout.write(spark, sPath, orders, "o_orderkey", "o_custkey", Buckets,
        zorder = false)
      f(zPath, sPath)
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).toSeq.flatten.foreach(rm)
        x.delete(); ()
      }
      rm(base)
    }
  }

  test("pruned scan is exact, and both dimensions prune") {
    withLayouts { (zPath, sPath) =>
      val orders = Tables.orders(spark, sf)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val (k1, k2) = (1000.0, 2500.0)   // ~1/10 of the o_orderkey span
      val (c1, c2) = (100.0, 280.0)     // ~1/8 of the o_custkey span

      // correctness: bounding-box pruning + residual filter ≡ full scan
      val viaZ = ZOrderLayout.scan(spark, zPath, Some((k1, k2)), Some((c1, c2)))
        .filter(col("o_orderkey").between(k1, k2) && col("o_custkey").between(c1, c2))
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val full = orders
        .filter(col("o_orderkey").between(k1, k2) && col("o_custkey").between(c1, c2))
      assert(viaZ.count() === full.count())
      assert(viaZ.exceptAll(full).isEmpty && full.exceptAll(viaZ).isEmpty)

      val total = ZOrderLayout.buckets(zPath).size
      // either dimension alone prunes at least half the z-layout
      val zDim1 = ZOrderLayout.pruned(zPath, Some((k1, k2)), None).size
      val zDim2 = ZOrderLayout.pruned(zPath, None, Some((c1, c2))).size
      assert(zDim1 <= total / 2, s"dim1 pruned nothing: $zDim1 of $total")
      assert(zDim2 <= total / 2, s"dim2 pruned nothing: $zDim2 of $total")

      // the sorted layout prunes its own dimension at least as hard, but a
      // dim2 predicate scans (almost) everything — z-order's reason to exist
      val sDim1 = ZOrderLayout.pruned(sPath, Some((k1, k2)), None).size
      val sDim2 = ZOrderLayout.pruned(sPath, None, Some((c1, c2))).size
      assert(sDim1 <= zDim1, s"sorted layout should win on its own dim: $sDim1 vs $zDim1")
      assert(zDim2 < sDim2, s"z-order should beat sorted on dim2: $zDim2 vs $sDim2")
      assert(sDim2 >= (total * 3) / 4, s"sorted layout unexpectedly prunes dim2: $sDim2 of $total")
    }
  }

  test("empty input and NULL dimension values are rejected loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zguard").toFile
    try {
      // empty input: min/max are NULL → was an opaque NPE, must be a
      // clear requirement failure
      val empty = Seq.empty[(Long, Long)].toDF("a", "b")
      val e1 = intercept[IllegalArgumentException] {
        ZOrderLayout.write(spark, s"$dir/z1", empty, "a", "b", buckets = 2)
      }
      assert(e1.getMessage.contains("empty or"), e1.getMessage)
      // NULL dim values: a null z-key would land rows and bounding-box
      // stats in undefined buckets
      val withNull = Seq[(java.lang.Long, java.lang.Long)]((1L, 2L), (null, 3L))
        .toDF("a", "b")
      val e2 = intercept[IllegalArgumentException] {
        ZOrderLayout.write(spark, s"$dir/z2", withNull, "a", "b", buckets = 2)
      }
      assert(e2.getMessage.contains("NULL values"), e2.getMessage)
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).toSeq.flatten.foreach(rm)
        x.delete(); ()
      }
      rm(dir)
    }
  }
}
