package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** TotalOrder is a drop-in replacement for the single-partition global
  * window — so prove BIT-EQUALITY against that exact form on adversarial
  * inputs (heavy ties, skewed values, single-bucket degeneracy, values at
  * a knownRange's edges, empty input), and pin the plan property the
  * helper exists for: the corpus-sized window is partitioned by the range
  * bucket.
  */
class TotalOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(name: String, prop: Prop, n: Int): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(Seed(4242L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  // values drawn from a SMALL domain so ties are common and several values
  // collide into one bucket even at tiny nB
  private val rowsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 120)
    vs <- Gen.listOfN(n, Gen.choose(0L, 9L))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  test("property: rankDesc equals the global-window rank (ties, skew, tiny nB)") {
    import spark.implicits._
    val prop = Prop.forAll(rowsGen, Gen.oneOf(1, 4, 64)) { (data, nB) =>
      val df = data.toDF("id", "v")
      val got = TotalOrder.rankDesc(df, col("v"), col("id"), "rk", nB = nB)
        .select("id", "rk").as[(Long, Long)].collect().toMap
      val want = df.withColumn("rk",
          row_number().over(Window.orderBy(col("v").desc, col("id"))) - 1)
        .select("id", "rk").collect()
        .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      got == want
    }
    check("rankDesc", prop, n = 8)
  }

  test("property: runningSumDesc equals the global-window prefix sum") {
    import spark.implicits._
    val prop = Prop.forAll(rowsGen) { data =>
      val df = data.toDF("id", "v").withColumn("w", col("v") * 3 + 1)
      val got = TotalOrder.runningSumDesc(df, col("v"), col("id"), col("w"),
          "cum", nB = 8)
        .select("id", "cum").as[(Long, Long)].collect().toMap
      val w = Window.orderBy(col("v").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("cum", sum(col("w")).over(w))
        .select("id", "cum").as[(Long, Long)].collect().toMap
      got == want
    }
    check("runningSumDesc", prop, n = 8)
  }

  test("knownRange: values at both edges clamp into valid buckets, order exact") {
    import spark.implicits._
    val df = Seq((1L, 0.0), (2L, 1.0), (3L, 0.5), (4L, 0.5), (5L, 0.25),
        (6L, 1.0), (7L, 0.0))
      .toDF("id", "q").withColumn("w", lit(10L))
    val got = TotalOrder.runningSumDesc(df, col("q"), col("id"), col("w"),
        "cum", knownRange = Some((0.0, 1.0)), nB = 4)
      .orderBy("cum").select("id").as[Long].collect()
    assert(got.toSeq == Seq(2L, 6L, 3L, 4L, 5L, 1L, 7L))
  }

  test("empty input yields an empty, well-typed result") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(TotalOrder.rankDesc(df, col("v"), col("id"), "rk").count() == 0)
    assert(TotalOrder.runningSumDesc(df, col("v"), col("id"), col("v"), "c")
      .count() == 0)
  }

  test("plan: the window is partitioned by the range-bucket key") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, i % 37)).toDF("id", "v")
    val ranked = TotalOrder.rankDesc(df, col("v"), col("id"), "rk")
    val p = ranked.queryExecution.executedPlan.toString
    val win = p.linesIterator.find(_.contains("Window [")).getOrElse("")
    assert(win.contains("__pkt"), s"window lost its bucket partition: $win")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWin}
    ranked.queryExecution.optimizedPlan.foreach {
      case w: LWin => assert(w.partitionSpec.nonEmpty)
      case _ => ()
    }
  }

  test("null and NaN values rank exactly like the global DESC window (nulls last, NaN first)") {
    import spark.implicits._
    // r10 advice: greatest(0, null) used to drop nulls into bucket 0 —
    // RANKED BEFORE values — while ORDER BY v DESC puts them last
    val df = Seq(
      (1L, Some(2.0)), (2L, None), (3L, Some(Double.NaN)), (4L, Some(0.5)),
      (5L, None), (6L, Some(Double.NaN)), (7L, Some(-1.0)), (8L, Some(2.0)))
      .toDF("id", "v")
    val got = TotalOrder.rankDesc(df, col("v"), col("id"), "rk", nB = 4)
      .select("id", "rk").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rk",
        row_number().over(Window.orderBy(col("v").desc, col("id"))) - 1)
      .select("id", "rk").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == want, s"got $got want $want")
    // and the running sum agrees too (weights over the same degenerate mix)
    val gotSum = TotalOrder.runningSumDesc(df.withColumn("w", col("id") * 2),
        col("v"), col("id"), col("w"), "cum", nB = 4)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("v").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wantSum = df.withColumn("w", col("id") * 2)
      .withColumn("cum", sum(col("w")).over(w))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(gotSum == wantSum)
  }

  test("value-degenerate corpus: tie-key split bounds every window partition (r10 finding #3)") {
    import spark.implicits._
    // every row carries the SAME value — one bucket would otherwise hold
    // the whole corpus (partitionSpec non-empty, invisible to the guard)
    val n = 4000L
    val df = (0L until n).map(i => (i, 7L)).toDF("id", "v")
    val bound = 200L
    // exactness first: bit-identical to the single-partition window
    val got = TotalOrder.rankDesc(df, col("v"), col("id"), "rk", maxPartRows = bound)
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(got == (0L until n).map(i => i -> i).toMap)
    // and the bound: no refined partition exceeds maxPartRows on this
    // uniform tie key (ids 0..n-1 range-split evenly)
    val (keyedDf, _) = TotalOrder.keyed(df, col("v"), col("id"), lit(1L),
      None, 64, bound)
    val sizes = keyedDf.groupBy("__pkt").count().as[(Int, Long)].collect()
    assert(sizes.length > 1, "degenerate corpus was not split at all")
    val worst = sizes.map(_._2).max
    assert(worst <= bound, s"a refined partition still holds $worst rows (bound $bound)")
  }

  test("degenerate corpus with a NON-numeric tie degrades safely (no split, exact order)") {
    import spark.implicits._
    // a string tie has no numeric projection — the split must decline
    // (never mis-order) and the result stays exact
    val df = (0L until 300L).map(i => (f"id_$i%04d", 1L)).toDF("id", "v")
    val got = TotalOrder.rankDesc(df, col("v"), col("id"), "rk", maxPartRows = 50)
      .select("id", "rk").as[(String, Long)].collect().toMap
    val want = df.withColumn("rk",
        row_number().over(Window.orderBy(col("v").desc, col("id"))) - 1)
      .select("id", "rk").collect().map(r => r.getString(0) -> r.getInt(1).toLong).toMap
    assert(got == want)
  }
}
