package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** cu_window_chunks + cu_mixture_weights semantics on planted corpora:
  * chunk-count arithmetic at the stride boundaries, full-coverage and
  * overlap invariants, and the exact-budget mixture contract.
  */
class CurateWindowMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val d = Files.createTempDirectory("graft-curate").toFile
    d.deleteOnExit()
    spark.createDataFrame(rows).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  test("chunk counts hit the stride boundaries exactly (W=64, S=48)") {
    // n → chunks: 1→1, 64→1, 65→2, 112→2, 113→3, 200→4
    val dir = writeDocs(Seq(1L -> 1, 2L -> 64, 3L -> 65, 4L -> 112, 5L -> 113, 6L -> 200)
      .map { case (id, n) => (id, (1 to n).map(i => s"w$i").mkString(" "), "s") })
    val out = CurateQueries.windowChunks.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt)).toSeq
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(c => c._2 -> c._3).toMap).toMap
    assert(byDoc.view.mapValues(_.size).toMap ==
      Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 3, 6L -> 4))
    // every chunk except a doc's last has exactly W tokens; the last ends
    // at token n: its size is n - S*(chunks-1)
    assert(byDoc(5L) == Map(0 -> 64, 1 -> 64, 2 -> (113 - 48 * 2)))
    assert(byDoc(6L) == Map(0 -> 64, 1 -> 64, 2 -> 64, 3 -> (200 - 48 * 3)))
    assert(byDoc(1L) == Map(0 -> 1))
  }

  test("consecutive chunks overlap by W-S tokens and cover every token") {
    val n = 200
    val dir = writeDocs(Seq((1L, (1 to n).map(i => s"w$i").mkString(" "), "s")))
    val fps = CurateQueries.windowChunks.fn(spark, dir)
      .collect().map(r => r.getLong(1).toInt -> r.getString(3)).toMap
    // recompute fingerprints locally from the known token layout
    def md5Hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until 4).foreach { i =>
      val toks = (i * 48 + 1 to math.min(i * 48 + 64, n)).map(j => s"w$j")
      assert(fps(i) == md5Hex(toks.mkString(" ")), s"chunk $i fingerprint")
    }
  }

  test("mixture allocation matches the hand computation and sums to the budget") {
    // token counts 100 / 400 / 2500 → ⌊√⌋ = 10 / 20 / 50, total 80 →
    // exact shares of the 10M budget with zero remainders
    val dir = writeDocs(Seq(
      (1L, (1 to 100).map(_ => "x").mkString(" "), "small"),
      (2L, (1 to 400).map(_ => "x").mkString(" "), "mid"),
      (3L, (1 to 2500).map(_ => "x").mkString(" "), "big")))
    val out = CurateQueries.mixtureWeights.fn(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("small") == ((100L, 1250000L, 12500.0)))
    assert(out("mid") == ((400L, 2500000L, 6250.0)))
    assert(out("big") == ((2500L, 6250000L, 2500.0)))
    assert(out.values.map(_._2).sum == 10000000L)
  }

  test("allocations sum exactly to the budget on the real corpus (remainder path)") {
    val total = CurateQueries.mixtureWeights.fn(spark, "/root/testdata/sf0.001")
      .agg(sum("alloc_tokens")).collect()(0).getLong(0)
    assert(total == 10000000L)
  }

  test("quality filter keeps the top 60% per language, not globally") {
    // en docs are all longer (higher quality) than de docs; a global
    // threshold would drop every de doc — the per-stratum cut keeps 3/5
    // of each (⌈3·5/5⌉ = 3)
    val d = java.nio.file.Files.createTempDirectory("graft-qf").toFile
    d.deleteOnExit()
    val rows = (1L to 5L).map(i => (i, (1 to 50 + i.toInt).map(_ => "w").mkString(" "), "en")) ++
      (6L to 10L).map(i => (i, (1 to 5 + i.toInt).map(_ => "w").mkString(" "), "de"))
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    val out = CurateQueries.qualityFilter.fn(spark, d.getAbsolutePath)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // highest-quality 3 in each stratum survive (longer docs score higher)
    assert(out.count { case (_, k) => k } == 6)
    assert(out(5L) && out(4L) && out(3L) && !out(2L) && !out(1L))
    assert(out(10L) && out(9L) && out(8L) && !out(7L) && !out(6L))
  }

  test("snake-fold sharding balances token loads across shards") {
    val out = CurateQueries.shardBalance.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out.size == 8)
    val (mx, mn) = (out.values.max, out.values.min)
    // boustrophedon pairing keeps loads within a tight band; a broken
    // fold (e.g. plain modulo on a sorted ranking) skews far past this
    assert(mx.toDouble / mn <= 1.05, s"shard imbalance: $out")
  }

  test("mixture allocation satisfies the largest-remainder fairness bound") {
    // every domain's quota is within 1 token of its exact real-valued
    // share B·⌊√t⌋/Σ⌊√t⌋ — the defining property of the method; a broken
    // remainder rank or shortfall count violates it immediately
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      val rows = CurateQueries.mixtureWeights.fn(spark, sf)
        .collect().map(r => (r.getLong(2), r.getLong(3)))
      val sw = rows.map { case (t, _) => math.sqrt(t.toDouble).toLong }
      val tot = sw.sum.toDouble
      rows.zip(sw).foreach { case ((_, alloc), w) =>
        val ideal = 10000000L * w / tot
        assert(math.abs(alloc - ideal) <= 1.0, s"$sf: alloc $alloc vs ideal $ideal")
      }
      assert(rows.map(_._2).sum == 10000000L)
    }
  }
}
