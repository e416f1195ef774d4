package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Property pins for the hybrid-retrieval / semantic-decontamination /
  * anomaly batch — local recomputes and conservation laws the DuckDB hash
  * compare cannot state.
  */
class Round8dOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, sf)

  // ---- ann_rrf_hybrid: fused scores recompute from the two source lists

  test("rrf fusion equals a local recompute from the two top-k lists") {
    val bm = run("tx_bm25_rank").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    // dense list recomputed locally: cosine of every vector against vec 0
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val probe = vecs.find(_._1 == 0L).get._2
    val ann = vecs.map { case (id, e) => (id, cos(e, probe)) }
      .sortBy { case (id, c) => (-c, id) }.take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val expected = (bm.keySet ++ ann.keySet).toSeq.map { id =>
      val s = bm.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        ann.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, s)
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = run("ann_rrf_hybrid").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).sortBy(_._3)
    assert(got.length == 10)
    got.zip(expected).foreach { case ((gid, gs, _), (eid, es)) =>
      assert(gid == eid && math.abs(gs - es) < 1e-12,
        s"fused list diverges from recompute: got ($gid,$gs) want ($eid,$es)")
    }
    // fusion really is hybrid: the fused set must draw from BOTH sources
    assert(got.exists(g => bm.contains(g._1)) && got.exists(g => ann.contains(g._1)))
  }

  // ---- cu_embed_decontaminate: verdicts equal a local brute-force screen

  test("embed decontamination equals a local brute-force probe screen") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val probes = vecs.filter(_._1 % 50 == 0)
    val corpus = vecs.filter(_._1 % 50 != 0)
    val expected = probes.flatMap { case (pid, pe) =>
      val hits = corpus.map { case (_, e) => cos(pe, e) }.filter(_ >= 0.35)
      if (hits.isEmpty) None else Some(pid -> (hits.length.toLong, hits.max))
    }.toMap
    assert(expected.nonEmpty, "no planted semantic contamination; pin is vacuous")
    val got = run("cu_embed_decontaminate").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (pid, (n, mx)) =>
      assert(n == expected(pid)._1 && math.abs(mx - expected(pid)._2) < 1e-12,
        s"probe $pid accounting mismatch")
    }
  }

  // ---- ev_anomaly_mad: flag rule verified; anomalies are a strict minority

  test("anomaly flags satisfy the 3-MAD rule and MAD resists the outliers") {
    val rows = run("ev_anomaly_mad").collect()
    assert(rows.nonEmpty)
    val nEvents = graft.Tables.events(spark, sf).count()
    rows.foreach { r =>
      val (v, med, mad) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(v - med) > 3.0 * mad, s"flagged row inside the band: $r")
      assert(mad > 0.0, "degenerate MAD")
    }
    // robustness sanity: a >50%-flagged type would mean the estimator broke
    rows.groupBy(_.getString(1)).foreach { case (t, rs) =>
      assert(rs.length < nEvents / 2, s"type $t flags a majority of events")
    }
    // per type, exactly the events outside the band are flagged (count check)
    val flagged = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2)
      else { val lo = s(n / 2 - 1); lo + (s(n / 2) - lo) * 0.5 }
    }
    evs.groupBy(_._1).foreach { case (t, pairs) =>
      val vals = pairs.map(_._2)
      val med = medianOf(vals)
      val mad = medianOf(vals.map(v => math.abs(v - med)))
      val expect = vals.count(v => math.abs(v - med) > 3.0 * mad)
      assert(flagged.getOrElse(t, 0) == expect,
        s"type $t: flagged ${flagged.getOrElse(t, 0)} events, local recompute says $expect")
    }
  }
}
