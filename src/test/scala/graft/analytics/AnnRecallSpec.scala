package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Pins the ANN quality contract: the bucketed variants trade recall for
  * corpus-partition-local work, and this spec MEASURES the trade against
  * the exact brute-force baseline instead of leaving it implicit. Floors
  * are deliberately conservative (they guard against a silent recall
  * collapse — e.g. a broken bucket code — not against tuning drift).
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def topSets(name: String, k: Int): Map[Long, Set[Long]] =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, sf)
      .filter(s"rank <= $k").collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }

  // the exact baseline is the costliest query in the suite — compute once
  private lazy val exactTop5 = topSets("ann_bruteforce_topk", 5)

  private def recallAt(approx: String, k: Int): Double = {
    require(k == 5, "baseline precomputed at k=5")
    val exact = exactTop5
    val got = topSets(approx, k)
    val per = exact.map { case (p, truth) =>
      got.getOrElse(p, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  test("sign-LSH multiprobe recall@5 stays above the floor") {
    val r = recallAt("ann_lsh_topk", 5)
    info(f"ann_lsh_topk recall@5 = $r%.2f")
    assert(r >= 0.4, f"LSH recall collapsed: $r%.2f")
  }

  test("PQ ADC recall@5 stays above the floor") {
    // round-9 operating point: L2-normalized subvectors (quantized L2 on
    // the unit sphere is rank-equivalent to cosine) + the Refine-deep
    // exact-cosine re-rank — measured 0.80 (was 0.24 unnormalized and
    // unrefined). The floor is a USABLE retrieval bar now, not just a
    // collapse guard.
    val r = recallAt("ann_pq_topk", 5)
    info(f"ann_pq_topk recall@5 = $r%.2f")
    assert(r >= 0.6, f"PQ recall below the operating point: $r%.2f")
  }

  test("IVF nprobe-cell recall@5 stays above the floor") {
    // round-9 operating point: trained spherical k-means cells (one
    // deterministic Lloyd step) replace the label cells, which carried
    // ZERO cosine signal on this corpus (measured intra-label mean cosine
    // ≈ inter-label ≈ 0) — measured 0.96 (was 0.20).
    val r = recallAt("ann_ivf_topk", 5)
    info(f"ann_ivf_topk recall@5 = $r%.2f")
    assert(r >= 0.7, f"IVF recall below the operating point: $r%.2f")
  }

  test("IVF+PQ composed recall@5 stays above the floor") {
    // double approximation, now with spherical cells + normalized PQ +
    // exact refine — measured 0.88 (was 0.08). The r8 verdict's bar for a
    // usable composed index was ≥ 0.5; the floor sits above it with margin
    // for corpus regeneration.
    val r = recallAt("ann_ivfpq_topk", 5)
    info(f"ann_ivfpq_topk recall@5 = $r%.2f")
    assert(r >= 0.6, f"IVF+PQ recall below the operating point: $r%.2f")
  }

  test("all-kNN join recall@3 (probe subset) stays above the floor") {
    // ann_knn_join covers EVERY vector; restrict to the brute-force
    // probes and compare top-3 sets. Round-9 operating point: candidates
    // from the trained spherical cells (nprobe per vector) — measured
    // 0.63 vs 0.47 for the sign-bucket blocking it replaced.
    val exact3 = topSets("ann_bruteforce_topk", 3)
    val knn = SparkEntry.allDefs.find(_.name == "ann_knn_join").get.fn(spark, sf)
      .filter("rank <= 3").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val per = exact3.map { case (p, truth) =>
      knn.getOrElse(p, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val r = per.sum / per.size
    info(f"ann_knn_join recall@3 = $r%.2f")
    assert(r >= 0.5, f"kNN-join recall below the operating point: $r%.2f")
  }

  test("all-kNN join CORPUS-WIDE recall@3 stays above the floor") {
    // the probe subset is 5 vectors; the docstring's 0.63 claim is the
    // average over EVERY vector — pin it with a local exact recompute
    // (500×500 cosine, driver-side, ~16M multiplies)
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val ids = vecs.map(_._1)
    val m = vecs.map(_._2)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = ids.indices.map { i =>
      val scored = ids.indices.filter(_ != i)
        .map(j => (cos(m(i), m(j)), ids(j))).sortBy(t => (-t._1, t._2)).take(3)
      ids(i) -> scored.map(_._2).toSet
    }.toMap
    val knn = SparkEntry.allDefs.find(_.name == "ann_knn_join").get.fn(spark, sf)
      .filter("rank <= 3").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val per = exact.map { case (p, truth) =>
      knn.getOrElse(p, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val r = per.sum / per.size
    info(f"ann_knn_join corpus-wide recall@3 = $r%.2f")
    assert(r >= 0.55, f"corpus-wide kNN recall below the operating point: $r%.2f")
  }
}
