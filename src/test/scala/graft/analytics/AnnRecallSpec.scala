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

  /** CLUSTERED-corpus fixture (r9 verdict ask #5): the driver embeddings
    * are near-isotropic, which is the EASY regime for sign-LSH and the
    * blind one for IVF — its value and failure modes only appear when the
    * corpus has cluster structure. Deterministic mixture of 10 Gaussians
    * in R^64 (unit-ish centers, sigma 0.25/dim → intra-cluster cosine
    * ≈ 0.94, inter ≈ 0), 50 vectors per cluster, vec_id interleaved
    * (vec_id % 10 = cluster) so the 5 probes cover 5 DIFFERENT clusters
    * and the first-k cell seeds span clusters too. Same schema as the
    * driver table, written once per JVM to a temp dir — every ANN tier
    * runs on it unchanged through its normal (dir-keyed) training caches.
    */
  private lazy val mogDir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(421L)
    val dim = 64; val centers = 10; val perC = 50
    val cs = Array.fill(centers, dim)(rnd.nextGaussian())
    val rows = (0 until centers * perC).map { g =>
      val c = g % centers
      val v = Array.tabulate(dim)(d => (cs(c)(d) + 0.25 * rnd.nextGaussian()).toFloat)
      (g.toLong, v.toSeq, c)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_mog").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def topSets(name: String, k: Int, dir: String = sf): Map[Long, Set[Long]] =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, dir)
      .filter(s"rank <= $k").collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }

  // the exact baseline is the costliest query in the suite — compute once
  private lazy val exactTop5 = topSets("ann_bruteforce_topk", 5)
  private lazy val mogExactTop5 = topSets("ann_bruteforce_topk", 5, mogDir)

  private def overlap(exact: Map[Long, Set[Long]],
                      got: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (p, truth) =>
      got.getOrElse(p, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  private def recallAt(approx: String, k: Int): Double = {
    require(k == 5, "baseline precomputed at k=5")
    overlap(exactTop5, topSets(approx, k))
  }

  private def mogRecallAt(approx: String): Double =
    overlap(mogExactTop5, topSets(approx, 5, mogDir))

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

  test("CLUSTERED corpus: every tier's recall@5 stays above its floor") {
    // floors pinned at the measured r10 operating point minus margin; the
    // isotropic floors above guard the other corpus shape
    val ivf = mogRecallAt("ann_ivf_topk")
    val pq = mogRecallAt("ann_pq_topk")
    val ivfpq = mogRecallAt("ann_ivfpq_topk")
    val lsh = mogRecallAt("ann_lsh_topk")
    info(f"clustered recall@5: ivf=$ivf%.2f pq=$pq%.2f ivfpq=$ivfpq%.2f lsh=$lsh%.2f")
    // measured r10: ivf=1.00 pq=0.96 ivfpq=0.96 lsh=1.00. The fixture is
    // seed-fixed (no regeneration drift), so the floors sit close: cluster
    // structure is precisely where the trained cells must win
    assert(ivf >= 0.9, f"IVF collapsed on clustered data: $ivf%.2f")
    assert(pq >= 0.85, f"PQ collapsed on clustered data: $pq%.2f")
    assert(ivfpq >= 0.85, f"IVF+PQ collapsed on clustered data: $ivfpq%.2f")
    assert(lsh >= 0.9, f"sign-LSH collapsed on clustered data: $lsh%.2f")
  }

  test("nprobe → recall tradeoff is monotone and saturates (both corpora)") {
    // the knob a deployment tunes: more probed cells → recall up, scan
    // fraction up. Measure IVF recall@5 at nprobe 1..4 on both corpus
    // shapes; the law's default sits on the saturating shoulder.
    def at(dir: String, exact: Map[Long, Set[Long]], np: Int): Double =
      overlap(exact, AnnQueries.ivfSearch(spark, dir, Some(np))
        .filter("rank <= 5").collect()
        .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id"))
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet })
    val iso = (1 to 4).map(at(sf, exactTop5, _))
    val mog = (1 to 4).map(at(mogDir, mogExactTop5, _))
    info(s"nprobe→recall@5 isotropic: ${iso.map(r => f"$r%.2f").mkString(", ")}")
    info(s"nprobe→recall@5 clustered: ${mog.map(r => f"$r%.2f").mkString(", ")}")
    // monotone non-decreasing in nprobe (a violation means the probe-cell
    // ranking is broken), and the planner default (3) is near-saturated
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(mog.zip(mog.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(iso(2) >= iso(3) - 0.1 && mog(2) >= mog(3) - 0.1,
      "the default nprobe=3 sits far below the nprobe=4 shoulder")
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

  test("INCREMENTAL index recall@5 sits within 0.1 of the full-trained lake tier (both corpora)") {
    // r11 verdict ask #3: ann_ivfpq_incr had oracle EQUALITY only — the
    // oracle mirrors the same slice recipe, so a QUALITY regression from
    // training on 80% of the corpus (slice-trained centroids/codebooks,
    // batch merely assigned+encoded) could never surface there. Measure
    // the merged index's recall against the exact baseline on BOTH corpus
    // shapes and pin it to the full-trained operating point.
    val isoFull = recallAt("ann_ivfpq_lake", 5)
    val isoIncr = recallAt("ann_ivfpq_incr", 5)
    val mogFull = mogRecallAt("ann_ivfpq_lake")
    val mogIncr = mogRecallAt("ann_ivfpq_incr")
    info(f"ivfpq recall@5 full-trained vs slice-trained: " +
      f"isotropic $isoFull%.2f vs $isoIncr%.2f, clustered $mogFull%.2f vs $mogIncr%.2f")
    assert(isoIncr >= isoFull - 0.1,
      f"slice training degrades isotropic recall: $isoIncr%.2f vs full $isoFull%.2f")
    assert(mogIncr >= mogFull - 0.1,
      f"slice training degrades clustered recall: $mogIncr%.2f vs full $mogFull%.2f")
    // absolute collapse floors at measured-minus-margin (r12 measured:
    // isotropic 0.84 vs full 0.88, clustered 0.88 vs full 0.96 — the
    // slice-trained operating point costs ≤ 0.08 recall on either shape)
    assert(isoIncr >= 0.7, f"incremental index recall collapsed: $isoIncr%.2f")
    assert(mogIncr >= 0.75, f"incremental index collapsed on clustered data: $mogIncr%.2f")
  }

  test("GRAPH beam recall@5 stays above the floor (both corpora)") {
    // the graph tier's trade: ≤ nprobe + rounds·ef·M exact scores per
    // probe at ANY corpus size (the law test below), bought with the
    // one-off kNN-graph build. Floors are collapse guards at
    // measured-minus-margin; clustered data is where a neighborhood graph
    // must shine (edges follow cluster structure by construction).
    // measured r14 (medoid + antipode entries): 0.84 isotropic / 0.92
    // clustered — the multi-entry seeds lifted the clustered row from
    // r13's 0.84; floors at measured-minus-margin, the post-delete
    // convention
    val iso = recallAt("ann_graph_beam", 5)
    val mog = mogRecallAt("ann_graph_beam")
    info(f"ann_graph_beam recall@5: isotropic $iso%.2f, clustered $mog%.2f")
    assert(iso >= 0.7, f"graph-beam recall collapsed: $iso%.2f")
    assert(mog >= 0.8, f"graph-beam recall collapsed on clustered data: $mog%.2f")
  }

  test("GRAPH incremental tier recall@5 stays above the floor (both corpora)") {
    // the slice-trained graph index (built on 80% of the corpus, batch
    // inserted exactly): the insert's exactness means any recall gap vs
    // the full tier comes from the slice-trained CELLS. r13 measured
    // 0.80/0.64 — the clustered walk was TRAPPED: with 7 slice-trained
    // cells over 10 clusters, a merged cell's within-cell kNN graph
    // splits into per-cluster components the beam cannot cross, and the
    // single near-centroid medoid seeded only one of them. The r14
    // medoid+ANTIPODE entry pair (r13 verdict ask #4) seeds the other
    // component too — measured r14: 0.80 isotropic / 0.80 clustered,
    // closing the gap to IVF+PQ's slice rows. Floor at the verdict's
    // ≥0.75 bar. The lake tier needs no row of its own —
    // AnnGraphLakeSpec pins it result-identical to ann_graph_beam.
    val iso = recallAt("ann_graph_incr", 5)
    val mog = mogRecallAt("ann_graph_incr")
    info(f"ann_graph_incr recall@5: isotropic $iso%.2f, clustered $mog%.2f")
    assert(iso >= 0.7, f"incr graph recall collapsed: $iso%.2f")
    assert(mog >= 0.75, f"incr graph recall collapsed on clustered data: $mog%.2f")
  }

  test("GRAPH beam candidate-volume law: scored set per probe bounded by entries*nprobe + rounds*ef*M") {
    // the property that justifies a graph tier next to IVF: an IVF probe
    // scores nprobe·occupancy vectors (bounded only because the planner
    // grows the cell count); the beam walk scores at most its entry points
    // (GraphEntries per probed cell since r14's multi-entry seeds) plus
    // rounds·ef·M expansions PER PROBE — a corpus-size-independent
    // constant. Checked on both corpus shapes, plus the out-degree cap the
    // bound depends on.
    for (d <- Seq(sf, mogDir)) {
      val (sc, _) = AnnQueries.graphBeamParts(spark, d)
      val k = AnnQueries.ivfCellsFor(graft.Tables.embeddings(spark, d).count())
      val bound = AnnQueries.GraphEntries * AnnQueries.nprobeFor(k) +
        AnnQueries.BeamRounds * AnnQueries.BeamEf * AnnQueries.GraphM
      val perProbe = sc.groupBy("probe_id").count().collect().map(_.getLong(1))
      assert(perProbe.nonEmpty && perProbe.forall(_ <= bound),
        s"scored-candidate law violated in $d: ${perProbe.max} > $bound")
      val deg = AnnQueries.graphEdges(spark, d)
        .groupBy("src").count().collect().map(_.getLong(1))
      assert(deg.forall(_ <= AnnQueries.GraphM),
        "graph out-degree exceeds GraphM")
    }
  }

  test("POST-DELETE index recall@5 vs brute force over the SURVIVING vectors (both corpora)") {
    // r12 verdict ask #7: ann_ivfpq_delete has oracle EQUALITY (the incr
    // oracle minus the dropped candidates) — the missing leg is QUALITY:
    // after every DelMod-th vector leaves the postings, how well does the
    // pruned index retrieve against the exact top-5 over the SURVIVORS?
    // The exact baseline recomputes locally (corpus is driver-small at
    // this SF) with deleted ids excluded from the candidate set; probes
    // (vec_id < ProbeCount) are untouched by the delete, exactly as in
    // the live path.
    def survivorExact(dir: String): Map[Long, Set[Long]] = {
      val vecs = graft.Tables.embeddings(spark, dir)
        .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
        .collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray)
        .sortBy(_._1)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      vecs.filter(_._1 < AnnQueries.ProbeCount).map { case (p, pe) =>
        val top = vecs
          .filter { case (id, _) => id != p && id % AnnLake.DelMod != 0 }
          .map { case (id, e) => (cos(pe, e), id) }
          .sortBy(t => (-t._1, t._2)).take(5)
        p -> top.map(_._2).toSet
      }.toMap
    }
    val iso = overlap(survivorExact(sf), topSets("ann_ivfpq_delete", 5))
    val mog = overlap(survivorExact(mogDir), topSets("ann_ivfpq_delete", 5, mogDir))
    info(f"post-delete ivfpq recall@5 vs surviving-exact: isotropic $iso%.2f, clustered $mog%.2f")
    // floors at measured-minus-margin (r13 measured: 0.84 isotropic /
    // 0.88 clustered — identical to the incr tier's 0.84/0.88, so pruning
    // the deleted ids costs NO recall on the survivors) — collapse guards
    // for the pruned index, both corpus shapes
    assert(iso >= 0.7, f"post-delete recall collapsed: $iso%.2f")
    assert(mog >= 0.75, f"post-delete recall collapsed on clustered data: $mog%.2f")
  }
}
