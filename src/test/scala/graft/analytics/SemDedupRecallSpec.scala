package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Pins dd_semdedup's quality contract: within-cluster comparison trades
  * PAIR RECALL for Σ cluster² pruning (a near-dup pair split across two
  * clusters is never compared). This spec measures that trade against the
  * exact all-pairs baseline — the number the operator's honesty rests on —
  * and floors it conservatively (a silent collapse to ~0 means the
  * assignment broke, not that tuning drifted).
  */
class SemDedupRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("within-cluster pruning keeps a measured fraction of true near-dup pairs") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // exact baseline: every pair at cosine >= τ
    val truePairs = (for {
      (ia, ea) <- vecs; (ib, eb) <- vecs
      if ia < ib && cos(ea, eb) >= 0.35
    } yield (ia, ib)).toSet
    assert(truePairs.nonEmpty)
    // the operator's view: a removed doc ⇒ at least one within-cluster pair
    // was compared and hit; count true pairs whose BOTH ends share a cluster
    val out = SparkEntry.allDefs.find(_.name == "dd_semdedup").get
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val caught = truePairs.count { case (a, b) => out(a) == out(b) }
    val recall = caught.toDouble / truePairs.size
    info(f"semdedup pair recall vs brute force at τ=0.35: $recall%.2f " +
      s"($caught of ${truePairs.size} true pairs share a cluster)")
    // conservative floor: isotropic synthetic embeddings are the WORST case
    // for cluster locality (no semantic structure to exploit); a real
    // corpus' near-dups are exactly what clusters capture
    assert(recall >= 0.15, f"recall collapsed: $recall%.2f")
  }
}
