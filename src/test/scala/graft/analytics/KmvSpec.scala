package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** KMV set-operation sketch (a14_kmv_setops): the engine result must equal
  * an independent LOCAL recomputation of the whole sketch algebra (only the
  * hash comes from the engine — reimplementing graft_rolling_hash would
  * test our transcription, not the algebra), and the estimates must track
  * the exact distinct counts within KMV's statistical error.
  */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"
  private val K = 64
  private val Mod = 1000000007L

  private lazy val hashed: Map[String, Set[Long]] =
    Tables.events(spark, sf)
      .select(col("event_type"),
        call_function("graft_rolling_hash", md5(col("user_id").cast(StringType))).as("hv"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def sketch(s: Set[Long]): Vector[Long] = s.toVector.sorted.take(K)
  private def est(sk: Vector[Long]): Double =
    if (sk.size < K) sk.size.toDouble else (K - 1).toDouble * Mod / sk.last

  test("engine output equals the local KMV algebra on engine hashes") {
    val out = ExtQueries.kmvSetOps.fn(spark, sf).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    }.toMap
    val types = hashed.keys.toSeq.sorted
    val expected = (for {
      a <- types; b <- types if a < b
    } yield {
      val (sa, sb) = (sketch(hashed(a)), sketch(hashed(b)))
      val merged = (sa ++ sb).distinct.sorted.take(K)
      val overlap = merged.count(h => sa.contains(h) && sb.contains(h))
      val j = overlap.toDouble / merged.size
      val eu = est(merged)
      (a, b) -> ((est(sa), est(sb), eu, j * eu, j))
    }).toMap
    assert(out.keySet == expected.keySet)
    expected.foreach { case (k, v) =>
      assert(out(k) == v, s"pair $k: engine ${out(k)} vs local $v")
    }
  }

  test("estimates track exact distinct counts within KMV error") {
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = ExtQueries.kmvSetOps.fn(spark, sf).collect()
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      // KMV σ ≈ n/√(k-1) ≈ 12.6% at k=64; 4σ keeps the test deterministic
      // in intent while catching estimator bugs (off-by-mod, wrong kth)
      assert(math.abs(r.getDouble(2) - exact(a)) <= 0.5 * exact(a), s"est_a for $a")
      assert(math.abs(r.getDouble(3) - exact(b)) <= 0.5 * exact(b), s"est_b for $b")
    }
  }

  test("sketches merge losslessly: sketch(A ∪ B) == merge(sketch A, sketch B)") {
    val types = hashed.keys.toSeq.sorted
    for (a <- types; b <- types if a < b) {
      val direct = sketch(hashed(a) ++ hashed(b))
      val merged = (sketch(hashed(a)) ++ sketch(hashed(b))).distinct.sorted.take(K)
      assert(direct == merged, s"merge not lossless for ($a, $b)")
    }
  }
}
