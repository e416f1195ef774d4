package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Deterministic weighted sampling (E50): the selected set must equal an
  * independent local recomputation of the A-ES keys, be invariant under
  * repartitioning (pure function of the data), and actually respect the
  * weights (heavier documents overrepresented vs a uniform sample).
  */
class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"
  private val K = 100

  private def docs = Tables.documents(spark, sf).select("doc_id", "n_chars")

  test("sample equals local A-ES recomputation and is partitioning-invariant") {
    val picked = CurateQueries.weightedSample(docs, "doc_id", "n_chars", K)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(picked.size === K)

    // independent local recomputation: only the uniform comes from the
    // engine (reimplementing xxhash64 would test our transcription of the
    // hash, not the sampler); key computation and selection are local
    val M = 1 << 20
    val hashed = docs
      .withColumn("h", (pmod(xxhash64(col("doc_id")), lit(M)) + 1)
        .cast("double") / lit((M + 1).toDouble))
      .select("doc_id", "n_chars", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val localPick = hashed
      .map { case (id, w, uu) => (id, -math.log(uu) / w.toDouble) }
      .sortBy { case (id, key) => (key, id) }
      .take(K).map(_._1).toSet
    assert(picked === localPick, "engine sample diverges from local A-ES")

    // pure function of the data: any partitioning yields the same set
    val repicked = CurateQueries.weightedSample(docs.repartition(13), "doc_id", "n_chars", K)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repicked === picked)
  }

  test("rows outside the A-ES domain (null / zero / negative weight) are excluded") {
    import spark.implicits._
    val mixed = Seq[(Long, java.lang.Double)](
      (1L, 5.0), (2L, 3.0), (3L, null), (4L, 0.0), (5L, -2.0), (6L, 1.0))
      .toDF("id", "w")
    val picked = CurateQueries.weightedSample(mixed, "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    // only the strictly-positive finite weights are eligible: a null key
    // would sort NULLS FIRST and dominate, w=0 gives ±Inf/NaN, w<0 sorts
    // before every valid row — all three would silently poison the sample
    assert(picked === Set(1L, 2L, 6L))
  }

  test("weights matter: sampled docs are longer than the corpus average") {
    val corpusAvg = docs.agg(avg("n_chars")).head().getDouble(0)
    val sampleAvg = CurateQueries.weightedSample(docs, "doc_id", "n_chars", K)
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleAvg > corpusAvg,
      s"length-weighted sample avg $sampleAvg not above corpus avg $corpusAvg")
  }
}
