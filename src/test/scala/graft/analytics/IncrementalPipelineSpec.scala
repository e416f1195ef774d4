package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Planted-corpus exactness for pipe_incremental_corpus: one batch doc per
  * verdict class, each engineered to fail exactly its stage — including
  * the exact_dup and contaminated branches the synthetic corpus does not
  * exercise at the oracle SF (its verdict histogram there is
  * kept/near_dup/quality only).
  */
class IncrementalPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 50 distinct non-stopword words → quality = 50/200 · 1.0 = 0.25 ≥ 0.2
  private def longText(prefix: String): String =
    (1 to 50).map(i => s"$prefix$i").mkString(" ")

  test("each planted batch doc gets exactly its engineered verdict") {
    import spark.implicits._
    val dir = new java.io.File(sys.props("java.io.tmpdir"), "graft_incr_plant")
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmRf)
      f.delete(); ()
    }
    rmRf(dir); dir.mkdirs()

    val corpusText = longText("corp")
    // near-dup of corpusText: same first 45 words, 5 swapped → J >> 0.5
    val nearText = ((1 to 45).map(i => s"corp$i") ++ (1 to 5).map(i => s"alt$i")).mkString(" ")
    val evalText = longText("evl") // probe = its first 10 words
    val probe = (1 to 10).map(i => s"evl$i").mkString(" ")
    val docs = Seq(
      // eval doc (id % 50 == 0, also a batch doc): unique text, kept
      (0L, longText("zero"), "en", "s", 1L),
      // corpus doc (id % 5 != 0)
      (1L, corpusText, "en", "s", 1L),
      // batch: exact copy of the corpus doc → exact_dup
      (5L, corpusText, "en", "s", 1L),
      // batch: near copy of the corpus doc → near_dup (cross match)
      (10L, nearText, "en", "s", 1L),
      // batch: too short → quality
      (15L, "tiny words only", "en", "s", 1L),
      // batch: embeds eval doc 50's 10-word probe → contaminated
      (20L, s"$probe ${longText("fill")}", "en", "s", 1L),
      // batch: unique, long → kept
      (25L, longText("uniq"), "en", "s", 1L),
      // the second eval doc whose probe doc 20 embeds
      (50L, evalText, "en", "s", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.allDefs.find(_.name == "pipe_incremental_corpus").get
      .fn(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(
      0L -> "kept", 5L -> "exact_dup", 10L -> "near_dup", 15L -> "quality",
      20L -> "contaminated", 25L -> "kept", 50L -> "kept"),
      s"planted verdicts diverge: $out")
    rmRf(dir)
  }
}
