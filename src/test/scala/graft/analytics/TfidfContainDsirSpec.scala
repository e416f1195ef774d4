package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Semantics of the session's third operator batch on planted corpora:
  * TF-IDF ranks the distinctive term first, containment detects the
  * quoted-subset direction, and DSIR weights order target-like docs above
  * out-of-domain ones.
  */
class TfidfContainDsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val d = Files.createTempDirectory("graft-tcd").toFile
    d.deleteOnExit()
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  test("tfidf ranks the distinctive rare term above ubiquitous terms") {
    // N=3. doc 1: apple tf=2 df=1 → 2·3/1 = 6; common tf=2 df=3 → 2;
    // banana tf=1 df=2 → 1.5 — exact rational ordering
    val dir = writeDocs(Seq(
      (1L, "apple apple banana common common", "en"),
      (2L, "cherry common common", "en"),
      (3L, "banana common", "en")))
    val top = TextQueries.tfidfKeywords.fn(spark, dir)
      .filter(col("doc_id") === 1L).orderBy("rk")
      .collect().map(r => (r.getString(1), r.getDouble(4)))
    assert(top.toSeq == Seq(("apple", 6.0), ("common", 2.0), ("banana", 1.5)))
  }

  test("containment reports the quoted-subset direction asymmetrically") {
    // same 80-char prefix (the blocking key); B extends A, so every
    // shingle of A appears in B: cont_ab = 1.0, cont_ba < 1
    val prefix = (1 to 20).map(i => s"word$i").mkString(" ") // > 80 chars
    val dir = writeDocs(Seq(
      (1L, prefix, "en"),
      (2L, s"$prefix extra tail content beyond the quoted part", "en")))
    val rows = DedupQueries.containment.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 1)
    val (a, b, contAb, contBa) = rows.head
    assert(a == 1L && b == 2L)
    assert(contAb == 1.0, s"subset doc must be fully contained, got $contAb")
    assert(contBa < 1.0, s"superset doc must not be fully contained, got $contBa")
  }

  test("dsir weight orders target-like docs above out-of-domain docs") {
    // target stratum (en) speaks 'alpha'; the de stratum speaks 'beta'.
    // A new doc written in target vocabulary must outweigh a beta doc.
    val dir = writeDocs(
      (1L to 5L).map(i => (i, "alpha alpha alpha", "en")) ++
        (6L to 10L).map(i => (i, "beta beta beta", "de")))
    val w = CurateQueries.dsirWeights.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // en docs: every occurrence is 'alpha' (t=15, c=15) → (15+1)/(15+1) = 1
    // de docs: 'beta' never in target (t=0, c=15) → 1/16
    assert(w(1L) == 1.0 && w(6L) == 1.0 / 16.0, s"weights: $w")
    assert((1L to 5L).forall(i => w(i) > w(i + 5)), "target docs must outweigh")
  }
}
