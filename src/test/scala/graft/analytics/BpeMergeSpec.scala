package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** BPE vocabulary induction (tx_bpe_merge): the N-round trainer on a
  * hand-computed corpus (r12: BpeRounds = 10, with early stop when the
  * pair table exhausts — this corpus merges fully in 4 rounds, so the
  * run also pins the exhaustion path). The corpus is built so that BOTH
  * symbol-encoding failure modes change a visible winner:
  *
  *  - boundary safety: after round 1 merges (a,b)→ab, the word "aba" is
  *    [ab, a]; round 2 merges (b,a) and must NOT match the 'b' INSIDE the
  *    symbol 'ab' (a single-separator encoding rewrites [ab,a]→[a,ba] and
  *    round 3's winner becomes "a ba" instead of "ab a");
  *  - consecutive occurrences: "abab" = [a,b,a,b] must merge BOTH (a,b)
  *    occurrences in round 1 (an encoding whose replacement consumes the
  *    next occurrence's boundary leaves [ab,a,b], and round 2's winner
  *    flips from "b a" (6) to "ab a" (8)).
  *
  * Hand computation — corpus word frequencies ab×10, ba×6, aba×5, abab×3:
  *   round 1 pairs: (a,b) = 10 + 5 + 2·3 = 21, (b,a) = 6 + 5 + 3 = 14
  *     → merge "a b" (21); ab→[ab], ba→[b,a], aba→[ab,a], abab→[ab,ab]
  *   round 2 pairs: (b,a) = 6, (ab,a) = 5, (ab,ab) = 3
  *     → merge "b a" (6); ba→[ba]
  *   round 3 pairs: (ab,a) = 5, (ab,ab) = 3 → merge "ab a" (5)
  *   round 4 pairs: (ab,ab) = 3 → merge "ab ab" (3); abab→[abab]
  *   round 5: every word is a single symbol — pair table EMPTY, the
  *     trainer stops (and the oracle's remaining LEFT-JOIN rounds are
  *     identity rewrites contributing no winner rows)
  */
class BpeMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-bpe").toFile
    d.deleteOnExit()
    val text = (Seq.fill(10)("ab") ++ Seq.fill(6)("ba") ++
      Seq.fill(5)("aba") ++ Seq.fill(3)("abab")).mkString(" ")
    val df = spark.createDataFrame(Seq((1L, text))).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    df.coalesce(1).write.mode("overwrite").parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  test("merge rounds match the hand computation and stop at pair exhaustion (boundary + overlap safe)") {
    val rows = TextQueries.bpeMerge.fn(spark, dir)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1, "a b", "ab", 21L),
      (2, "b a", "ba", 6L),
      (3, "ab a", "aba", 5L),
      (4, "ab ab", "abab", 3L)),
      "boundary/overlap winners drifted, or exhaustion emitted phantom rounds")
  }

  test("lake tokenizer: the incremental batch probe equals in-plan tokenize; narrow probes prune (r12)") {
    val sf = "/root/testdata/sf0.01"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // persistence must be invisible: the manifest-pruned lake probe equals
    // the in-plan tokenize restricted to the batch docs
    val viaLake = rows(TextQueries.bpeIncrLake.fn(spark, sf))
    val viaPlan = rows(TextQueries.bpeTokenize.fn(spark, sf)
      .filter(col("doc_id") % 5 === 0))
    assert(viaLake.nonEmpty && viaLake == viaPlan,
      s"lake batch tokenization diverges (${viaLake.size} vs ${viaPlan.size})")
    // the word-keyed rep table spans files and a narrow probe prunes
    val (_, repsSink) = TextQueries.ensureBpeLake(spark, sf)
    val all = graft.ingest.MergeSink.read(spark, repsSink)
    assert(all.inputFiles.length > 2, "rep table must span several files")
    val probed = graft.ingest.MergeSink.readOverlapping(spark, repsSink,
      all.select("word").limit(1), Seq("word"))
    assert(probed.inputFiles.nonEmpty && probed.inputFiles.length < all.inputFiles.length,
      "narrow rep probe opened every file")
    // the winners table is the SHIPPED merge recipe, not a write-only
    // artifact: it must round-trip to exactly tx_bpe_merge's output
    val (winnersSink, _) = TextQueries.ensureBpeLake(spark, sf)
    val viaWinnersLake = graft.ingest.MergeSink.read(spark, winnersSink)
      .collect().map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("pair"),
        r.getAs[Long]("cnt"))).toSet
    val viaMerge = TextQueries.bpeMerge.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(3))).toSet
    assert(viaWinnersLake.nonEmpty && viaWinnersLake == viaMerge,
      "persisted winner recipe diverges from the live merge query")
  }

  test("merge result is invariant under input repartitioning") {
    val a = TextQueries.bpeMerge.fn(spark, dir).collect().toSet
    val b = TextQueries.bpeMerge.fn(spark, dir).collect().toSet
    assert(a == b)
  }

  test("tokenize applies the learned merges: every word reaches 1 token after round 4") {
    // after the four merges above every word is a single symbol
    // (abab = [ab,ab] → [abab] in round 4) → n_tokens = 24 over 24 words
    val rows = TextQueries.bpeTokenize.fn(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) == 24L && r.getLong(2) == 24L)
    assert(r.getDouble(3) == 1.0)
  }

  /** Fresh corpus writer for the r13 tests (the suite fixture above is
    * already cache-warm by the time they run).
    */
  private def writeCorpus(prefix: String, docs: Seq[(Long, String)]): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    df.coalesce(1).write.mode("overwrite").parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  test("ONE shared train feeds winners, reps and the lake tokenizer (r12 advice)") {
    // tx_bpe_merge, tx_bpe_tokenize and tx_bpe_incr_lake on a cold dir
    // used to train the same 10-round tokenizer up to three times; the
    // shared bpeTrained memo must collapse them to exactly one pass
    val d = writeCorpus("graft-bpe-once",
      Seq((1L, "ab ab ba aba abab ab"), (5L, "ab ba ba abab aba")))
    val before = TextQueries.trainRuns.get()
    assert(TextQueries.bpeMerge.fn(spark, d).collect().nonEmpty)
    assert(TextQueries.bpeTokenize.fn(spark, d).collect().nonEmpty)
    assert(TextQueries.bpeIncrLake.fn(spark, d).collect().nonEmpty)
    assert(TextQueries.trainRuns.get() == before + 1,
      s"expected exactly one train, ran ${TextQueries.trainRuns.get() - before}")
  }

  test("tx_bpe_incr_lake prunes at QUERY tier: an out-of-vocab-skewed batch opens a strict minority of rep files (r13)") {
    // r12 verdict ask #6: on the oracle corpus the batch shares the full
    // vocabulary, so the manifest prune degenerates and only a 1-word
    // spec probe demonstrated a subset. This fixture gives the batch doc
    // a 6-word vocabulary slice against a 600-word corpus bulk, and
    // asserts the LIVE query's rep-table scan set (not a hand probe)
    // stays a strict minority of the table's files.
    val corpusDocs = (1L to 4L).map { d =>
      d -> (0 until 150).map(i => f"c${d * 1000 + i}%05d").mkString(" ")
    }
    val batchDoc = 5L -> (Seq.fill(4)((1 to 6).map(i => s"bq$i").mkString(" "))).mkString(" ")
    val d = writeCorpus("graft-bpe-oov", corpusDocs :+ batchDoc)
    val (_, repsSink) = TextQueries.ensureBpeLake(spark, d)
    val total = graft.ingest.MergeSink.read(spark, repsSink).inputFiles.length
    assert(total > 10, s"rep table must span many files for a meaningful prune, has $total")
    val q = TextQueries.bpeIncrLake.fn(spark, d)
    assert(q.collect().nonEmpty, "batch tokenization returned nothing; prune proof vacuous")
    val repFiles = q.inputFiles.filter(_.contains("/reps/")).length
    assert(repFiles > 0 && repFiles * 2 < total,
      s"live query opened $repFiles of $total rep files — not a strict minority")
  }
}
