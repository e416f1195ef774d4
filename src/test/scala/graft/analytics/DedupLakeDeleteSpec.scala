package graft.analytics

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ingest.MergeSink

/** DELETE for the incremental-dedup lake tables (r12 — AnnLake's delete
  * logic on the LSH spine): a doc dropped by upstream curation must leave
  * the band postings and the shingle table, daily probes must stop
  * matching it, untouched posting files must carry over unrewritten, and
  * re-delete must be a content no-op. Runs on a PRIVATE copy of the
  * sf0.001 corpus so the shared per-dir sinks of the oracle queries stay
  * pristine.
  */
class DedupLakeDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_dld").toFile
    d.deleteOnExit()
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      Paths.get(d.getAbsolutePath, "documents.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    d.getAbsolutePath
  }

  test("deleted docs leave the band postings and shingle table; probes stop matching; no-op replay") {
    import spark.implicits._
    // warm the sinks and pick victims: corpus docs a daily probe currently matches
    val before = DedupQueries.incrLshCandidatesLake(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val victims = before.map(_._2).filter(_ % 5 != 0).distinct.take(2)
    assert(victims.length == 2, "corpus too small to pick matched victims")
    val bandSink = DedupQueries.ensureBandSink(spark, dir)
    val shingleSink = DedupQueries.ensureShingleSink(spark, dir)
    // the victims' posting rows, reconstructed the way the delete does
    val victimKeys = DedupQueries.bandTable(spark, dir)
      .filter(col("doc_id").isin(victims: _*)).select("band_key").distinct()
    val touchable = MergeSink.readOverlapping(spark, bandSink, victimKeys,
      Seq("band_key")).inputFiles.toSet
    val beforeFiles = MergeSink.read(spark, bandSink).inputFiles.toSet
    assert(touchable.size < beforeFiles.size,
      "victim bands overlap every file — the carryover assertion would be vacuous")

    DedupQueries.deleteDocs(spark, dir, victims.toSeq.toDF("doc_id"))

    // 1. daily probes stop matching the dropped docs
    val after = DedupQueries.incrLshCandidatesLake(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(victims.forall(v => !after.exists(_._2 == v)),
      s"deleted docs still matched: ${victims.filter(v => after.exists(_._2 == v)).toSeq}")
    // 2. no posting row still carries a victim; shingle rows are gone
    val postedIds = MergeSink.read(spark, bandSink)
      .select(explode(col("doc_ids")).as("id")).collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !postedIds.contains(v)))
    assert(MergeSink.read(spark, shingleSink)
      .filter(col("doc_id").isin(victims: _*)).count() == 0,
      "victim shingle rows survived the row delete")
    // 3. files outside the victims' manifest hit set carried over unrewritten
    val afterFiles = MergeSink.read(spark, bandSink).inputFiles.toSet
    val untouchable = beforeFiles -- touchable
    assert(untouchable.nonEmpty && untouchable.subsetOf(afterFiles),
      "the delete rewrote band files its key set never touched")
    // 4. replay-idempotent: a second identical delete leaves contents exact
    def snapshot() = MergeSink.read(spark, bandSink)
      .select(col("band_key"), col("doc_ids")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val snap1 = snapshot()
    DedupQueries.deleteDocs(spark, dir, victims.toSeq.toDF("doc_id"))
    assert(snapshot() == snap1, "re-delete changed band posting contents")
  }
}
