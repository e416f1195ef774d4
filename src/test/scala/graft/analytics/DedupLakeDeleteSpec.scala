package graft.analytics

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}
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

  /** PLANTED corpus for the window-SET tiers (r12 verdict ask #1): two
    * corpus docs sharing one full-width span, each with a unique one, and
    * two batch docs probing exactly those windows — so "a shared window
    * SURVIVES its co-owner's deletion, a unique window leaves the probes"
    * is asserted on windows whose ownership is known by construction, not
    * found by luck in synthetic text.
    */
  private val sh = (1 to 10).map(i => f"sh$i%02d").mkString(" ")   // shared block
  private val ua = (1 to 10).map(i => f"ua$i%02d").mkString(" ")   // unique to A
  private val ub = (1 to 10).map(i => f"ub$i%02d").mkString(" ")   // unique to B
  private val fl1 = (1 to 10).map(i => f"fl$i%02d").mkString(" ")
  private val fl2 = (11 to 20).map(i => f"fl$i%02d").mkString(" ")

  private lazy val planted: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_dldw").toFile
    d.deleteOnExit()
    Seq(
      (1L, s"$sh $ua"),   // corpus doc A: [sh][ua] spans
      (2L, s"$sh $ub"),   // corpus doc B: [sh][ub] spans
      (5L, s"$ua $fl1"),  // batch doc probing A's unique window
      (10L, s"$sh $fl2")  // batch doc probing the shared window
    ).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private def spanRows(sink: String): Map[String, Long] =
    MergeSink.read(spark, sink).select(col("s"), col("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def keptPerDoc(): Map[Long, Long] =
    SparkEntry.queries("dd_incr_span_lake")(spark, planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_kept")).toMap

  private def dupPerDoc(): Map[Long, Long] =
    SparkEntry.queries("dd_incr_substr_lake")(spark, planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup")).toMap

  test("window refcounts: shared windows survive a co-owner's delete, unique windows leave the probes, re-delete/crash-retry no-ops") {
    import spark.implicits._
    val spanSink = DedupQueries.ensureSpanSink(spark, planted)
    val substrSink = DedupQueries.ensureSubstrSink(spark, planted)
    // construction: the shared span is co-owned, the unique spans aren't
    assert(spanRows(spanSink) == Map(sh -> 2L, ua -> 1L, ub -> 1L))
    // probes BEFORE: both batch docs carry one corpus-duplicated span
    assert(keptPerDoc() == Map(5L -> 1L, 10L -> 1L)) // dup span excluded from kept
    assert(dupPerDoc() == Map(5L -> 1L, 10L -> 1L))  // the block window matches

    DedupQueries.deleteDocs(spark, planted, Seq(1L).toDF("doc_id"))

    // A's unique span LEFT the table (refcount hit zero, row pruned);
    // the shared span SURVIVED with its count decremented
    assert(spanRows(spanSink) == Map(sh -> 1L, ub -> 1L))
    // probes AFTER: doc 5's ua-span is no longer a corpus dup (kept rises),
    // doc 10's shared span still is (B survives)
    assert(keptPerDoc() == Map(5L -> 2L, 10L -> 1L))
    assert(dupPerDoc() == Map(5L -> 0L, 10L -> 1L))
    val substrSnap1 = MergeSink.read(spark, substrSink)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // re-delete: tombstone-filtered to nothing BEFORE any table is touched
    DedupQueries.deleteDocs(spark, planted, Seq(1L).toDF("doc_id"))
    assert(spanRows(spanSink) == Map(sh -> 1L, ub -> 1L),
      "re-delete double-decremented the shared window")

    // crash-retry: an interrupted delete (tombstone write lost) re-runs the
    // SAME batch; the per-sink applied-marker must skip the decrement —
    // a double decrement here would zero (and prune) the shared window
    MergeSink.delete(spark, DedupQueries.ensureTombSink(spark, planted),
      Seq(1L).toDF("doc_id"), Seq("doc_id"))
    DedupQueries.deleteDocs(spark, planted, Seq(1L).toDF("doc_id"))
    assert(spanRows(spanSink) == Map(sh -> 1L, ub -> 1L),
      "crash-retry replayed the refcount decrement")
    assert(MergeSink.read(spark, substrSink)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      == substrSnap1, "crash-retry changed the substr window table")

    // deleting the LAST co-owner prunes the shared window; probes flip
    DedupQueries.deleteDocs(spark, planted, Seq(2L).toDF("doc_id"))
    assert(spanRows(spanSink) == Map.empty[String, Long])
    assert(keptPerDoc() == Map(5L -> 2L, 10L -> 2L))
    assert(dupPerDoc() == Map(5L -> 0L, 10L -> 0L))
    // the audit trail: both docs tombstoned exactly once
    assert(MergeSink.read(spark, DedupQueries.ensureTombSink(spark, planted))
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  /** PLANTED cluster corpus for the LABEL tier (r13, E135 — decremental
    * connected components). Fixture found by deterministic minhash-band
    * search (the word seeds are load-bearing: LSH candidacy must hold by
    * construction, not by luck):
    *  - docs 1(A)–2(B)–3(C): B = A's words ++ C's tail vocabulary, spliced
    *    so shingles(B) = shingles(A) ∪ shingles(C) exactly — J(A,B) =
    *    J(C,B) = 0.5 (verified pairs), J(A,C) = 0 and no shared band.
    *    B BRIDGES the component {1,2,3}.
    *  - docs 4(D)–6(E): near-identical pair (J ≈ 0.82), a bystander
    *    component that must survive every delete untouched.
    *  - docs 7,8,9: identical texts — a 3-clique; deleting one member
    *    must RELABEL the remaining pair, not dissolve it.
    */
  private lazy val cluster: String = {
    import spark.implicits._
    val w = (0 until 12).map(i => s"w5x$i")
    val c = (0 until 10).map(i => s"c5y$i")
    val dd = (0 until 12).map(i => s"d0z$i")
    val clique = (0 until 12).map(i => s"k7v$i").mkString(" ")
    val d = Files.createTempDirectory("graft_dldl").toFile
    d.deleteOnExit()
    Seq(
      (1L, w.mkString(" ")),                          // A
      (2L, (w ++ c).mkString(" ")),                   // B (the bridge)
      (3L, (w.takeRight(2) ++ c).mkString(" ")),      // C
      (4L, dd.mkString(" ")),                         // D
      (6L, (dd.take(11) :+ "e0q1").mkString(" ")),    // E
      (7L, clique), (8L, clique), (9L, clique)
    ).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private def byDocRows(byDoc: String): Map[Long, Long] =
    MergeSink.read(spark, byDoc).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def byCompRows(byComp: String): Map[Long, Seq[Long]] =
    MergeSink.read(spark, byComp).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("cluster tables: deleting a BRIDGE doc splits its component; a clique member's delete relabels; bystanders untouched") {
    import spark.implicits._
    val (byDoc, byComp) = DedupQueries.ensureLabelSinks(spark, cluster)
    // the curation tier's fingerprint table rides the same purge: the
    // clique docs 7/8/9 share ONE content hash (refcount 3)
    val fpSink = CurateQueries.ensureFpSink(spark, cluster)
    def fpCounts(): Map[String, Long] =
      MergeSink.read(spark, fpSink).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fp0 = fpCounts()
    assert(fp0.size == 6 && fp0.values.toSeq.sorted == Seq(1L, 1L, 1L, 1L, 1L, 3L),
      s"expected 5 unique fps + one shared-by-3: $fp0")
    val cliqueFp = fp0.find(_._2 == 3L).get._1
    // construction: {1,2,3} one component (B bridges), {4,6}, {7,8,9}
    assert(byDocRows(byDoc) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 6L -> 4L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
    assert(byCompRows(byComp) ==
      Map(1L -> Seq(1L, 2L, 3L), 4L -> Seq(4L, 6L), 7L -> Seq(7L, 8L, 9L)))

    // deleting the BRIDGE: A and C keep no surviving edge — the component
    // DISSOLVES (both revert to implicit self-labels, i.e. absent rows)
    DedupQueries.deleteDocs(spark, cluster, Seq(2L).toDF("doc_id"))
    assert(byDocRows(byDoc) ==
      Map(4L -> 4L, 6L -> 4L, 7L -> 7L, 8L -> 7L, 9L -> 7L),
      "bridge delete must dissolve {1,2,3} and leave bystanders exact")
    assert(byCompRows(byComp) == Map(4L -> Seq(4L, 6L), 7L -> Seq(7L, 8L, 9L)))
    // B's unique fingerprint left the curation table; the rest survive
    assert(fpCounts().size == 5 && !fpCounts().contains(
      fp0.keySet.diff(fpCounts().keySet).headOption.getOrElse("")))

    // deleting a CLIQUE member: the remaining pair stays one component,
    // and the SHARED fingerprint survives with its refcount decremented
    DedupQueries.deleteDocs(spark, cluster, Seq(9L).toDF("doc_id"))
    assert(byDocRows(byDoc) == Map(4L -> 4L, 6L -> 4L, 7L -> 7L, 8L -> 7L))
    assert(byCompRows(byComp) == Map(4L -> Seq(4L, 6L), 7L -> Seq(7L, 8L)))
    assert(fpCounts()(cliqueFp) == 2L,
      "a fingerprint shared by surviving exact-dups must survive decremented")

    // replay both (tombstone-filtered): contents exact
    DedupQueries.deleteDocs(spark, cluster, Seq(2L, 9L).toDF("doc_id"))
    assert(byDocRows(byDoc) == Map(4L -> 4L, 6L -> 4L, 7L -> 7L, 8L -> 7L))
    assert(byCompRows(byComp) == Map(4L -> Seq(4L, 6L), 7L -> Seq(7L, 8L)))
  }
}
