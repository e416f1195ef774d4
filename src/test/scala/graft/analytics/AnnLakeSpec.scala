package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, Tables, TestSpark}
import graft.ingest.MergeSink

/** The lake-persisted ANN index (r10 verdict ask #1): persistence must be
  * INVISIBLE to results (lake probes equal their in-plan originals bit for
  * bit), probes must read manifest-pruned FILE subsets (never the table),
  * and the incremental path must really be incremental — the batch is
  * assigned to existing centroids and MERGE-appended into touched cells,
  * leaving one posting per vector across the merged index.
  */
class AnnLakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def run(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, sf)

  private def rows(name: String): Set[(Long, Long, Double, Int)] =
    run(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("lake IVF probe equals the in-plan ivf_topk exactly") {
    val lake = rows("ann_ivf_lake")
    val plan = rows("ann_ivf_topk")
    assert(lake.nonEmpty && lake == plan,
      s"lake IVF diverges (${lake.size} vs ${plan.size})")
  }

  test("lake IVF+PQ probe equals the in-plan ivfpq_topk exactly") {
    val lake = rows("ann_ivfpq_lake")
    val plan = rows("ann_ivfpq_topk")
    assert(lake.nonEmpty && lake == plan,
      s"lake IVF+PQ diverges (${lake.size} vs ${plan.size})")
  }

  test("cell and code posting tables prune: a narrow cell probe opens a strict file subset") {
    val sinks = AnnLake.ensureAnnLake(spark, sf).sinks
    for (sink <- Seq(sinks.cells, sinks.codes)) {
      val all = MergeSink.read(spark, sink)
      val total = all.inputFiles.length
      assert(total > 2, s"$sink must span several files, has $total")
      val someCells = all.select("cell", "salt").limit(1)
      val probed = MergeSink.readOverlapping(spark, sink, someCells,
        Seq("cell", "salt"))
      assert(probed.inputFiles.nonEmpty && probed.inputFiles.length < total,
        s"narrow cell probe opened all $total files of $sink")
    }
  }

  test("the LIVE code-posting read scans exactly the manifest hit set for the probe cells") {
    // wiring pin (the IncrLshLakeSpec:34 pattern): the declared query's ADC
    // frame must reach the code table through readOverlapping — a refactor
    // to a directory read changes the scan set and fails here
    val sinks = AnnLake.ensureAnnLake(spark, sf).sinks
    val k = AnnQueries.ivfCellsFor(Tables.embeddings(spark, sf).count())
    val pcells = AnnLake.lakePcells(spark, sf, sinks, AnnQueries.nprobeFor(k))
    val expected = MergeSink
      .readOverlapping(spark, sinks.codes,
        AnnLake.saltedKeys(pcells, MergeSink.read(spark, sinks.centroids)),
        Seq("cell", "salt"))
      .inputFiles.toSet
    val live = AnnLake.lakeCodeRows(spark, sf, sinks, pcells).inputFiles
      .filter(_.contains("/codes/")).toSet // pcells' centroid read is not the ADC scan
    assert(live.nonEmpty && live == expected,
      s"live ADC scan set diverged from the manifest prune (${live.size} vs ${expected.size})")
  }

  test("incremental index: batch merged into EXISTING cells, one posting per vector, no retrain") {
    val h = AnnLake.ensureAnnIncrLake(spark, sf)
    val sinks = h.sinks
    // the centroid table is slice-trained: exactly the planner's k cells
    // (computed here INDEPENDENTLY of the handle — h.cells derives from the
    // centroid table, so asserting it against the table would be circular),
    // never touched by the batch merge (versions stay at the build commit)
    val k = AnnQueries.ivfCellsFor(
      Tables.embeddings(spark, sf).filter(col("vec_id") % 5 =!= 0).count())
    assert(MergeSink.read(spark, sinks.centroids).count() == k)
    assert(h.cells == k, "the handle's trained-cell count diverges from the lake")
    assert(MergeSink.versions(sinks.centroids).size == 1,
      "the batch path must NOT retrain/rewrite centroids")
    assert(MergeSink.versions(sinks.codebook).size == 1,
      "the batch path must NOT retrain/rewrite codebooks")
    // cells/codes got the build commit + the batch MERGE commit
    assert(MergeSink.versions(sinks.cells).size == 2,
      "the batch postings must arrive through ONE MERGE append")
    assert(MergeSink.versions(sinks.codes).size == 2)
    // the merged postings cover every corpus vector exactly once
    val n = Tables.embeddings(spark, sf).count()
    val members = MergeSink.read(spark, sinks.cells)
      .select(explode(col("members")).as("vec_id"))
    assert(members.count() == n, "postings lost or duplicated vectors")
    assert(members.distinct().count() == n)
    val codeIds = MergeSink.read(spark, sinks.codes)
      .select(explode(col("codes")).as("c")).select(col("c.vec_id"))
    assert(codeIds.count() == n && codeIds.distinct().count() == n)
  }

  test("replayed batch append is a NO-OP: postings stay set-exact (replay idempotence)") {
    // the EventsStream standard applied to the index: a micro-batch
    // re-delivered after a failure must rewrite the touched cells to
    // IDENTICAL contents, never double their members
    val sinks = AnnLake.ensureAnnIncrLake(spark, sf).sinks
    def snapshot() = MergeSink.read(spark, sinks.cells)
      .select(col("cell"), col("salt"), col("members")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Long](2)).toMap
    val before = snapshot()
    AnnLake.appendBatch(spark, sinks,
      AnnQueries.normalized(spark, sf).filter(col("vec_id") % 5 === 0))
    assert(snapshot() == before, "replaying the batch append changed the postings")
  }

  test("a HOT-CELL corpus splits postings across salted keys; probes stay result-identical") {
    // the planner holds occupancy ≈ 64 on spread data; force the
    // pathological regime with a small saltTarget so every cell must split
    val sinks = AnnLake.buildFullIndex(spark, sf, "graft_ann_salt", saltTarget = 8)
    val cents = MergeSink.read(spark, sinks.centroids)
    assert(cents.filter(col("salts") > 1).count() > 0,
      "no cell split — the pathology did not engage")
    // no salted posting row exceeds its bound (+1 slack for pmod imbalance
    // is NOT allowed here: the bound is per-row aggregation state, assert
    // a generous 4x of target instead of exact balance)
    val worst = MergeSink.read(spark, sinks.cells)
      .select(size(col("members")).as("n")).agg(max(col("n"))).head().getInt(0)
    assert(worst <= 32, s"a salted posting still holds $worst members")
    // and the salted index answers EXACTLY like the unsalted in-plan query
    val k = AnnQueries.ivfCellsFor(Tables.embeddings(spark, sf).count())
    val salted = AnnLake.lakeIvfSearchForTest(spark, sf, sinks,
        AnnQueries.nprobeFor(k)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(salted == rows("ann_ivf_topk"),
      "salting changed probe results — the split must be invisible")
  }

  test("the incremental probe finds batch vectors as neighbors (the merge is live, not vacuous)") {
    val out = rows("ann_ivfpq_incr")
    assert(out.nonEmpty)
    val batchNeighbors = out.filter(_._2 % 5 == 0)
    assert(batchNeighbors.nonEmpty,
      "no batch vector surfaced as a neighbor — the append path is untested by this corpus")
  }

  test("version-keyed memo: a maintenance commit after warm-up is detected and re-pinned (r12)") {
    // the r11 gap: ensure* memoized per (process, dir) alone, so a commit
    // landing AFTER the memo warmed was invisible until process restart.
    // The memo now revalidates the sink tables' commit versions on every
    // access — prove detect-and-refresh on the shared incr index with a
    // REPLAY append (content no-op by replay idempotence; version advances)
    val h = AnnLake.ensureAnnIncrLake(spark, sf)
    val seen0 = AnnLake.incrSeen(sf).get
    assert(seen0(h.sinks.cells) == MergeSink.versions(h.sinks.cells).last,
      "warm memo must believe the current commit versions")
    AnnLake.appendBatch(spark, h.sinks,
      AnnQueries.normalized(spark, sf).filter(col("vec_id") % 5 === 0))
    assert(MergeSink.versions(h.sinks.cells).last > seen0(h.sinks.cells),
      "the maintenance append must land a new commit")
    // stale until the next ensure touches it...
    assert(AnnLake.incrSeen(sf).get == seen0)
    // ...which must DETECT the advance, re-derive against the lake, re-pin
    val h2 = AnnLake.ensureAnnIncrLake(spark, sf)
    val seen1 = AnnLake.incrSeen(sf).get
    assert(seen1 != seen0, "stale memo went undetected")
    assert(seen1(h.sinks.cells) == MergeSink.versions(h.sinks.cells).last)
    assert(seen1(h.sinks.codes) == MergeSink.versions(h.sinks.codes).last)
    assert(h2.sinks == h.sinks)
    assert(h2.cells == h.cells,
      "a replayed (content-identical) commit must re-derive the same trained-cell count")
  }

  test("a second maintenance commit is OBSERVED by an already-warm reader, no restart (r12)") {
    // end-to-end freshness: a reader that already probed a slice-only
    // index must surface the daily batch's vectors as neighbors after the
    // maintenance commit lands in the SAME process
    val (sk, k) = AnnLake.buildSliceIndex(spark, sf, "graft_ann_warm")
    val np = AnnQueries.nprobeFor(k)
    def neighborIds(): Set[Long] =
      AnnLake.lakeIvfSearchForTest(spark, sf, sk, np)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
    val before = neighborIds()
    assert(before.nonEmpty && !before.exists(_ % 5 == 0),
      "slice-only index served batch vectors before the maintenance commit")
    AnnLake.appendBatch(spark, sk,
      AnnQueries.normalized(spark, sf).filter(col("vec_id") % 5 === 0))
    val after = neighborIds()
    assert(after.exists(_ % 5 == 0),
      "the warm reader did not observe the maintenance commit's vectors")
  }

  test("DELETE path: dropped vectors leave postings; untouched files unrewritten; re-delete a no-op (r12)") {
    // r11 verdict ask #5: a vector dropped by upstream dedup/curation must
    // leave the index — else probes return curated-away docs forever
    val (sk, k) = AnnLake.buildSliceIndex(spark, sf, "graft_ann_del")
    AnnLake.appendBatch(spark, sk,
      AnnQueries.normalized(spark, sf).filter(col("vec_id") % 5 === 0))
    val np = AnnQueries.nprobeFor(k)
    def neighborIds(): Set[Long] =
      AnnLake.lakeIvfSearchForTest(spark, sf, sk, np)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
    // victims: served neighbors outside the probe-id range, so the probe
    // set itself is untouched by the drop
    val victims = neighborIds().filter(_ >= 5L).take(3).toSeq
    assert(victims.size == 3, "corpus too small to pick victims")
    val vnDrop = AnnQueries.normalized(spark, sf)
      .filter(col("vec_id").isin(victims: _*)).select("vec_id", "en")
    // the victims' posting rows, reconstructed the way the delete does —
    // assignment to the fixed centroids + the deterministic salt placement
    val cents = MergeSink.read(spark, sk.centroids)
    val victimKeys = AnnQueries.assignCells(vnDrop, cents.select("cell", "ce"))
      .join(cents.select("cell", "salts"), Seq("cell"))
      .withColumn("salt", pmod(hash(col("vec_id")), col("salts")))
      .select("cell", "salt").distinct()
    val touchable = MergeSink.readOverlapping(spark, sk.cells, victimKeys,
      Seq("cell", "salt")).inputFiles.toSet
    val beforeCells = MergeSink.read(spark, sk.cells).inputFiles.toSet
    assert(touchable.size < beforeCells.size,
      "drop set overlaps every file — the pruning assertion below would be vacuous")
    AnnLake.deleteVectors(spark, sk, vnDrop)
    // 1. probes never return deleted ids
    val after = neighborIds()
    assert(victims.forall(v => !after.contains(v)),
      s"deleted ids still served: ${victims.filter(after.contains)}")
    // 2. no posting row still carries a victim, in members OR codes
    val memberIds = MergeSink.read(spark, sk.cells)
      .select(explode(col("members")).as("id")).collect().map(_.getLong(0)).toSet
    val codeIds = MergeSink.read(spark, sk.codes)
      .select(explode(col("codes")).as("c")).select(col("c.vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !memberIds.contains(v) && !codeIds.contains(v)))
    // 3. files OUTSIDE the drop's manifest hit set carried over unrewritten
    val afterCells = MergeSink.read(spark, sk.cells).inputFiles.toSet
    val untouchable = beforeCells -- touchable
    assert(untouchable.nonEmpty && untouchable.subsetOf(afterCells),
      "the delete rewrote files its key set never touched")
    // 4. replay-idempotent: a second identical delete leaves contents exact
    def snapshot() = MergeSink.read(spark, sk.cells)
      .select(col("cell"), col("salt"), col("members")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Long](2)).toMap
    val snap1 = snapshot()
    AnnLake.deleteVectors(spark, sk, vnDrop)
    assert(snapshot() == snap1, "re-delete changed posting contents")
  }

  test("delete INTENT: an interrupted delete is completed by the next ensure, never left half-applied (r13)") {
    // r12 advice: the two posting tables serve DIFFERENT probe tiers, so a
    // crash between the two prune commits left a half-deleted vector with
    // no record the second prune was owed. The intent record closes it:
    // kill the delete right after its intent commit, assert NOTHING was
    // pruned yet, then run the completion path (what deriveHandle executes
    // on every ensure) and assert both tables pruned and the intent gone.
    val (sk, k) = AnnLake.buildSliceIndex(spark, sf, "graft_ann_intent")
    AnnLake.appendBatch(spark, sk,
      AnnQueries.normalized(spark, sf).filter(col("vec_id") % 5 === 0))
    val np = AnnQueries.nprobeFor(k)
    val victims = AnnLake.lakeIvfSearchForTest(spark, sf, sk, np)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
      .filter(_ >= 5L).take(2).toSeq
    assert(victims.size == 2, "corpus too small to pick victims")
    val vnDrop = AnnQueries.normalized(spark, sf)
      .filter(col("vec_id").isin(victims: _*)).select("vec_id", "en")
    def memberIds() = MergeSink.read(spark, sk.cells)
      .select(explode(col("members")).as("id")).collect().map(_.getLong(0)).toSet
    def codeIds() = MergeSink.read(spark, sk.codes)
      .select(explode(col("codes")).as("c")).select(col("c.vec_id"))
      .collect().map(_.getLong(0)).toSet
    val boom = intercept[RuntimeException] {
      AnnLake.deleteVectors(spark, sk, vnDrop,
        afterIntent = () => throw new RuntimeException("killed mid-delete"))
    }
    assert(boom.getMessage == "killed mid-delete")
    // intent-first: the crash point precedes BOTH prunes — no half state
    assert(victims.forall(v => memberIds().contains(v) && codeIds().contains(v)),
      "prunes ran before the intent committed")
    // the completion path (deriveHandle runs this on every ensure/refresh)
    AnnLake.completeIntents(spark, sk)
    assert(victims.forall(v => !memberIds().contains(v) && !codeIds().contains(v)),
      "completion did not finish the interrupted delete")
    // intent cleared; re-completion is a no-op
    val v1 = (MergeSink.currentVersion(sk.cells), MergeSink.currentVersion(sk.codes))
    AnnLake.completeIntents(spark, sk)
    assert(v1 == (MergeSink.currentVersion(sk.cells), MergeSink.currentVersion(sk.codes)),
      "re-completion committed on an empty intent table")
  }

  test("appendPostings OCC: a commit inside the read-merge window aborts, retries, loses nothing (r12)") {
    // DETERMINISTIC lost-update reproduction (the InvertedIndexSpec shape):
    // writer A parks between its version read and its merge, writer B lands
    // an append on the SAME (cell, salt), A resumes → its pinned-version
    // merge must abort (ReadConflict) and retry — final postings carry BOTH
    // writers' members. Without the pin, A's stale union drops B's member.
    import spark.implicits._
    val (sk, _) = AnnLake.buildSliceIndex(spark, sf, "graft_ann_occ")
    val row0 = MergeSink.read(spark, sk.cells)
      .select("cell", "salt", "members").head()
    val (c, salt) = (row0.getLong(0), row0.getInt(1))
    val base = row0.getSeq[Long](2).toSet
    def freshOf(id: Long) = Seq((c, salt, Seq(id))).toDF("cell", "salt", "members")
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val readDone = new java.util.concurrent.CountDownLatch(1)
    val resume = new java.util.concurrent.CountDownLatch(1)
    @volatile var slowErr: Option[Throwable] = None
    val slow = new Thread(() => {
      try {
        AnnLake.appendPostings(spark, sk.cells, freshOf(900001L), "members",
          afterRead = () => {
            // park only the FIRST attempt; the retry runs through
            if (reads.incrementAndGet() == 1) { readDone.countDown(); resume.await() }
          })
      } catch { case t: Throwable => slowErr = Some(t) }
    })
    slow.start()
    readDone.await()
    AnnLake.appendPostings(spark, sk.cells, freshOf(900002L), "members")
    resume.countDown()
    slow.join(120000)
    assert(!slow.isAlive, "slow appender did not finish")
    assert(slowErr.isEmpty, s"slow appender failed: $slowErr")
    assert(reads.get() == 2, "the pinned-version merge must abort exactly once and retry")
    val finalMembers = MergeSink.read(spark, sk.cells)
      .filter(col("cell") === c && col("salt") === salt)
      .head().getSeq[Long](2).toSet
    assert(finalMembers == base + 900001L + 900002L,
      s"a racing append's members were lost: $finalMembers")
  }
}
