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
    val sinks = AnnLake.ensureAnnLake(spark, sf)
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
    val sinks = AnnLake.ensureAnnLake(spark, sf)
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
    val (sinks, k) = AnnLake.ensureAnnIncrLake(spark, sf)
    // the centroid table is slice-trained: exactly k cells, never touched
    // by the batch merge (versions stay at the build commit)
    assert(MergeSink.read(spark, sinks.centroids).count() == k)
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
    val (sinks, _) = AnnLake.ensureAnnIncrLake(spark, sf)
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
}
