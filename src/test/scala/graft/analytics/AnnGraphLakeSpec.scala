package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ingest.MergeSink

/** The lake-persisted graph-ANN tier (E137's 100-TB read path): the walk
  * over the MergeSink tables must (1) return EXACTLY the in-plan walk's
  * results — the storage round trip invisible, the ann_ivf_lake standard —
  * and (2) actually fetch its per-round working sets from a manifest-
  * pruned FILE SUBSET of the posting tables, never the table: that is the
  * property the tier exists for (the in-plan walk re-scans the corpus
  * once per scoring round).
  */
class AnnGraphLakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // sf0.01: 500 vectors / 8 trained cells — probes route to 3 of 8 cells,
  // so the walk's candidate set covers a strict MINORITY of the corpus
  // and the pruning assertions are non-vacuous (at sf0.001 the single
  // trained cell makes every subset claim trivial)
  private val sf = "/root/testdata/sf0.01"

  test("lake walk ≡ in-plan walk (the storage round trip is invisible to results)") {
    val live = AnnGraphLake.graphBeamLake(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val plan = AnnQueries.graphBeamParts(spark, sf)._2.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(live == plan, "lake-tier walk diverged from the in-plan walk")
  }

  test("a round-sized key fetch reads a strict file subset of the posting tables") {
    val h = AnnGraphLake.ensureGraphLake(spark, sf)
    val sk = h.sinks
    // the UNIT the walk actually fetches per round: one beam's worth of
    // keys (ef = 8 ids). The WHOLE walk's visited union (~190 of 500 ids)
    // saturates a 16-file toy table — xxhash64 digests spread ~12 ids per
    // file bucket, the substr-purge file-granularity note — but no single
    // round ever fetches that union at once; production tables hold
    // thousands of files where even the union prunes.
    val beamSized = AnnQueries.graphBeamParts(spark, sf)._1
      .select(col("nid").as("vec_id")).distinct().orderBy("vec_id")
      .limit(AnnQueries.BeamEf)
    val vecAll = MergeSink.read(spark, sk.vectors).inputFiles.toSet
    val vecHit = MergeSink.readOverlapping(spark, sk.vectors,
      beamSized, Seq("vec_id")).inputFiles.toSet
    assert(vecHit.nonEmpty && vecHit.subsetOf(vecAll) && vecHit.size < vecAll.size,
      s"vector fetch opened ${vecHit.size}/${vecAll.size} files — pruning vacuous")
    val edgeAll = MergeSink.read(spark, sk.edges).inputFiles.toSet
    val edgeHit = MergeSink.readOverlapping(spark, sk.edges,
      beamSized.select(col("vec_id").as("src")), Seq("src")).inputFiles.toSet
    assert(edgeHit.nonEmpty && edgeHit.subsetOf(edgeAll) && edgeHit.size < edgeAll.size,
      s"edge fetch opened ${edgeHit.size}/${edgeAll.size} files — pruning vacuous")
    // adjacency rows honor the out-degree cap after the round trip
    val deg = MergeSink.read(spark, sk.edges)
      .select(size(col("dsts")).as("d")).collect().map(_.getInt(0))
    assert(deg.forall(_ <= AnnQueries.GraphM))
  }
}
