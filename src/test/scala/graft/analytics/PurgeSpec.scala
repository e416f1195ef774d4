package graft.analytics

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ingest.MergeSink

/** The ONE-CALL purge orchestrator (E138): a purged document must become
  * unreachable from EVERY maintained index tier — dedup lake, curation
  * fingerprints, cluster tables, the inverted text index and the ANN
  * lake's posting tables — through a single `Purge.purgeDocuments` call,
  * and a re-delivered purge must be a VERSION-level no-op across all of
  * them (not merely content-idempotent per tier). Runs on a PRIVATE copy
  * of the sf0.001 corpus so the shared per-dir sinks of the oracle
  * queries stay pristine (the DedupLakeDeleteSpec convention).
  */
class PurgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_purge").toFile
    d.deleteOnExit()
    for (t <- Seq("documents", "embeddings"))
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        Paths.get(d.getAbsolutePath, s"$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    d.getAbsolutePath
  }

  test("one purge call reaches every tier; re-delivery is a version-level no-op everywhere") {
    import spark.implicits._
    // maintained deployment state: an inverted index over the corpus docs
    // and a full-trained lake ANN index (private sinks, this corpus copy)
    val idx = s"${Files.createTempDirectory("graft_purge_ii")}/sink"
    InvertedIndex.build(spark, idx,
      graft.Tables.documents(spark, dir).select("doc_id", "text"))
    val sk = AnnLake.buildFullIndex(spark, dir, "graft_purge_ann",
      AnnLake.DefaultSaltTarget)
    val handle = AnnLake.IndexHandle(sk,
      MergeSink.read(spark, sk.centroids).count())
    val gh = AnnGraphLake.ensureGraphLake(spark, dir)
    // dedup tier sinks warm through their normal ensure paths
    val bandSink = DedupQueries.ensureBandSink(spark, dir)
    val shingleSink = DedupQueries.ensureShingleSink(spark, dir)

    // victims: corpus-side docs (the window tables count only those) that
    // are currently posted in the ANN members and the inverted index
    val victims = Seq(7L, 13L)
    def annMembers(): Set[Long] = MergeSink.read(spark, sk.cells)
      .select(explode(col("members")).as("id")).collect().map(_.getLong(0)).toSet
    def iiPosted(): Set[Long] = MergeSink.read(spark, idx)
      .select(explode(col("postings")).as("id")).collect().map(_.getLong(0)).toSet
    def graphVecs(): Set[Long] = MergeSink.read(spark, gh.sinks.vectors)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(victims.forall(annMembers().contains), "victims must start indexed (ANN)")
    assert(victims.forall(iiPosted().contains), "victims must start indexed (II)")
    assert(victims.forall(graphVecs().contains), "victims must start indexed (graph)")

    Purge.purgeDocuments(spark, dir, victims.toDF("doc_id"),
      annIndex = Some(handle), graphIndex = Some(gh), invertedIndex = Some(idx))

    // 1. the inverted index no longer retrieves the victims
    assert(victims.forall(v => !iiPosted().contains(v)),
      "purged docs still retrievable from the inverted index")
    // 2. the ANN posting tables no longer carry the victims' vectors
    assert(victims.forall(v => !annMembers().contains(v)),
      "purged vectors still in the ANN member postings")
    val codedIds = MergeSink.read(spark, sk.codes)
      .select(explode(col("codes")).as("c")).select(col("c.vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !codedIds.contains(v)),
      "purged vectors still in the ANN code postings")
    // 2b. the GRAPH index: vectors gone and no adjacency array points back
    assert(victims.forall(v => !graphVecs().contains(v)),
      "purged vectors still in the graph index")
    val graphDsts = MergeSink.read(spark, gh.sinks.edges)
      .select(explode(col("dsts")).as("id")).collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !graphDsts.contains(v)),
      "surviving adjacency rows still point at purged vectors")
    // 3. the dedup tier absorbed the same batch (tombstoned + rows gone)
    assert(MergeSink.read(spark, DedupQueries.ensureTombSink(spark, dir))
      .collect().map(_.getLong(0)).toSet == victims.toSet)
    assert(MergeSink.read(spark, shingleSink)
      .filter(col("doc_id").isin(victims: _*)).count() == 0)
    val postedBands = MergeSink.read(spark, bandSink)
      .select(explode(col("doc_ids")).as("id")).collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !postedBands.contains(v)))

    // 4. re-delivery: the tombstone filter short-circuits BEFORE any tier
    // is touched — every sink's commit version must be exactly unchanged
    val watched = Seq(idx, sk.cells, sk.codes, sk.centroids,
      gh.sinks.edges, gh.sinks.redges, gh.sinks.members, gh.sinks.medoids,
      gh.sinks.vectors, bandSink,
      shingleSink, DedupQueries.ensureSpanSink(spark, dir),
      DedupQueries.ensureSubstrSink(spark, dir),
      CurateQueries.ensureFpSink(spark, dir))
    def versions(): Seq[Option[Long]] = watched.map(MergeSink.currentVersion)
    val v1 = versions()
    Purge.purgeDocuments(spark, dir, victims.toDF("doc_id"),
      annIndex = Some(handle), graphIndex = Some(gh), invertedIndex = Some(idx))
    assert(versions() == v1,
      "a re-delivered purge committed to some tier (should be a version-level no-op)")

    // 5. a MIXED batch (one already purged, one new) purges only the new id
    val extra = 19L
    Purge.purgeDocuments(spark, dir, Seq(victims.head, extra).toDF("doc_id"),
      annIndex = Some(handle), graphIndex = Some(gh), invertedIndex = Some(idx))
    assert(!annMembers().contains(extra) && !iiPosted().contains(extra)
      && !graphVecs().contains(extra))
    assert(MergeSink.read(spark, DedupQueries.ensureTombSink(spark, dir))
      .collect().map(_.getLong(0)).toSet == victims.toSet + extra)
  }
}
