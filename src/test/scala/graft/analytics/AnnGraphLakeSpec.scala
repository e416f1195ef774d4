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

  test("INCREMENTAL insert is EXACT: slice-built + addVectors(batch) ≡ one-shot build, table for table") {
    // the claim addVectors makes (and the reason ann_graph_incr can share
    // the one-shot walk oracle): a cell's true top-M after the batch is a
    // subset of (top-M before ∪ batch cohabitants), so the maintained
    // index is the one-shot index over the same slice-trained cells — not
    // an approximation of it. Compare every artifact's full contents.
    val h = AnnGraphLake.ensureGraphIncrLake(spark, sf)
    val sk = h.sinks
    // one-shot reference over the SAME slice-trained centroids
    val cents = MergeSink.read(spark, sk.centroids).select("cell", "ce")
    val vn = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .selectExpr("vec_id", "e", "graft_dot(e, e) AS nrm")
      .selectExpr("vec_id", "e", "nrm",
        "transform(e, x -> x / sqrt(nrm)) AS en")
    val assigned = AnnQueries.assignCells(
      vn.select("vec_id", "en"), cents).localCheckpoint(true)
    val mem = assigned.join(vn, Seq("vec_id"))
    val refEdges = mem.as("a")
      .join(mem.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        (graft.functions.Vec.dot(col("a.e"), col("b.e")) /
          (sqrt(col("a.nrm")) * sqrt(col("b.nrm")))).as("cosine"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(col("cosine").desc, col("dst"))))
      .filter(col("rn") <= AnnQueries.GraphM).select("src", "dst")
      .localCheckpoint(true)
    // emptied posting rows STAY as empty-array rows (the E125 convention
    // every posting table here follows) while a one-shot build never
    // writes them — compare semantic content, not row presence
    def edgeMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
        .filter(_._2.nonEmpty).toMap
    val gotEdges = edgeMap(MergeSink.read(spark, sk.edges).select("src", "dsts"))
    val refFwd = refEdges.groupBy("src")
      .agg(sort_array(collect_list(col("dst"))).as("dsts"))
    assert(gotEdges == edgeMap(refFwd), "forward adjacency diverged from one-shot")
    val gotRev = edgeMap(MergeSink.read(spark, sk.redges).select("dst", "srcs"))
    val refRev = refEdges.groupBy("dst")
      .agg(sort_array(collect_list(col("src"))).as("srcs"))
    assert(gotRev == edgeMap(refRev), "reverse adjacency diverged from one-shot")
    val gotMem = edgeMap(MergeSink.read(spark, sk.members).select("cell", "members"))
    val refMem = assigned.groupBy("cell")
      .agg(sort_array(collect_list(col("vec_id"))).as("members"))
    assert(gotMem == edgeMap(refMem), "membership diverged from one-shot")
    val gotMed = MergeSink.read(spark, sk.medoids).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // one-shot reference: medoid (dot-to-centroid argmax) + its antipode
    // (dot-to-medoid argmin), sorted distinct — the r14 entry scheme
    val refScored = mem.join(broadcast(cents), Seq("cell"))
      .select(col("cell"), col("vec_id"), col("en"),
        graft.functions.Vec.dot(col("en"), col("ce")).as("score"))
    val refMedRow = refScored
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cell")
          .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rn") === 1)
      .select(col("cell"), col("vec_id").as("med_id"), col("en").as("med_en"))
    val refAnti = refScored
      .join(broadcast(refMedRow.select("cell", "med_en")), Seq("cell"))
      .select(col("cell"), col("vec_id"),
        graft.functions.Vec.dot(col("en"), col("med_en")).as("adot"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cell")
          .orderBy(col("adot").asc, col("vec_id"))))
      .filter(col("rn") === 1)
      .select(col("cell"), col("vec_id").as("entry"))
    val refMed = refMedRow.select(col("cell"), col("med_id").as("entry"))
      .unionByName(refAnti)
      .groupBy("cell")
      .agg(sort_array(array_distinct(collect_list(col("entry")))).as("entries"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(gotMed == refMed, "medoid entry arrays diverged from one-shot")
    // and a REPLAYED batch changes nothing (the appendBatch standard)
    AnnGraphLake.addVectors(spark, sk,
      graft.Tables.embeddings(spark, sf).filter(col("vec_id") % 5 === 0))
    assert(edgeMap(MergeSink.read(spark, sk.edges).select("src", "dsts")) == gotEdges
      && edgeMap(MergeSink.read(spark, sk.redges).select("dst", "srcs")) == gotRev,
      "a re-delivered batch changed the adjacency tables")
  }

  test("STREAM-maintained graph index converges to the daily-batch result (shuffled multi-file arrival)") {
    // order-independence is a COROLLARY of insert exactness (each micro-
    // batch leaves the one-shot index over the union so far), so a
    // shuffled multi-file drain must land on byte-identical table
    // contents vs the single-batch incr tier over the same slice cells
    val sk = AnnGraphLake.buildSliceGraph(spark, sf, "graft_agl_stream")
    val src = java.nio.file.Files.createTempDirectory("graft_agl_src").toString
    val ckp = java.nio.file.Files.createTempDirectory("graft_agl_ckp").toString
    val batch = graft.Tables.embeddings(spark, sf).filter(col("vec_id") % 5 === 0)
    // three files staged OUT of id order — the stream drains them one per
    // trigger in staging order
    for (g <- Seq(2, 0, 1))
      batch.filter(pmod(col("vec_id"), lit(3)) === g)
        .coalesce(1).write.mode("append").parquet(src)
    AnnGraphLake.streamMaintain(spark, sk, src, ckp)
    val ih = AnnGraphLake.ensureGraphIncrLake(spark, sf)
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
        .filter(_._2.nonEmpty).toMap
    assert(m(MergeSink.read(spark, sk.edges).select("src", "dsts"))
      == m(MergeSink.read(spark, ih.sinks.edges).select("src", "dsts")),
      "streamed forward adjacency diverged from the daily-batch result")
    assert(m(MergeSink.read(spark, sk.redges).select("dst", "srcs"))
      == m(MergeSink.read(spark, ih.sinks.redges).select("dst", "srcs")),
      "streamed reverse adjacency diverged from the daily-batch result")
    assert(m(MergeSink.read(spark, sk.members).select("cell", "members"))
      == m(MergeSink.read(spark, ih.sinks.members).select("cell", "members")))
    assert(MergeSink.read(spark, sk.medoids).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      == MergeSink.read(spark, ih.sinks.medoids).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
  }

  test("occupancy guard: a hot cell past the threshold fails LOUDLY with the named fix") {
    import spark.implicits._
    // salting bounds posting-row SIZE, but nothing caps the within-cell
    // PAIR work a graph build pays on a hot cell — the guard refuses
    // instead of silently going quadratic (the r9 lesson), and its
    // message names the mitigation
    val hot = Seq.tabulate(6)(i => (i.toLong, 0L)).toDF("vec_id", "cell")
    val ex = intercept[IllegalArgumentException] {
      AnnQueries.requireBoundedOccupancy(hot, "spec-degenerate", cap = 4L)
    }
    assert(ex.getMessage.contains("dd_semdedup") &&
      ex.getMessage.contains("spec-degenerate"))
    AnnQueries.requireBoundedOccupancy(hot.limit(3), "spec-ok", cap = 4L)
  }

  test("insert killed between the redges and edges commits REPLAYS to the one-shot pair (r13 advice)") {
    // the diff feeding the reverse-posting delta is computed against the
    // STORED forward rows, so the reverse table must commit first: killed
    // here, a replay re-reads the intact forward rows, recomputes the
    // identical diff, and both merges are content-idempotent. (Edges-first
    // — the pre-fix order — a replay's diff came back empty, the missing
    // reverse entries never healed, and a later delete of such a dst left
    // a surviving dsts array pointing at the victim.)
    val sk = AnnGraphLake.buildSliceGraph(spark, sf, "graft_agl_crash")
    val batch = graft.Tables.embeddings(spark, sf).filter(col("vec_id") % 5 === 0)
    intercept[RuntimeException] {
      AnnGraphLake.addVectors(spark, sk, batch,
        afterRedges = () => throw new RuntimeException("killed mid-insert"))
    }
    AnnGraphLake.addVectors(spark, sk, batch) // the checkpoint replay
    val ih = AnnGraphLake.ensureGraphIncrLake(spark, sf)
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
        .filter(_._2.nonEmpty).toMap
    assert(m(MergeSink.read(spark, sk.edges).select("src", "dsts"))
      == m(MergeSink.read(spark, ih.sinks.edges).select("src", "dsts")),
      "replayed forward adjacency diverged from the uninterrupted result")
    assert(m(MergeSink.read(spark, sk.redges).select("dst", "srcs"))
      == m(MergeSink.read(spark, ih.sinks.redges).select("dst", "srcs")),
      "replayed reverse adjacency diverged — the crash-point edges never healed")
  }

  /** PRIVATE corpus copy for the destructive tests (the PurgeSpec
    * convention): the shared per-dir lake of the oracle query must stay
    * pristine.
    */
  private lazy val delDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_agl_del").toFile
    d.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/embeddings.parquet"),
      java.nio.file.Paths.get(d.getAbsolutePath, "embeddings.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    d.getAbsolutePath
  }

  test("vector DELETE reaches every graph artifact; a dropped MEDOID's cell repairs its entry; re-delete and crash-retry converge") {
    import spark.implicits._
    val h = AnnGraphLake.ensureGraphLake(spark, delDir)
    val sk = h.sinks
    def medoids(): Map[Long, Seq[Long]] = MergeSink.read(spark, sk.medoids)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def members(): Map[Long, Seq[Long]] = MergeSink.read(spark, sk.members)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // victims: one of a cell's ENTRY POINTS (forces the medoid repair)
    // plus a non-entry member of the same cell; pick a cell with spare
    // members so the repair has survivors to choose from
    val (cell, entries) = medoids()
      .find { case (c, es) => members()(c).size > es.size + 1 }.get
    val entry = entries.head
    val other = members()(cell).filterNot(entries.contains).head
    val victims = Seq(entry, other)

    AnnGraphLake.deleteVectors(spark, h, victims.toDF("vec_id"))

    // 1. vectors rows gone; own adjacency rows (forward + reverse) gone
    assert(MergeSink.read(spark, sk.vectors)
      .filter(col("vec_id").isin(victims: _*)).count() == 0)
    assert(MergeSink.read(spark, sk.edges)
      .filter(col("src").isin(victims: _*)).count() == 0)
    assert(MergeSink.read(spark, sk.redges)
      .filter(col("dst").isin(victims: _*)).count() == 0)
    // 2. no surviving adjacency array points at a victim, either direction
    def dstsFlat() = MergeSink.read(spark, sk.edges)
      .select(explode(col("dsts")).as("id")).collect().map(_.getLong(0)).toSet
    val srcsFlat = MergeSink.read(spark, sk.redges)
      .select(explode(col("srcs")).as("id")).collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !dstsFlat().contains(v) && !srcsFlat.contains(v)))
    // 3. membership pruned; entry ARRAY repaired to the top over survivors
    assert(victims.forall(v => !members()(cell).contains(v)))
    val newEntries = medoids()(cell)
    assert(!newEntries.contains(entry)
        && newEntries.forall(members()(cell).contains),
      s"medoids of cell $cell not repaired to surviving members")
    // 4. the walk never returns a victim
    val got = AnnGraphLake.graphBeamLake(spark, delDir)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !got.contains(v)))
    // 5. re-delete: content no-op on every artifact
    val snap = (medoids(), members(), dstsFlat())
    AnnGraphLake.deleteVectors(spark, h, victims.toDF("vec_id"))
    assert((medoids(), members(), dstsFlat()) == snap)
    // 6. crash AFTER the intent commit, BEFORE any prune: the next ensure
    // completes the pending delete (deriveHandle's completeIntents hook)
    val third = members()(cell).filterNot(newEntries.contains).head
    intercept[RuntimeException] {
      AnnGraphLake.deleteVectors(spark, h, Seq(third).toDF("vec_id"),
        afterIntent = () => throw new RuntimeException("killed mid-delete"))
    }
    assert(MergeSink.read(spark, sk.vectors)
      .filter(col("vec_id") === third).count() == 1,
      "the killed delete must not have pruned anything yet")
    AnnGraphLake.ensureGraphLake(spark, delDir) // version advance → refresh
    assert(MergeSink.read(spark, sk.vectors)
      .filter(col("vec_id") === third).count() == 0,
      "the next ensure must complete the pending intent")
    assert(!dstsFlat().contains(third) && !members()(cell).contains(third))
  }

  test("an intent-only crash on a FRESH index still invalidates the memo (r13 advice)") {
    // the hardest case for the version memo: NO prior delete has advanced
    // any of the six index tables, so only the intent table's own commit
    // can signal staleness — it must be in the memo's watched set, or the
    // cached handle is served and completeIntents never runs this session
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_agl_fresh").toFile
    d.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/embeddings.parquet"),
      java.nio.file.Paths.get(d.getAbsolutePath, "embeddings.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val h = AnnGraphLake.ensureGraphLake(spark, d.getAbsolutePath)
    val victim = MergeSink.read(spark, h.sinks.vectors)
      .select("vec_id").orderBy("vec_id").limit(1)
      .collect().head.getLong(0)
    intercept[RuntimeException] {
      AnnGraphLake.deleteVectors(spark, h, Seq(victim).toDF("vec_id"),
        afterIntent = () => throw new RuntimeException("killed mid-delete"))
    }
    assert(MergeSink.read(spark, h.sinks.vectors)
      .filter(col("vec_id") === victim).count() == 1,
      "the killed delete must not have pruned anything yet")
    AnnGraphLake.ensureGraphLake(spark, d.getAbsolutePath)
    assert(MergeSink.read(spark, h.sinks.vectors)
      .filter(col("vec_id") === victim).count() == 0,
      "intent-only commit did not trigger the memo refresh that completes it")
  }
}
