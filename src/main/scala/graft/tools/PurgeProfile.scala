package graft.tools

import org.apache.spark.sql.functions._
import graft.analytics.{AnnGraphLake, AnnLake, CurateQueries, DedupQueries,
  InvertedIndex, Purge}
import graft.ingest.MergeSink

/** Dev-only: measure a document PURGE against EVERY maintained index
  * family — the evidence tool for the claim that a purge costs
  * O(touched files) per sink, never O(table): per sink it reports how
  * many files the purge REWROTE (copy-on-write) vs carried over, from
  * the manifest diff between the pre- and post-purge versions. Since
  * r13 the purge runs through `Purge.purgeDocuments` (E138), so the
  * profile exercises the one-call orchestrator end-to-end: dedup +
  * curation lake tables, the inverted text index, the IVF+PQ ANN lake
  * and the graph-ANN lake all absorb the same drop batch.
  * Construction (the ensure and build steps) is timed separately, like
  * Bench's prestage. Usage:
  *   runMain graft.tools.PurgeProfile <sfDir> [nDocs]
  */
object PurgeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 10
    val spark = graft.Sessions.local(appName = "graft-purgeprofile")
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val iiPath =
      s"${java.nio.file.Files.createTempDirectory("graft_purge_ii")}/sink"
    InvertedIndex.build(spark, iiPath,
      graft.Tables.documents(spark, dir).select("doc_id", "text"))
    val annH = AnnLake.ensureAnnLake(spark, dir)
    val graphH = AnnGraphLake.ensureGraphLake(spark, dir)
    val sinks = Seq(
      "bands" -> DedupQueries.ensureBandSink(spark, dir),
      "shingles" -> DedupQueries.ensureShingleSink(spark, dir),
      "spans" -> DedupQueries.ensureSpanSink(spark, dir),
      "substr" -> DedupQueries.ensureSubstrSink(spark, dir),
      "fps" -> CurateQueries.ensureFpSink(spark, dir)) ++ {
      val (byDoc, byComp) = DedupQueries.ensureLabelSinks(spark, dir)
      Seq("labels_by_doc" -> byDoc, "labels_by_comp" -> byComp)
    } ++ Seq(
      "inv_index" -> iiPath,
      "ann_cells" -> annH.sinks.cells,
      "ann_codes" -> annH.sinks.codes,
      "graph_edges" -> graphH.sinks.edges,
      "graph_redges" -> graphH.sinks.redges,
      "graph_members" -> graphH.sinks.members,
      "graph_medoids" -> graphH.sinks.medoids,
      "graph_vectors" -> graphH.sinks.vectors)
    DedupQueries.ensureTombSink(spark, dir)
    println(f"== sinks built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val pre = sinks.map { case (nm, p) =>
      nm -> MergeSink.currentVersion(p).getOrElse(0L)
    }.toMap
    // deterministic corpus-side drop set
    val ids = graft.Tables.documents(spark, dir).select("doc_id")
      .filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 37 === 1)
      .orderBy("doc_id").limit(n)
    val t1 = System.nanoTime()
    Purge.purgeDocuments(spark, dir, ids,
      annIndex = Some(annH), graphIndex = Some(graphH),
      invertedIndex = Some(iiPath))
    println(f"== purge of $n docs (ALL tiers): ${(System.nanoTime() - t1) / 1e9}%.2f s")
    for ((nm, p) <- sinks) {
      val v1 = MergeSink.currentVersion(p).getOrElse(0L)
      val total = MergeSink.read(spark, p).inputFiles.length
      if (v1 == pre(nm))
        println(f"== $nm%-14s untouched ($total%d files)")
      else {
        val (added, removed) = MergeSink.fileDiff(p, pre(nm), v1)
        println(f"== $nm%-14s v${pre(nm)}%d->v$v1%d rewrote=${removed.size}%d " +
          f"added=${added.size}%d totalFiles=$total%d")
      }
    }
    spark.stop()
  }
}
