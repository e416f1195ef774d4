package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.ingest.MergeSink

/** Streaming maintenance of the lake ANN index: micro-batches of new
  * embeddings flow through the SAME appendBatch step as the daily path
  * (assign to existing centroids, encode with existing codebooks,
  * set-union postings) — so the stream-maintained index must equal the
  * batch-built incremental index TABLE-FOR-TABLE, and each micro-batch
  * must land as its own MERGE commit over only the touched cells.
  */
class AnnStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def postings(sink: String, payload: String): Map[(Long, Int), Seq[String]] =
    MergeSink.read(spark, sink)
      .select(col("cell"), col("salt"), col(payload).cast("array<string>").as("p"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[String](2)).toMap

  test("stream-maintained index equals the batch-built incremental index, table for table") {
    // the reference point: slice-built + one daily batch append
    val batchSinks = AnnLake.ensureAnnIncrLake(spark, sf).sinks
    // a fresh slice-only index for the streaming path
    val (sinks, _) = AnnLake.buildSliceIndex(spark, sf, "graft_ann_stream")
    val buildVersions = MergeSink.versions(sinks.cells).size

    // stage the SAME batch vectors (vec_id % 5 == 0) as THREE parquet
    // files — maxFilesPerTrigger=1 forces three micro-batches
    val base = java.nio.file.Files.createTempDirectory("graft-ann-stream").toString
    Tables.embeddings(spark, sf).filter(col("vec_id") % 5 === 0)
      .repartition(3)
      .write.mode("overwrite").parquet(s"$base/src")
    AnnLake.streamMaintain(spark, sinks, s"$base/src", s"$base/ckpt")

    // every posting table identical to the batch-built one
    assert(postings(sinks.cells, "members") == postings(batchSinks.cells, "members"),
      "stream-maintained member postings diverge from the daily-batch build")
    assert(postings(sinks.codes, "codes") == postings(batchSinks.codes, "codes"),
      "stream-maintained code postings diverge from the daily-batch build")
    // three micro-batches → three MERGE commits over touched cells;
    // centroids/codebooks untouched (no retrain, the incremental contract)
    assert(MergeSink.versions(sinks.cells).size == buildVersions + 3,
      "expected one MERGE commit per micro-batch")
    assert(MergeSink.versions(sinks.centroids).size == 1)
    assert(MergeSink.versions(sinks.codebook).size == 1)
  }
}
