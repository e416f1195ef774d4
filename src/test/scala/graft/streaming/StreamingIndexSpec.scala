package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.analytics.InvertedIndex
import graft.ingest.MergeSink

/** Streaming index maintenance (E49 under §2.11): a document stream kept
  * searchable by running InvertedIndex.addDocs per micro-batch — each
  * batch pays O(its vocabulary) in pruned reads and one MERGE commit.
  * The final index must equal a full rebuild over everything streamed,
  * and re-running the whole stream must leave the index content
  * unchanged (addDocs unions doc ids — replay-idempotent).
  */
class StreamingIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("per-micro-batch addDocs equals full rebuild; replay is content-idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft_stridx").toFile
    val src = s"${base.getPath}/src"
    val idx = s"${base.getPath}/idx"
    val ckp = s"${base.getPath}/ckp"
    try {
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
      docs.repartition(4).write.parquet(src) // 4 files → 4 micro-batches

      InvertedIndex.build(spark, idx, docs.limit(0)) // seed the empty table

      def drain(checkpoint: String): Unit = {
        val q = spark.readStream
          .schema(docs.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(src)
          .writeStream
          .option("checkpointLocation", checkpoint)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, _: Long) =>
            InvertedIndex.addDocs(spark, idx, batch)
          }
          .start()
        q.awaitTermination(120000)
        ()
      }
      drain(ckp)
      // multiple incremental commits actually happened (seed + ≥2 batches)
      assert(MergeSink.versions(idx).size >= 3)

      def content(): Set[(String, String)] =
        MergeSink.read(spark, idx)
          .select(col("term"), col("postings").cast("string"))
          .collect().map(r => (r.getString(0), r.getString(1))).toSet

      val streamed = content()
      val rebuilt = s"${base.getPath}/rebuilt"
      InvertedIndex.build(spark, rebuilt, docs)
      val full = MergeSink.read(spark, rebuilt)
        .select(col("term"), col("postings").cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(streamed === full, "streamed index diverges from full rebuild")

      // replay the entire stream from a FRESH checkpoint: every batch is
      // re-applied, and the index content must not change
      drain(s"${base.getPath}/ckp2")
      assert(content() === full, "replay changed the index content")
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).toSeq.flatten.foreach(rm)
        x.delete(); ()
      }
      rm(base)
    }
  }
}
