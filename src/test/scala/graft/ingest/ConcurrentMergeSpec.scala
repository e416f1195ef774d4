package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Writer-writer concurrency for the MergeSink commit protocol: the
  * manifest CAS must serialize racing commits into sequential versions
  * with NO lost updates. Before the fix, commit was a POSIX rename —
  * which silently overwrites an existing destination, so two racing
  * writers could both "succeed" with one commit's rows vanishing.
  */
class ConcurrentMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("racing merges all land; versions are sequential; no lost updates") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cmerge").toFile
    val sink = s"${base.getPath}/sink"
    try {
      // base commit so every racer starts from the same v1
      Seq((0L, "base")).toDF("k", "src")
        .write.format("noop").mode("overwrite").save() // warm codegen paths
      MergeSink.merge(spark, sink,
        (0L until 50L).map(k => (k, "base")).toDF("k", "src"),
        Seq("k"), Seq(col("k")))

      val writers = 4
      val rowsEach = 30
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = (1 to writers).map { w =>
        scala.concurrent.Future {
          // disjoint key ranges: every racer's rows must all survive
          val batch = (0 until rowsEach)
            .map(i => (1000L * w + i, s"writer$w")).toDF("k", "src")
          MergeSink.merge(spark, sink, batch, Seq("k"), Seq(col("k"))).version
        }
      }
      val versions = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(300, "s"))
      pool.shutdown()

      // every commit won a distinct, sequential version
      assert(versions.toSet.size === writers, s"duplicate versions: $versions")
      assert(MergeSink.versions(sink) === (1L to (writers + 1L)),
        "versions are not sequential")

      // no lost updates: all racers' rows AND the base rows are present
      val fin = MergeSink.read(spark, sink)
      assert(fin.count() === 50L + writers * rowsEach)
      (1 to writers).foreach { w =>
        assert(fin.filter(col("src") === s"writer$w").count() === rowsEach.toLong,
          s"writer$w lost rows")
      }
      assert(fin.filter(col("src") === "base").count() === 50L)
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).toSeq.flatten.foreach(rm)
        x.delete(); ()
      }
      rm(base)
    }
  }
}
