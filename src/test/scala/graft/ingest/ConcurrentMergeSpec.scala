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

  test("expectedVersion pin: a stale read aborts before commit; a current read commits") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_occ").toFile
    val sink = s"${base.getPath}/sink"
    try {
      MergeSink.merge(spark, sink, Seq((1L, "a")).toDF("k", "v"), Seq("k"), Seq(col("k")))
      MergeSink.merge(spark, sink, Seq((2L, "b")).toDF("k", "v"), Seq("k"), Seq(col("k")))
      // read-modify-write derived from v1, but the table is at v2: the
      // merge must ABORT (read-set conflict), committing nothing
      intercept[MergeSink.ReadConflictException] {
        MergeSink.merge(spark, sink, Seq((1L, "stale")).toDF("k", "v"),
          Seq("k"), Seq(col("k")), expectedVersion = Some(1L))
      }
      assert(MergeSink.versions(sink) === Seq(1L, 2L), "aborted merge committed")
      assert(MergeSink.read(spark, sink).where(col("v") === "stale").count() === 0)
      // pinned to the CURRENT version: commits normally
      val r = MergeSink.merge(spark, sink, Seq((1L, "fresh")).toDF("k", "v"),
        Seq("k"), Seq(col("k")), expectedVersion = Some(2L))
      assert(r.version === 3L)
      assert(MergeSink.read(spark, sink).where(col("v") === "fresh").count() === 1)
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).toSeq.flatten.foreach(rm)
        x.delete(); ()
      }
      rm(base)
    }
  }
}
