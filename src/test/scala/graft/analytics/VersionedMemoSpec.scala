package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ingest.MergeSink

/** The version-keyed ensure-memo contract (r12): every access revalidates
  * the sink tables' commit versions; a commit landing after warm-up is
  * detected and the memo re-pinned — for path-only values the value stands
  * (live reads already serve the new commit), for derived values AnnLakeSpec
  * pins the re-derivation. Build-once semantics must survive revalidation:
  * the build closure runs exactly once per dir.
  */
class VersionedMemoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("paths memo: builds once, re-pins seen versions when an external commit lands") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_vmemo").toFile
    val sink = s"${base.getPath}/sink"
    try {
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      val memo = VersionedMemo.paths[String](Seq(_))
      def ensure(): String = memo.get(spark, "d") {
        builds.incrementAndGet()
        MergeSink.merge(spark, sink, Seq((1L, "a")).toDF("k", "v"),
          Seq("k"), Seq(col("k")))
        sink
      }
      assert(ensure() == sink && builds.get() == 1)
      val seen0 = memo.seen("d").get
      assert(seen0(sink) == MergeSink.versions(sink).last)
      // warm re-access with no commit: value served, no rebuild, pin stable
      assert(ensure() == sink && builds.get() == 1)
      assert(memo.seen("d").get == seen0)
      // an EXTERNAL maintenance commit lands (another writer's merge)
      MergeSink.merge(spark, sink, Seq((2L, "b")).toDF("k", "v"),
        Seq("k"), Seq(col("k")))
      assert(MergeSink.versions(sink).last > seen0(sink))
      // the next access detects it and re-pins — still no rebuild
      assert(ensure() == sink && builds.get() == 1)
      assert(memo.seen("d").get(sink) == MergeSink.versions(sink).last)
    } finally Staging.rmRf(base)
  }
}
