package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The centralized memo-and-persist contract (r8 advice): an entry keyed
  * only by (session, dir) kept serving STALE data after the files under
  * `dir` were rewritten (the planted-corpus test pattern), and evicted
  * entries leaked their executor cache. PlanCache must rebuild on content
  * change and serve the memo otherwise.
  */
class PlanCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeCorpus(dir: String, values: Seq[Long]): Unit = {
    import spark.implicits._
    values.toDF("v").coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet")
  }

  test("memo hit on unchanged files; rebuild when the directory content changes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plancache").toString
    writeCorpus(dir, Seq(1L, 2L, 3L))
    var builds = 0
    def table() = PlanCache.cached(spark, dir, "spec") {
      builds += 1
      spark.read.parquet(s"$dir/t.parquet")
    }
    assert(table().count() == 3 && builds == 1)
    assert(table().count() == 3 && builds == 1, "unchanged dir must memo-hit")
    // rewrite the corpus in place — the planted-corpus pattern
    writeCorpus(dir, Seq(1L, 2L, 3L, 4L, 5L))
    assert(table().count() == 5, "stale cache served after rewrite")
    assert(builds == 2, "content change must rebuild exactly once")
    assert(table().count() == 5 && builds == 2)
  }

  test("invalidate drops every entry under the dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plancache2").toString
    writeCorpus(dir, Seq(7L))
    var builds = 0
    def table() = PlanCache.cached(spark, dir, "spec2") {
      builds += 1
      spark.read.parquet(s"$dir/t.parquet")
    }
    assert(table().count() == 1 && builds == 1)
    PlanCache.invalidate(dir)
    assert(table().count() == 1 && builds == 2, "invalidate must force a rebuild")
  }
}
