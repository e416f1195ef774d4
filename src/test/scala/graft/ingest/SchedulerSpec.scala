package graft.ingest

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.schema.Schemas

/** The scheduler must be a safe trigger over the idempotent engine: a
  * tick ingests, an immediate re-tick inserts nothing (watermarks + dedup
  * sinks absorb the refire), catchup-after-general is likewise a no-op,
  * and the threaded cadence drives the same tick path.
  */
class SchedulerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val t0 = Timestamp.valueOf("2025-06-01 00:00:00")

  private def fixturesDir: String =
    new java.io.File(getClass.getResource("/fixtures").toURI).getAbsolutePath

  private def writeUsers(path: String): Unit = {
    val n10 = Seq.fill(10)(null)
    val rows = Seq(
      Row(Seq(1, "Acme", "acme.com", "acmegram", "acmeco", "acme-ltd",
        "https://maps.google.com/?cid=123", "acmefb", "acme-inc") ++ n10: _*))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), Schemas.users)
    Watermarks.overwriteParquet(spark, path, df)
  }

  test("tick ingests; re-tick and catchup-after-general are no-ops") {
    val root = Files.createTempDirectory("graft-sched").toString
    val users = s"$root/users"; writeUsers(users)
    val sched = new Scheduler(spark, users, s"$root/wh", fixturesDir, () => t0)

    val first = sched.tick(Catchup())
    assert(first.failures.isEmpty, first.failures.mkString("; "))
    assert(first.inserted > 0, "bootstrap tick must ingest the fixture rows")

    // the refire: same clock, advanced watermarks, idempotent sinks
    val again = sched.tick(Catchup())
    assert(again.failures.isEmpty && again.inserted == 0,
      s"refired tick must insert nothing, got ${again.inserted}")

    // a general tick right after: everything fresh within staleness → no-op
    val general = sched.tick(General())
    assert(general.failures.isEmpty && general.inserted == 0,
      s"fresh-watermark general tick must insert nothing, got ${general.inserted}")

    assert(sched.history.map(_.mode) == Seq("catchup", "catchup", "general"))
  }

  test("started cadence fires ticks on the shared path and stops cleanly") {
    val root = Files.createTempDirectory("graft-sched-threads").toString
    val users = s"$root/users"; writeUsers(users)
    val sched = new Scheduler(spark, users, s"$root/wh", fixturesDir, () => t0)
    try {
      sched.start(generalEveryMs = 60000L, catchupEveryMs = 60000L)
      assert(sched.awaitFirstTick(120000L), "no tick fired within the window")
      val h = sched.history
      assert(h.nonEmpty && h.head.mode == "general")
      assert(h.head.failures.isEmpty, h.head.failures.mkString("; "))
    } finally sched.stop()
    val after = sched.history.size
    Thread.sleep(200L)
    assert(sched.history.size == after, "ticks fired after stop()")
  }
}
