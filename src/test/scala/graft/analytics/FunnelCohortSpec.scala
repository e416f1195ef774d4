package graft.analytics

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ev_funnel ordering semantics + ev_cohort_retention triangle on planted
  * event sequences: steps only count when strictly AFTER the previous
  * step, and cohort offsets count active weeks from the first-active week.
  */
class FunnelCohortSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private def writeEvents(rows: Seq[(Long, Timestamp, Long, String)]): String = {
    val d = Files.createTempDirectory("graft-funnel").toFile
    d.deleteOnExit()
    spark.createDataFrame(rows).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/events.parquet")
    d.getAbsolutePath
  }

  test("funnel steps only count strictly after the previous step") {
    val dir = writeEvents(Seq(
      // user 1: clean view → click → purchase (depth 3, 2 days to convert)
      (1L, ts(1), 1L, "view"), (2L, ts(2), 1L, "click"), (3L, ts(3), 1L, "purchase"),
      // user 2: purchase BEFORE the click — depth stops at 2
      (4L, ts(1), 2L, "purchase"), (5L, ts(2), 2L, "view"), (6L, ts(3), 2L, "click"),
      // user 3: click but never a view — depth 0 (funnel starts at view)
      (7L, ts(1), 3L, "click"),
      // user 4: view only — depth 1
      (8L, ts(1), 4L, "view")))
    val out = StreamQueries.funnel.fn(spark, dir)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    assert(out(3)._1 == 1L && out(2)._1 == 1L && out(1)._1 == 1L && out(0)._1 == 1L)
    // completer latency: exactly 2 days in ms
    assert(out(3)._2.contains(2.0 * 24 * 3600 * 1000))
    // non-completer depths carry no latency
    assert(out(2)._2.isEmpty && out(1)._2.isEmpty)
  }

  test("cohort retention counts distinct active weeks from the first week") {
    // 2024-01-01 is a Monday: weeks start cleanly at day 1, 8, 15
    val dir = writeEvents(Seq(
      // user 1: active weeks 0, 1, 2 (two events in week 0 count once)
      (1L, ts(1), 1L, "view"), (2L, ts(2), 1L, "view"),
      (3L, ts(8), 1L, "view"), (4L, ts(15), 1L, "view"),
      // user 2: joins week 1 (day 8), returns week 2 — offsets 0 and 1
      (5L, ts(8), 2L, "view"), (6L, ts(16), 2L, "view")))
    val out = StreamQueries.cohortRetention.fn(spark, dir)
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 1L, ("2024-01-01", 1L) -> 1L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-08", 0L) -> 1L, ("2024-01-08", 1L) -> 1L))
  }
}
