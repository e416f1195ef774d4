package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ev_stream_funnel's state machine under adversarial arrival: the planted
  * funnel sequences arrive split across files in REVERSE chronological
  * order (late-early-view worst case), and the sink must still converge to
  * the batch answer — the order-free re-derivation contract.
  */
class StreamFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("reverse-ordered multi-file arrival converges to the batch funnel") {
    val root = Files.createTempDirectory("graft-sfun").toFile
    root.deleteOnExit()
    val src = s"${root.getAbsolutePath}/src"
    // user 1 completes view(d1) → click(d2) → purchase(d3); user 2's
    // purchase precedes its click (depth 2); the LATE file carries the
    // EARLIEST events, so eligibility must be recomputed, not streamed
    val late = Seq( // arrives second, holds the early views
      (1L, ts(1), 1L, "view"), (4L, ts(2), 2L, "view"))
    val early = Seq( // arrives first: clicks/purchases with no view yet
      (2L, ts(2), 1L, "click"), (3L, ts(3), 1L, "purchase"),
      (5L, ts(1), 2L, "purchase"), (6L, ts(3), 2L, "click"))
    def write(rows: Seq[(Long, Timestamp, Long, String)], name: String): Unit =
      spark.createDataFrame(rows).toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
        .coalesce(1).write.mode("append").parquet(src)
    val sink = s"${root.getAbsolutePath}/sink"
    val ckpt = s"${root.getAbsolutePath}/ckpt"
    // drain 1: only the late-stage events exist — no user has a view yet
    write(early, "early")
    EventsStream.streamFunnel(spark, src, sink, ckpt)
    val mid = spark.read.parquet(sink)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(mid == Map(1L -> 0, 2L -> 0), s"pre-view state must be depth 0: $mid")
    // drain 2 (same checkpoint): the EARLIER views arrive — persisted
    // state must promote both users without replaying drain 1's files
    write(late, "late")
    EventsStream.streamFunnel(spark, src, sink, ckpt)
    val out = spark.read.parquet(sink)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), Option(r.get(2))))).toMap
    assert(out(1L) == ((3, Some(2L * 24 * 3600 * 1000))), s"user 1: ${out(1L)}")
    assert(out(2L) == ((2, None)), s"user 2: ${out(2L)}")
  }
}
