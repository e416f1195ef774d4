package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.ingest.DedupSink

/** Structured Streaming runner for the `events` table (SURVEY.md §2.11):
  * `readStream` over the parquet dir → `Trigger.AvailableNow` (the
  * incremental micro-batch the reference's cron ticks approximate) →
  * `foreachBatch` into the idempotent dedup sink.
  *
  * Exactly-once EFFECT comes from the sink's conflict-key anti-join, not
  * from checkpoint bookkeeping alone: replaying the whole source against a
  * populated sink (fresh checkpoint, duplicated feed, task retry) inserts
  * nothing new — the same at-least-once→exactly-once posture as the
  * reference's ON CONFLICT sinks absorbing re-scraped pages.
  *
  * Scale: each micro-batch shuffles only batch + sink keys (see DedupSink);
  * checkpointed offsets keep steady-state batches incremental, and
  * AvailableNow drains multi-file backlogs in bounded batches.
  */
object EventsStream {

  /** Raw schema: `ts` arrives as nanos (TIMESTAMP(NANOS) parquet read under
    * `nanosAsLong`, set at session construction).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** ns→µs timestamp normalization, identical to Tables.events. */
  def normalize(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Drain everything currently in `sourceDir` into the dedup sink at
    * `sinkPath`; returns when the AvailableNow run finishes.
    */
  def drain(spark: SparkSession, sourceDir: String, sinkPath: String,
            checkpoint: String): Unit = {
    val stream = spark.readStream.schema(rawSchema).parquet(sourceDir)
    val q = normalize(stream).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        DedupSink.append(batch.sparkSession, sinkPath, batch,
          key = Seq("event_id"), tiebreak = Seq(col("ts")))
        ()
      }
      .start()
    q.awaitTermination()
  }
}
