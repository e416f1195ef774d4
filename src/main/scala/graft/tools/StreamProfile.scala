package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only: profile the watermarked-window streaming drain — per-batch
  * durations from StreamingQueryProgress, to see where the wall time goes.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Sessions.local(appName = "graft-streamprofile")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Num

    val base = java.nio.file.Files.createTempDirectory("sprof").toString
    val src = s"$base/src"; new java.io.File(src).mkdirs()
    graft.sources.EventsSource.stageInto(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(src))

    if (args.length > 1) spark.conf.set("spark.sql.shuffle.partitions", args(1))
    if (args.length > 2)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", args(2))
    val t0 = System.nanoTime()
    val stream = graft.sources.EventsSource.stream(spark, src)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value"), 6).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
    val t1 = System.nanoTime()
    val q = agg.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val b0 = System.nanoTime()
        batch.write.format("noop").mode("overwrite").save()
        println(f"  batch $id: rows materialized in ${(System.nanoTime() - b0) / 1e9}%.2f s")
      }
      .start()
    q.awaitTermination()
    val t2 = System.nanoTime()
    println(f"plan build: ${(t1 - t0) / 1e9}%.2f s, drain: ${(t2 - t1) / 1e9}%.2f s")
    for (p <- q.recentProgress) {
      println(s"  progress batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs}")
    }
    spark.stop()
  }
}
