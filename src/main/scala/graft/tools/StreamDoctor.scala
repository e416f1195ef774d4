package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only: localize the streaming-drain machinery cost (r14 verdict's
  * weak x4) by running the SAME watermarked-window aggregation under
  * controlled variants in one JVM — batch baseline, stateless stream,
  * stateful stream under each store provider / partition count / changelog
  * setting — and printing one wall-clock line per variant. The deltas
  * between variants attribute the wall to (a) micro-batch fixed cost,
  * (b) state-store commit machinery, (c) provider choice.
  */
object StreamDoctor {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Sessions.local(appName = "graft-streamdoctor")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Num

    def staged(): String = {
      val base = java.nio.file.Files.createTempDirectory("sdoc").toString
      val src = s"$base/src"; new java.io.File(src).mkdirs()
      graft.sources.EventsSource.stageInto(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        java.nio.file.Paths.get(src))
      src
    }

    def agg(df: DataFrame): DataFrame = df
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value"), 6).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[doctor] $label%-52s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    def drain(src: String, confs: Map[String, String], stateless: Boolean = false): Unit = {
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val ckpt = java.nio.file.Files.createTempDirectory("sdoc_ck").toString
        val stream = graft.sources.EventsSource.stream(spark, src)
        val out = if (stateless) stream else agg(stream)
        val q = out.writeStream
          .outputMode(if (stateless) "append" else "update")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.format("noop").mode("overwrite").save() }
          .start()
        q.awaitTermination()
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    val Parts = "spark.sql.shuffle.partitions"
    val NoData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val Provider = "spark.sql.streaming.stateStore.providerClass"
    val Rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val Changelog = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val base = Map(Parts -> "8", NoData -> "false")

    // warmups: batch agg codegen + one full streaming drain (session init,
    // streaming codegen, checkpoint machinery classloading)
    val wsrc = staged()
    agg(spark.read.parquet(wsrc)).write.format("noop").mode("overwrite").save()
    drain(staged(), base)

    time("batch agg (8 parts)") {
      spark.conf.set(Parts, "8")
      try agg(spark.read.parquet(wsrc)).write.format("noop").mode("overwrite").save()
      finally spark.conf.set(Parts, "32")
    }
    time("stream stateless passthrough") { drain(staged(), base, stateless = true) }
    time("stream agg, HDFS store, 8 parts") { drain(staged(), base) }
    time("stream agg, HDFS store, 8 parts (repeat)") { drain(staged(), base) }
    time("stream agg, HDFS store, 32 parts") { drain(staged(), base + (Parts -> "32")) }
    time("stream agg, RocksDB, 8 parts") { drain(staged(), base + (Provider -> Rocks)) }
    time("stream agg, RocksDB+changelog, 8 parts") {
      drain(staged(), base + (Provider -> Rocks) + (Changelog -> "true"))
    }
    time("stream agg, HDFS store, 8 parts, noData ON") {
      drain(staged(), base + (NoData -> "true"))
    }

    // the REAL query path, piece by piece: staging, the windowedCounts
    // drain (whose foreachBatch upserts a 64-bucket partitioned sink), and
    // the final sink read — the deltas vs the noop-sink drains above
    // attribute the regression between machinery and SINK IO
    val base2 = java.nio.file.Files.createTempDirectory("sdoc_real").toString
    var src2: String = null
    time("real: stage events") {
      val d = new java.io.File(base2, "src"); d.mkdirs()
      graft.sources.EventsSource.stageInto(
        java.nio.file.Paths.get(s"$dir/events.parquet"), d.toPath)
      src2 = d.getPath
    }
    time("real: windowedCounts drain (upsert sink)") {
      graft.streaming.EventsStream.windowedCounts(
        spark, src2, s"$base2/sink", s"$base2/ckpt")
    }
    time("real: read sink") {
      spark.read.parquet(s"$base2/sink").write.format("noop").mode("overwrite").save()
    }
    time("real: windowedCounts AGAIN (fresh ckpt+sink)") {
      graft.streaming.EventsStream.windowedCounts(
        spark, src2, s"$base2/sink2", s"$base2/ckpt2")
    }
    // the sink write in isolation: the same agg rows written once as a
    // 64-bucket dynamic-partition parquet table
    val aggRows = agg(spark.read.parquet(src2))
      .withColumn("bucket", pmod(hash(col("hour_start"), col("event_type")), lit(64)))
      .localCheckpoint(true)
    time("isolated: 64-bucket partitioned write") {
      aggRows.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(s"$base2/sink3")
    }
    spark.stop()
  }
}
