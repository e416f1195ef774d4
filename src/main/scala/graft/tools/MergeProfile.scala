package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: time the individual merges of the k10 shape at a given SF. */
object MergeProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Sessions.local(appName = "graft-mergeprofile")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ingest.MergeSink

    val base = graft.Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val upd = base.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    base.write.format("noop").mode("overwrite").save() // warm the scan

    val sink = java.nio.file.Files.createTempDirectory("mprof").toString + "/sink"
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val jobNanos = new java.util.concurrent.atomic.AtomicLong()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(j.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach(t0 => jobNanos.addAndGet(System.nanoTime() - t0)); ()
      }
    })
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); jobs.set(0); jobNanos.set(0)
      val r = body
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        f"${jobs.get()} jobs, ${jobNanos.get() / 1e9}%.2f s in jobs")
      r
    }
    t("merge1 (150k insert)") {
      MergeSink.merge(spark, sink, base, Seq("o_orderkey"), Seq(col("o_orderkey")))
    }
    t("merge2 (15k update)") {
      MergeSink.merge(spark, sink, upd, Seq("o_orderkey"), Seq(col("o_orderkey")))
    }
    t("merge3 (15k re-update)") {
      MergeSink.merge(spark, sink, upd, Seq("o_orderkey"), Seq(col("o_orderkey")))
    }
    t("read") { MergeSink.read(spark, sink).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
