package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler._

/** Dev tool: run named queries (after a sf0.001 warmup and prestage) and
  * print, per query, the JOB/STAGE/TASK counts and aggregate task time of
  * the timed region — the measurement iterative queries need, where a
  * single `explain` cannot show the per-round loop cost. Set
  * GRAFT_PROFILE_STAGES=1 for a per-stage breakdown (stages > 200 ms).
  * Usage: runMain graft.tools.JobProfile <sfDir> <q1>[,<q2>...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val spark = graft.Sessions.local(appName = "graft-jobprofile")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val shufWrite = new AtomicLong; val shufRead = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (sys.env.contains("GRAFT_PROFILE_STAGES")) {
          val i = s.stageInfo
          val ms = i.taskMetrics.executorRunTime
          if (ms > 200)
            println(f"   [stage ${i.stageId}%4d] ${ms / 1e3}%6.1f s  " +
              f"tasks=${i.numTasks}%4d  ${i.name.take(110)}")
        }
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          shufWrite.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
        }
        ()
      }
    })
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      graft.SparkEntry.prestage.get(n).foreach(_(spark, dir))
      fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      (1 to 2).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
        shufWrite.set(0); shufRead.set(0)
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"== $n run$i: wall=$wall%.2f s jobs=${jobs.get} stages=${stages.get} " +
          f"tasks=${tasks.get} taskTime=${taskMs.get / 1e3}%.1f s " +
          f"shufW=${shufWrite.get / 1e6}%.1f MB shufR=${shufRead.get / 1e6}%.1f MB")
      }
    }
    spark.stop()
  }
}
