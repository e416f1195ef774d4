package graft

import org.apache.spark.sql.SparkSession

/** Hard per-query watchdog shared by Verify and Bench: run the thunk on a
  * worker thread inside its own Spark job group; if it exceeds the budget,
  * cancel the group (interrupting running tasks) and report Left.
  *
  * Why this exists: the round driver gives the whole run one external
  * timeout. Without an internal one, a single stalling query (host IO
  * throttling, a plan gone quadratic) converts "one bad query" into "zero
  * recorded results for the round" — exactly what round 4's rc=124 did.
  * Job-group cancellation is the same mechanism a multi-tenant Spark
  * cluster uses to evict a runaway query without restarting the app.
  */
object Watchdog {
  def run[A](spark: SparkSession, name: String, timeoutSec: Int)(thunk: => A): Either[String, A] = {
    @volatile var out: Either[String, A] = Left(s"timeout after ${timeoutSec}s")
    val worker = new Thread(() => {
      try {
        spark.sparkContext.setJobGroup(s"wd-$name", name, interruptOnCancel = true)
        out = Right(thunk)
      } catch {
        case e: Throwable => out = Left(Option(e.getMessage).getOrElse(e.getClass.getName))
      } finally spark.sparkContext.clearJobGroup()
    }, s"watchdog-$name")
    worker.setDaemon(true)
    worker.start()
    worker.join(timeoutSec * 1000L)
    if (worker.isAlive) {
      spark.sparkContext.cancelJobGroup(s"wd-$name")
      worker.join(15000L) // give cancellation a moment to unwind
      Left(s"timeout after ${timeoutSec}s (job group cancelled)")
    } else out
  }
}
