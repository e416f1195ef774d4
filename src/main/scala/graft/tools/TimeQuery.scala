package graft.tools

/** Dev-only: time named queries in isolation (3 runs each, after a warmup
  * at sf0.001) and print the executed plan of the last run. Usage:
  *   runMain graft.tools.TimeQuery <sfDir> <query>[,<query>...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val spark = graft.Sessions.local(appName = "graft-timequery")
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      graft.SparkEntry.prestage.get(n).foreach(_(spark, dir))
      fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"== $n: ${times.map(t => f"$t%.2f").mkString(" ")} s")
      println(fn(spark, dir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
