package graft.tools

/** Dev tool: execute named queries and print the FINAL adaptive plan
  * (AQE `isFinalPlan=true`) — the artifact that proves or refutes runtime
  * exchange reuse, which the pre-execution `explain` cannot show.
  * Usage: runMain graft.tools.FinalPlan <sfDir> <q1>[,<q2>...]
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val spark = graft.Sessions.local(appName = "graft-finalplan")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val d = graft.SparkEntry.queries(n)(spark, dir)
      d.write.format("noop").mode("overwrite").save()
      println(s"==== $n (final adaptive plan)")
      println(d.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
