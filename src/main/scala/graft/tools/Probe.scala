package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump how this Spark build reads each test table (schemas decide
  * how we normalize ns-timestamps / NTZ columns for oracle parity).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.Sessions.local("4", appName = "graft-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- graft.Tables.all) {
      try {
        val df = graft.Tables.load(spark, dir, t)
        println(s"== $t: ${df.schema.simpleString}")
      } catch {
        case e: Throwable => println(s"== $t: FAILED ${e.getMessage.take(300)}")
      }
    }
    println("-- events via Tables.events:")
    try {
      val ev = graft.Tables.events(spark, dir)
      println(ev.schema.simpleString)
      ev.orderBy("event_id").show(3, truncate = false)
    } catch { case e: Throwable => println(s"events FAILED: ${e.getMessage.take(500)}") }
    println("-- lineitem sample:")
    graft.Tables.lineitem(spark, dir).orderBy("l_orderkey", "l_linenumber").show(3)
    spark.stop()
  }
}
