package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole forked test JVM — suites must not stop
  * it (the JVM exits after the run).
  */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("4", appName = "graft-test")
}
