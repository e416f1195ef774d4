package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` for named queries into
  * `<outDir>/<query>_<suffix>.txt` — the committed before/after plan
  * evidence an optimization round owes (plans/r17 contract).
  * Usage: runMain graft.tools.ExplainTo <sfDir> <outDir> <suffix> <q1>[,<q2>...]
  */
object ExplainTo {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, suffix, qs) = args.take(4)
    val spark = graft.Sessions.local(appName = "graft-explainto")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    qs.split(",").foreach { n =>
      graft.SparkEntry.prestage.get(n).foreach(_(spark, dir))
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
