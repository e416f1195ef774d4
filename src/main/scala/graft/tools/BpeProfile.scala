package graft.tools

/** Dev-only: per-round wall clock of THE BPE training loop (via bpeTrain's
  * onRound seam — not a re-implementation, the SpanW lesson). Evidence for
  * the flat-per-round claim behind the r12 depth increase (3 → 10 rounds):
  * with a localCheckpoint per round, round r's cost must not grow with r.
  * Usage: runMain graft.tools.BpeProfile <sfDir>
  */
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Sessions.local(appName = "graft-bpe-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val (w, v) = graft.analytics.TextQueries.bpeTrain(spark, dir,
      (r, sec) => println(f"== bpe round $r%2d: $sec%.3f s"))
    println(f"== total: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"winners: ${w.count()}, reps: ${v.count()}")
    spark.stop()
  }
}
