package graft

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line `{"metric":"total","value":…,"queries":{…},…}`.
  *
  * Hygiene (per r1 verdict):
  *  - a warmup pass at sf0.001 first, so session/codegen startup cost isn't
  *    attributed to whichever query happens to run first;
  *  - materialization through the `noop` sink, not `.count()` — count lets
  *    Catalyst prune every column the count doesn't need, under-measuring
  *    projection/expression work;
  *  - failures are NOT swallowed into timings: a failed query reports -1,
  *    is listed in "failed", and the process exits non-zero.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmupDir = "/root/testdata/sf0.001"
    val spark = Sessions.local(appName = "graft-bench")

    def materialize(name: String, dir: String): Either[String, Double] =
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable => Left(s"$name: ${e.getMessage}") }

    val names = SparkEntry.queries.keys.toSeq.sorted
    if (new java.io.File(warmupDir).isDirectory)
      names.foreach(materialize(_, warmupDir)) // warmup: ignore outcome

    val results = names.map(n => n -> materialize(n, sfDir))
    val failed = results.collect { case (n, Left(err)) =>
      System.err.println(s"[bench] FAILED $err"); n
    }
    // Compact values (100 ms resolution — below run-to-run variance at
    // sf0.1): the recording harness captures only the LAST 2000 chars of
    // stdout, so at 77 queries every value char is ~77 line chars; the
    // line must fit that window in full or it cannot be parsed back out.
    def fmt(sec: Double): String =
      if (sec >= 10) f"$sec%.0f" else f"$sec%.1f" // ≤3 chars below 1000 s
    // failed queries appear ONLY in "failed", not as -1 entries in the
    // queries map: each failure must SHRINK the line (entry ~name+7 chars
    // out, "failed" element ~name+3 in), because the overflow-vs-window
    // failure mode would otherwise strike exactly when a query breaks
    val qs = results.collect {
      case (n, Right(sec)) => s"\"$n\":${fmt(sec)}"
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(sec)) => sec }.sum
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    // sf as the directory basename, not the full path: every char of this
    // line competes with the capturing harness's 2000-char stdout tail.
    val sf = new java.io.File(sfDir).getName
    // the headline total keeps 100 ms resolution (one value, 4-5 chars)
    println(s"""{"metric":"total","value":${f"$total%.1f"},"unit":"sec","queries":$qs$failedJson,"sf":"$sf"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
