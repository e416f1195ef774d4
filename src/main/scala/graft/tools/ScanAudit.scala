package graft.tools

/** Dev tool: duplicate-subtree sweep. For every declared query (minus a
  * skip list of side-effectful/streaming entries whose plan is the
  * read-back), print the per-table parquet scan count in the INITIAL
  * physical plan plus nested-loop/cartesian flags — the cheap static
  * signal for a heavy subtree referenced twice (the q2/q15/q11/q21
  * family of regressions). InMemoryTableScan-backed re-reads (the shared
  * shingle cache) do not re-scan parquet and are excluded by
  * construction, because the cached plan's FileScan appears only in the
  * cache-materialization subtree.
  * Usage: runMain graft.tools.ScanAudit <sfDir> [minCount]
  */
object ScanAudit {
  private val skipExact = Set(
    "ev_stateful_state", "ev_transform_with_state",
    "ev_watermarked_window", "ev_session_window_stream",
    "k1_sink_idempotence", "k4_null_key_sink", "k10_merge_upsert",
    "k11_format_roundtrip", "k12_incremental_agg", "k13_point_lookup",
    "k14_delete", "k15_zorder_skip")
  // every ev_stream_* runs a full drain whose read-back plan is one scan —
  // nothing for a static sweep to see, minutes of wall each
  private def skip(n: String) = skipExact(n) || n.startsWith("ev_stream_")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val min = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Sessions.local(appName = "graft-scanaudit")
    spark.sparkContext.setLogLevel("ERROR")
    val tableRe = "/([a-z_]+)\\.parquet".r
    graft.SparkEntry.allDefs.filterNot(d => skip(d.name)).foreach { d =>
      val p = d.fn(spark, dir).queryExecution.executedPlan.toString
      // Scans INSIDE an InMemoryRelation's cache-materialization subtree
      // run once at cache build and amortize across every consumer —
      // counting them as echoes produced false alarms on the PlanCache
      // tiers (PQ/IVF/BPE all looked 10-30×-scanned). The printout nests
      // them under the InMemoryRelation header at deeper indentation, so
      // count LIVE scans from the lines above/outside those blocks.
      val lines = p.linesIterator.toSeq
      def indent(l: String) = l.takeWhile(c => c == ' ' || c == ':' || c == '+' || c == '-').length
      var cachedBelow = Int.MaxValue
      val live = new StringBuilder
      for (l <- lines) {
        val ind = indent(l)
        if (ind <= cachedBelow) cachedBelow = Int.MaxValue // left the cached block
        if (l.contains("InMemoryRelation") && ind < cachedBelow) cachedBelow = ind
        if (ind <= cachedBelow) live.append(l).append('\n')
      }
      val lp = live.toString
      val counts = tableRe.findAllMatchIn(lp).map(_.group(1)).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val dups = counts.filter(_._2 >= min)
      val cachedScans = tableRe.findAllMatchIn(p).size - tableRe.findAllMatchIn(lp).size
      val flags = Seq(
        if (lp.contains("CartesianProduct")) Some("CARTESIAN") else None,
        if (lp.contains("BroadcastNestedLoop")) Some("BNLJ") else None,
        if (cachedScans > 0) Some(s"cached-subtree-scans=$cachedScans") else None).flatten
      if (dups.nonEmpty || flags.exists(f => !f.startsWith("cached")))
        println(s"${d.name}: dups=${dups.toSeq.sortBy(-_._2).mkString(",")} ${flags.mkString(",")}")
    }
    spark.stop()
  }
}
