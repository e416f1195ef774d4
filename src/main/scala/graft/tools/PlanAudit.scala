package graft.tools

/** Dev tool: one-line plan audit per declared query — scan pushdown,
  * join strategies, exchange count, codegen spans. Red flags: cartesian
  * products, scans with no pruning where the query projects few columns,
  * single-partition exchanges.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val skip = Set("ev_stream_exactly_once") // side-effectful; audited separately
    graft.SparkEntry.allDefs.sortBy(_.name).foreach { d =>
      if (!skip(d.name)) {
        try {
          val plan = d.fn(spark, dir).queryExecution.executedPlan.toString
          def n(p: String) = plan.linesIterator.count(_.contains(p))
          val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).map { l =>
            val cols = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(l).map(_.group(1).count(_ == ':')).getOrElse(-1)
            val pushed = l.contains("PushedFilters: [") && !l.contains("PushedFilters: []")
            s"${cols}c${if (pushed) "+pf" else ""}"
          }.mkString(",")
          println(f"AUDIT ${d.name}%-26s scans=[$scans] bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} cart=${n("Cartesian") + n("BroadcastNestedLoop")} exch=${n("Exchange")} gen=${n("Generate")}")
        } catch { case e: Throwable => println(s"AUDIT ${d.name} ERROR ${e.getMessage.take(80)}") }
      }
    }
    spark.stop()
  }
}
