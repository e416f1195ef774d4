package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names reference the SURVEY.md §2 operator ids they exercise
  * (s1/s2 scans, f* filters, p* projections, x* explodes, k* sinks,
  * a* aggregations, j* joins, l* limits, u* set-ops, w* windows), plus the
  * analytics / training-data-pipeline surface (dd_* dedup, ann_* similarity,
  * tx_* text analysis, ev_* event/stream analytics).
  */
object SparkEntry {

  /** All declared queries, each optionally paired with a DuckDB oracle. */
  def allDefs: Seq[QueryDef] =
    CoreQueries.defs ++ NormQueries.defs ++ TextQueries.defs ++
      DedupQueries.defs ++ AnnQueries.defs ++ StreamQueries.defs ++
      MultimodalQueries.defs ++ ExtQueries.defs ++ CurateQueries.defs ++
      GraphQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, Some(sql), _) => n -> sql }.toMap
}
