package graft

import org.apache.spark.sql.SparkSession

/** SQL surface of the engine: register every test table as a temp view so
  * users drive the library with `spark.sql(...)` exactly as they would the
  * reference's SQL layer — the third API alongside the DataFrame queries
  * (SparkEntry) and the HTTP trigger (HttpApi).
  *
  * `events` goes through EventsSource, so SQL sees the normalized
  * TIMESTAMP column regardless of the file's physical unit; every other
  * table is the plain parquet scan, so predicates written in SQL still
  * push down into the scan (views are lazy plans, not materializations —
  * registering costs nothing until a query runs).
  *
  * The custom Catalyst expressions (graft_rolling_hash, graft_shingles,
  * graft_dot) are session-registered by GraftExtensions (Sessions.local
  * sets `spark.sql.extensions`), so they are callable from SQL text too —
  * SqlCatalogSpec pins DataFrame↔SQL parity for both the operators and
  * the functions.
  */
object SqlCatalog {
  def register(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case name     => Tables.load(spark, dir, name).createOrReplaceTempView(name)
    }
}
