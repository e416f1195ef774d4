package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All engine queries are parameterized by the scale-factor directory so the
  * same logical plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1
  * (bench) — and, at production scale, over a partitioned data lake: the
  * reads are plain parquet scans, so Catalyst pushes filters/column pruning
  * into the scan and partition pruning applies unchanged on a partitioned
  * layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` is nanosecond-precision in parquet. Normalize to Spark's
    * native microsecond TIMESTAMP at the scan so every downstream operator
    * (windows, sessionization, watermarks) sees a plain timestamp — matching
    * DuckDB's own ns→us truncation when it reads the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Spark rejects TIMESTAMP(NANOS) parquet columns outright; with
    // `spark.sql.legacy.parquet.nanosAsLong` (set at session construction —
    // see Sessions.local) they arrive as raw nanos longs, which we truncate
    // to micros ourselves. `div` is exact integral division — `floor(a/b)`
    // would round through double and drift by 1µs at epoch-ns magnitude
    // (~1.7e18 > 2^53). Truncation-toward-zero matches DuckDB's own ns→µs
    // conversion for the post-1970 data in these tables.
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
