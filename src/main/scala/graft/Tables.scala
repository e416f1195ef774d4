package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** `events.ts` arrives either as raw nanos longs (TIMESTAMP(NANOS) data
    * under `nanosAsLong` — see Sessions.local) or as a native µs timestamp,
    * depending on the testdata generation. EventsSource owns the
    * normalization — ONE copy of the unit logic for batch and streaming.
    */
  def events(s: SparkSession, d: String): DataFrame =
    graft.sources.EventsSource.batch(s, s"$d/events.parquet")
}
