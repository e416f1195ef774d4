package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-key watermark control table — the reference's `users.last_fetched_*`
  * columns (SURVEY.md §2.11, utils/db_helpers.py:78-90). Deliberately NOT
  * Structured Streaming's `withWatermark` (global per query); the
  * reference's model is an explicit per-(company, platform) high-water mark
  * advanced only after a successful non-empty batch (tasks.py:134-135) —
  * a failed or empty window must be retried, so the watermark must not move.
  *
  * Monotonicity is enforced here (never move backwards), which also makes
  * the advance idempotent. Storage is a parquet dir swapped atomically via
  * tmp-write + rename; production would keep `users` in Delta and MERGE.
  */
object Watermarks {

  def read(spark: SparkSession, usersPath: String): DataFrame =
    spark.read.parquet(usersPath)

  /** Overwrite a parquet dir that may currently be read from: write aside,
    * then swap directories.
    */
  def overwriteParquet(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val tmp = path + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(tmp), hadoopConf)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** K9: advance `last_fetched_<platform>` to `to` for the companies in
    * `advanced` (those whose batch inserted > 0 rows), monotonically.
    */
  def advance(
      spark: SparkSession,
      usersPath: String,
      platform: String,
      advanced: Set[Int],
      to: Timestamp): Unit = {
    if (advanced.isEmpty) return
    val c = s"last_fetched_$platform"
    val users = read(spark, usersPath)
    val updated = users.withColumn(c,
      when(col("id").isin(advanced.toSeq: _*) && (col(c).isNull || col(c) < lit(to)), lit(to))
        .otherwise(col(c)))
    overwriteParquet(spark, usersPath, updated)
  }
}
