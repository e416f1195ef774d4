package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The idempotent dedup-append sink — the reference's
  * `INSERT … ON CONFLICT (key) DO NOTHING` (SURVEY.md §2.5 K1-K8,
  * utils/db_helpers.py:92-300) re-expressed as:
  *
  *   1. within-batch dedup: one deterministic representative per conflict
  *      key (row_number over a caller-supplied total-order tiebreak — NOT
  *      dropDuplicates, whose surviving row is partition-order-dependent);
  *   2. cross-batch dedup: null-safe LEFT ANTI join against the existing
  *      sink's keys;
  *   3. append.
  *
  * Re-ingesting any batch is a no-op (exactly-once effect from
  * at-least-once fetch). NULL-key semantics: Postgres ON CONFLICT treats
  * NULLs as distinct (duplicate NULL-key rows keep inserting); we use
  * null-safe equality (`<=>`) so NULL keys dedup like values — the saner
  * behavior for an analytics sink, documented as a deliberate divergence
  * (SURVEY.md §7.4-2).
  *
  * Scale: the anti-join shuffles batch + existing keys only (existing is
  * pruned to key columns at scan, and the join key is the natural
  * partitioning of the sink); with a Delta/Iceberg sink this becomes
  * `MERGE WHEN NOT MATCHED INSERT` with file skipping. Parquet-dir append
  * keeps the same logical contract for the hermetic tests.
  */
final case class AppendResult(inserted: Long, perGroup: Map[String, Long])

object DedupSink {

  /** A sink dir is READABLE only if it actually contains parquet files —
    * a partitioned write of an empty frame leaves just _SUCCESS, and
    * `spark.read.parquet` on that throws UNABLE_TO_INFER_SCHEMA forever
    * after. Existence checks must use this, not File.exists().
    */
  private[graft] def readable(path: String): Boolean = {
    def hasParquet(f: java.io.File): Boolean =
      f.isFile && f.getName.endsWith(".parquet") ||
        (f.isDirectory && Option(f.listFiles()).exists(_.exists(hasParquet)))
    hasParquet(new java.io.File(path))
  }

  /** A parquet file at the dir ROOT of a partitioned sink can only be the
    * empty schema marker (partitioned appends always write under partition
    * subdirs) — the first real write must replace it wholesale or the
    * mixed layout breaks partition discovery.
    */
  private[graft] def rootParquet(path: String): Boolean =
    Option(new java.io.File(path).listFiles()).toSeq.flatten
      .exists(f => f.isFile && f.getName.endsWith(".parquet"))

  /** The existing-sink key scan for the cross-batch anti-join, partition-
    * pruned: when the sink's physical partition columns are a subset of the
    * conflict key, a key can only collide inside its own partition, so the
    * existing side is restricted to the partitions the batch touches — the
    * filter lands in the scan's PartitionFilters and append cost is
    * O(touched partitions), not O(sink). Global-key sinks (partition column
    * not in the key, e.g. twitter's tweet_id) must scan all partitions: the
    * same key may already exist under another company.
    */
  private[ingest] def existingKeys(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      key: Seq[String],
      partitionBy: Seq[String]): DataFrame = {
    require(readable(path), s"existingKeys on a schema-less sink dir: $path")
    val existingAll = spark.read.parquet(path)
    val keySet = key.toSet
    val prunable = partitionBy.nonEmpty && partitionBy.forall(keySet)
    val existingScan =
      if (!prunable) existingAll
      else {
        // Partition values come from the pre-dedup batch (same distinct set
        // — the within-batch window only drops duplicate-key rows);
        // O(batch) rows scanned, O(touched partitions) rows collected.
        val touched = batch.select(partitionBy.map(col): _*).distinct().collect()
        val filters = partitionBy.zipWithIndex.map { case (c, i) =>
          val vs = touched.map(_.get(i)).toSeq
          val nonNull = vs.filter(_ != null)
          val base = if (nonNull.isEmpty) lit(false) else col(c).isin(nonNull: _*)
          if (vs.contains(null)) base || col(c).isNull else base
        }
        filters.reduceOption(_ && _).map(existingAll.filter).getOrElse(existingAll)
      }
    existingScan.select(key.map(col): _*)
  }

  /** Append `batch` to the parquet sink at `path`, deduplicating on `key`.
    * Returns insert counts (total and, when `groupCol` is set, per group —
    * one row per group, driver-safe).
    *
    * Counts are materialized BEFORE the write: the fresh-rows plan reads the
    * sink path it is about to append to, and Spark invalidates/refreshes
    * plans on that path after the write — a post-write evaluation would see
    * its own insertions in the anti-join and report 0.
    */
  /** `partitionBy`: physical layout columns for the sink (the engine's one
    * owned physical decision, SURVEY.md §4 — fact tables partition by
    * company so per-company analytics and the watermark path prune files).
    */
  def append(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      key: Seq[String],
      tiebreak: Seq[Column],
      groupCol: Option[String] = None,
      partitionBy: Seq[String] = Nil): AppendResult = {
    // Total order: caller tiebreak first, then every remaining column —
    // the surviving representative is independent of partitioning.
    // nulls_last EVERYWHERE (tiebreaks included — Spark's bare-column
    // default is nulls FIRST, which would make a sparse duplicate with a
    // null tiebreak value beat a fully-populated one, e.g. Reddit's
    // dual-query union where only one copy carries the preview).
    val keySet = key.toSet
    val rest = batch.columns.filterNot(keySet).map(col(_).asc_nulls_last).toSeq
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(tiebreak.map(_.asc_nulls_last) ++ rest: _*)
    val deduped = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val fresh =
      if (readable(path)) {
        val existing = existingKeys(spark, path, batch, key, partitionBy)
        val cond = key.map(k => deduped(k) <=> existing(k)).reduce(_ && _)
        deduped.join(existing, cond, "left_anti")
      } else deduped
    // Eager localCheckpoint, not cache(): the fresh-rows plan READS the sink
    // path it is about to APPEND to. cache() keeps the lineage, so a lost
    // block between count() and the write would silently recompute the
    // anti-join against the partially-appended sink and drop rows; the
    // checkpoint truncates the lineage — the write can only read the
    // materialized blocks, and block loss fails the job loudly instead.
    val snapshot = fresh.localCheckpoint(true)
    val perGroup = groupCol match {
      case Some(g) =>
        snapshot.groupBy(g).count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      case None => Map.empty[String, Long]
    }
    val total = if (groupCol.isDefined) perGroup.values.sum else snapshot.count()
    def writer(mode: String) = {
      val w = snapshot.write.mode(mode)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    }
    val marker = partitionBy.nonEmpty && rootParquet(path)
    if (total > 0) writer(if (marker) "overwrite" else "append")
    else if (!readable(path)) {
      // Materialize an empty sink so downstream reads see the schema —
      // WITHOUT partitionBy: a partitioned write of zero rows emits no
      // data files at all (only _SUCCESS), which poisons the dir — every
      // later read throws UNABLE_TO_INFER_SCHEMA. A non-partitioned empty
      // write produces one schema-bearing file; the partition columns ride
      // along as ordinary columns, and `readable` means the first REAL
      // append replaces this marker cleanly via overwrite.
      snapshot.write.mode("overwrite").parquet(path)
    }
    AppendResult(total, perGroup)
  }
}
