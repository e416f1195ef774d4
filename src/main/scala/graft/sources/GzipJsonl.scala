package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Gzip-compressed JSONL shard source (r16, E156 — the r15 verdict's
  * missing #3): the front door 100-TB text corpora actually arrive
  * through. Web-scale dumps ship as directories of `*.jsonl.gz` shards —
  * one JSON record per newline-terminated line, gzip per shard — and an
  * engine that only reads parquet makes every corpus wait on a separate
  * conversion fleet.
  *
  * Scale shape: gzip is NOT splittable, so the parallelism unit is the
  * SHARD — which is exactly how these corpora are produced (many
  * 100 MB–1 GB members), so per-file task assignment via the `binaryFile`
  * source is the right distribution: decompression is embarrassingly
  * parallel at shard granularity, and no shuffle exists until the caller
  * aggregates. Schema-on-read: this source yields LINES; the caller
  * applies `from_json` with its schema (codegen'd, null-safe — the
  * schema-on-read contract), so one staged corpus serves any projection.
  *
  * Failure posture (the codec-tier standard): a truncated member or a
  * corrupted byte surfaces as a NAMED error carrying the shard's name —
  * `java.util.zip` checks the per-member CRC32 and the decompressor
  * detects mid-stream truncation, and both wrap into
  * IllegalArgumentException("corrupt gzip shard …") instead of a bare
  * stream exception from deep inside a task. Concatenated members (the
  * `cat a.gz b.gz` shape crawl tooling emits) decompress as one stream,
  * per the gzip spec's multi-member rule.
  */
object GzipJsonl {

  /** Gunzip one shard to its raw bytes — all members, named failures.
    * Shared by the JSONL line framing here and the WARC record walk
    * ([[Warc]]), which reads the same multi-member shape.
    */
  private[graft] def gunzip(shard: String, bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
    } catch {
      case e: java.io.IOException =>
        throw new IllegalArgumentException(
          s"corrupt gzip shard $shard: ${e.getMessage}", e)
    }
    out.toByteArray
  }

  /** Gunzip one shard to its records: all members, UTF-8, one record per
    * newline-terminated line (a trailing newline closes the last record,
    * it does not open an empty one; blank lines are skipped — JSONL has
    * no legitimate empty record).
    */
  private[graft] def gunzipLines(shard: String, bytes: Array[Byte]): Seq[String] =
    new String(gunzip(shard, bytes), "UTF-8").split("\n", -1).toSeq.filter(_.nonEmpty)

  /** Read a directory of `*.jsonl.gz` shards as (shard, line_no, line)
    * rows — per-shard gunzip inside `mapPartitions` over the binary
    * column, the multimodal tier's decode pattern applied to text
    * containers. `line_no` is the record's 0-based position within its
    * shard (provenance for error reporting and stable record identity).
    */
  def readLines(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.jsonl.gz")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        gunzipLines(shard, bytes).iterator.zipWithIndex.map {
          case (l, i) => (shard, i.toLong, l)
        }
      })
      .toDF("shard", "line_no", "line")
  }

  /** Stage a DataFrame as `shards` gzip JSONL files under `dir` — the
    * FIXTURE side (in production an upstream exporter writes these).
    * Record serialization is Spark's own `toJSON` (its escaping rules,
    * which `from_json` must invert exactly — two independent code paths
    * crossing is the point of the fixture); each partition gzips its
    * lines into one shard, written atomically (tmp + move) so a retried
    * task cannot leave a half shard.
    */
  def writeShards(df: DataFrame, dir: String, shards: Int): Unit = {
    require(shards >= 1)
    val d = new java.io.File(dir)
    d.mkdirs()
    df.toJSON.repartition(shards).foreachPartition { (it: Iterator[String]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val tmp = new java.io.File(d, f"part-$pid%05d.jsonl.gz.tmp")
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(tmp))
      try it.foreach { l => out.write(l.getBytes("UTF-8")); out.write('\n') }
      finally out.close()
      java.nio.file.Files.move(tmp.toPath,
        new java.io.File(d, f"part-$pid%05d.jsonl.gz").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }
}
