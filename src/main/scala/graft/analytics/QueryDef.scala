package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark plan plus (when SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables.
  *
  * Determinism contract (driver hash-compares Spark output vs DuckDB):
  *  - every computed column is aliased identically on both sides;
  *  - double aggregation goes through exact DECIMAL accumulation and is cast
  *    back to double (IEEE-identical on both engines, independent of
  *    partitioning / parallel reduction order);
  *  - any LIMIT / top-k carries a total order (unique-key tiebreak);
  *  - timestamps stay TIMESTAMP_NTZ end-to-end (what both engines read from
  *    the parquet), session timezone UTC.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), fn)
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None, fn)
}

/** Tmp-dir staging shared by every side-effectful query (sink-postcondition
  * and streaming drains): ONE place for the workspace naming and cleanup
  * rules, instead of per-file copies that drift.
  */
private[analytics] object Staging {

  def rmRf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmRf)
    f.delete(); ()
  }

  /** Fresh per-(prefix, dir) workspace under java.io.tmpdir. */
  def freshBase(prefix: String, dir: String): java.io.File = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val base = new java.io.File(sys.props("java.io.tmpdir"), s"${prefix}_$tag")
    rmRf(base); base.mkdirs()
    base
  }

  /** freshBase + an isolated copy of the events parquet (streaming drains
    * need a source DIR they can later append files to) →
    * (srcDir, sinkPath, checkpointPath). File-vs-dir layout handling lives
    * in EventsSource.stageInto — a nested events.parquet/ dir must be
    * FLATTENED into loose files because the streaming file source lists
    * src/ non-recursively (an un-flattened dir stages an empty stream:
    * zero micro-batches, the sink never created at all).
    */
  def stageEvents(prefix: String, dir: String): (String, String, String) = {
    val base = freshBase(prefix, dir)
    val src = new java.io.File(base, "src"); src.mkdirs()
    val n = graft.sources.EventsSource.stageInto(
      java.nio.file.Paths.get(s"$dir/events.parquet"), src.toPath)
    require(n > 0, s"staged zero event files from $dir/events.parquet")
    (src.getPath, s"${base.getPath}/sink", s"${base.getPath}/ckpt")
  }
}
