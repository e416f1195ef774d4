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
