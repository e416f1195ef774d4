package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Numeric helpers for cross-engine-deterministic aggregation.
  *
  * Summing doubles is order-dependent, and Spark's partial aggregation order
  * varies with partitioning — so any double SUM/AVG the oracle checks must be
  * accumulated exactly. We cast each operand to DECIMAL(18,s) (exact, and the
  * per-row double→decimal rounding is identical in Spark and DuckDB), sum
  * exactly, then cast the final value back to double. At 100 TB this costs
  * one widening per row inside whole-stage codegen — no extra shuffle, and
  * partial (map-side) aggregation still applies.
  */
object Num {
  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Deterministic average: exact decimal sum, then one double division.
    * Divides by `count(c)` (nulls excluded) to match SQL AVG semantics on
    * nullable columns; identical to COUNT(*) on non-null inputs.
    */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** Epoch milliseconds of an NTZ timestamp under the UTC session zone —
    * matches DuckDB's `epoch_ms` on the same naive value.
    */
  def epochMs(c: Column): Column = unix_millis(c.cast(TimestampType))

  /** NTZ timestamp literal (tables are read as TIMESTAMP_NTZ). */
  def tsNtz(s: String): Column = lit(s).cast(TimestampNTZType)
}
