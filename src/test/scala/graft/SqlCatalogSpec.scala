package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface must be the SAME engine: a query written as SQL text
  * over the registered views returns bit-identical rows to its DataFrame
  * twin, the custom Catalyst expressions resolve from SQL, and the events
  * view carries the normalized timestamp whatever the file's unit.
  */
class SqlCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def sortedRows(rows: Array[Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("SQL text over the views equals the DataFrame plan (TPC-H Q1)") {
    SqlCatalog.register(spark, sf)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin).collect()
    val df = SparkEntry.queries("tpch_q1_pricing_summary")(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect()
    assert(sortedRows(sql) == sortedRows(df))
  }

  test("joins and windows written in SQL match the DataFrame twin (l3 top-k per group)") {
    SqlCatalog.register(spark, sf)
    val sql = spark.sql(
      """SELECT * FROM (
        |  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
        |                       ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) t
        |WHERE rk <= 3""".stripMargin).collect()
    val df = SparkEntry.queries("l3_topk_per_group")(spark, sf).collect()
    assert(sql.length == df.length && sql.nonEmpty)
    assert(sortedRows(sql) == sortedRows(df))
  }

  test("custom Catalyst expressions resolve from SQL text") {
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql("SELECT graft_rolling_hash('abc def') AS h").head().getLong(0)
    val viaDf = spark.range(1)
      .select(call_function("graft_rolling_hash", lit("abc def")).as("h"))
      .head().getLong(0)
    assert(viaSql == viaDf)
    val shingles = spark.sql("SELECT graft_shingles('a b c d') AS s")
      .head().getSeq[String](0)
    assert(shingles == Seq("a b c", "b c d"))
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head().getDouble(0)
    assert(dot == 11.0)
  }

  test("the events view exposes the normalized timestamp") {
    SqlCatalog.register(spark, sf)
    val t = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType.typeName
    assert(t.startsWith("timestamp"), s"events.ts surfaced as $t")
    val n = spark.sql(
      "SELECT COUNT(*) FROM events WHERE ts >= TIMESTAMP '2020-01-01 00:00:00'")
      .head().getLong(0)
    assert(n > 0, "normalized timestamps should be post-2020 epoch values")
  }
}
