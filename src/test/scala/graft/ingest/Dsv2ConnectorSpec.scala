package graft.ingest

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark
import graft.schema.Schemas

/** The DSv2 pushdown contract (SURVEY §4/§7.3): the graft-fixture source's
  * scan must CARRY the window filters (PushedFilters), the bare cap
  * (PushedLimit), and the newest-first cap (PushedTopN) — and produce the
  * same rows as the convention-pushdown FixtureConnector.
  */
class Dsv2ConnectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeFixture(lines: Seq[String], extra: Map[String, Seq[String]] = Map.empty): String = {
    val dir = Files.createTempDirectory("graft-dsv2")
    val p = dir.resolve("twitter3"); p.toFile.mkdirs()
    Files.write(p.resolve("h.json"), lines.mkString("\n").getBytes)
    extra.foreach { case (name, ls) =>
      Files.write(p.resolve(s"$name.json"), ls.mkString("\n").getBytes)
    }
    dir.toString
  }

  private def rec(id: Long, iso: String) =
    s"""{"id":$id,"content":"x","date":"$iso","url":"u","user":{"username":"n"}}"""

  private def v2(dir: String) = new Dsv2FixtureConnector(
    "twitter3", dir, Schemas.twitter3Raw, eventTimeCol = Some("date"), tiebreakCol = Some("id"))
  private def v1(dir: String) = new FixtureConnector(
    "twitter3", dir, Schemas.twitter3Raw, eventTime = Some(col("date")),
    tiebreak = Seq(col("id")))

  private val c = Company(1, "C", Some("h"))
  private def scanLine(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("graft-fixture")).getOrElse("")

  test("window filters land in the scan's PushedFilters") {
    val dir = writeFixture((1 to 6).map(i => rec(i, f"2025-01-0${i}T00:00:00Z")))
    val df = v2(dir).fetch(spark, c, FetchParams(
      Some(Timestamp.valueOf("2025-01-02 00:00:00")),
      Some(Timestamp.valueOf("2025-01-05 00:00:00")), None))
    val scan = scanLine(df)
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThanOrEqual(date")
      && scan.contains("LessThan(date"), s"filters not pushed:\n$scan")
    assert(df.collect().map(_.getAs[Long]("id")).toSet == Set(2L, 3L, 4L)) // until exclusive
    // id 5: null-date records pass the window (Or(IsNull, cmp) pushed whole)
    val dir2 = writeFixture(Seq(rec(1, "2025-01-01T00:00:00Z"),
      """{"id":5,"content":"no date","url":"u","user":{"username":"n"}}"""))
    val df2 = v2(dir2).fetch(spark, c,
      FetchParams(Some(Timestamp.valueOf("2025-06-01 00:00:00")), None, None))
    assert(df2.collect().map(_.getAs[Long]("id")).toSet == Set(5L))
  }

  test("newest-first cap lands as PushedTopN; bare cap as PushedLimit") {
    val dir = writeFixture((1 to 6).map(i => rec(i, f"2025-01-0${i}T00:00:00Z")))
    val capped = v2(dir).fetch(spark, c, FetchParams(limit = Some(2)))
    val scan = scanLine(capped)
    assert(scan.contains("PushedTopN") && scan.contains("LIMIT 2"),
      s"TopN not pushed:\n$scan")
    assert(capped.collect().map(_.getAs[Long]("id")).toSet == Set(5L, 6L))

    val bare = v2(dir).fetch(spark, c, FetchParams()).limit(3)
    assert(scanLine(bare).contains("PushedLimit: 3"), s"limit not pushed:\n${scanLine(bare)}")
    assert(bare.count() == 3)
  }

  test("column pruning reaches the reader's parse schema") {
    val dir = writeFixture((1 to 3).map(i => rec(i, f"2025-01-0${i}T00:00:00Z")))
    val df = v2(dir).fetch(spark, c, FetchParams()).select("id")
    assert(df.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // the pruned schema reaches the Scan (readSchema), not just the project
    val scan = df.queryExecution.executedPlan
      .collect { case s if s.getClass.getSimpleName.contains("BatchScan") => s }
    assert(scan.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(scan.head.schema.fieldNames.toSeq == Seq("id"),
      s"scan reads ${scan.head.schema.fieldNames.mkString(",")}, expected only id")
  }

  test("page cap is a pushed scan filter (HTML-source shape)") {
    val dir = Files.createTempDirectory("graft-dsv2-page")
    val p = dir.resolve("trustpilot"); p.toFile.mkdirs()
    val lines = (1 to 5).flatMap(page => (1 to 2).map(i =>
      s"""{"author_name":"a$page$i","rating_alt":"Rated 4 out of 5 stars","review_title":"t","review_body":"b","review_date_str":"1 March 2025","page_num":$page}"""))
    Files.write(p.resolve("h.json"), lines.mkString("\n").getBytes)
    val fx = new Dsv2FixtureConnector("trustpilot", dir.toString,
      Schemas.trustpilotRaw, pageCapCol = Some("page_num"))
    val df = fx.fetch(spark, c, FetchParams(limit = Some(3)))
    val scan = scanLine(df)
    assert(scan.contains("LessThanOrEqual(page_num,3)"), s"page cap not pushed:\n$scan")
    assert(df.count() == 6) // pages 1-3 × 2 reviews
  }

  test("malformed lines degrade PERMISSIVE-style, same as the v1 reader") {
    val dir = writeFixture(Seq(
      rec(1, "2025-01-01T00:00:00Z"),
      """{"id": 2, "content": NOT VALID JSON""",
      rec(3, "2025-01-03T00:00:00Z")))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(df.columns.sorted.map(col).toSeq: _*).collect().map(_.toString).sorted.toSeq
    val a = canon(v2(dir).fetch(spark, c, FetchParams()))
    val b = canon(v1(dir).fetch(spark, c, FetchParams()))
    assert(a == b, s"corrupt-line handling diverged:\nv2=$a\nv1=$b")
    assert(a.size == 3) // malformed line becomes an all-null row, not a crash
  }

  test("batched fetch pushes the oldest watermark into the scan") {
    val dir = writeFixture((1 to 6).map(i => rec(i, f"2025-01-0${i}T00:00:00Z")))
    val comps = Seq(
      (Company(1, "C", Some("h")), Option(Timestamp.valueOf("2025-01-03 00:00:00"))),
      (Company(2, "G", Some("h")), Option(Timestamp.valueOf("2025-01-05 00:00:00"))))
    val df = v2(dir).fetchAll(spark, comps, None, None)
    val scan = scanLine(df)
    // the min of the two since watermarks (Jan 3) is a literal bound the
    // scan can skip on; the exact per-company filter stays post-join
    assert(scan.contains("GreaterThanOrEqual(date"), s"min-since not pushed:\n$scan")
    assert(scan.contains("2025-01-03"), s"expected the OLDEST watermark as the bound:\n$scan")
  }

  test("DSv2 fetch and fetchAll match the v1 connector row-for-row") {
    val dir = writeFixture(
      (1 to 6).map(i => rec(i, f"2025-01-0${i}T00:00:00Z")),
      Map("g" -> (7 to 9).map(i => rec(i, f"2025-02-0${i - 6}T00:00:00Z"))))
    val params = FetchParams(
      Some(Timestamp.valueOf("2025-01-02 00:00:00")),
      Some(Timestamp.valueOf("2025-02-03 00:00:00")), Some(2))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(df.columns.sorted.map(col).toSeq: _*).collect().map(_.toString).sorted.toSeq
    assert(canon(v2(dir).fetch(spark, c, params)) == canon(v1(dir).fetch(spark, c, params)))

    val comps = Seq(
      (Company(1, "C", Some("h")), Option(Timestamp.valueOf("2025-01-02 00:00:00"))),
      (Company(2, "G", Some("g")), Option.empty[Timestamp]))
    val until = Some(Timestamp.valueOf("2025-02-03 00:00:00"))
    assert(canon(v2(dir).fetchAll(spark, comps, until, Some(2))) ==
      canon(v1(dir).fetchAll(spark, comps, until, Some(2))))
  }
}
