package graft.ingest

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.schema.Schemas

/** Pins the connector's pushdown boundary semantics (SURVEY.md §2.1):
  * `since` is inclusive, `until` exclusive (the reference's
  * watermark → now window), null event times pass through to the
  * normalizer's F-filters, limits cap newest-first, and a missing fixture
  * yields an empty frame with the right schema.
  */
class ConnectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeFixture(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-conn")
    val p = dir.resolve("twitter3"); p.toFile.mkdirs()
    Files.write(p.resolve("h.json"), lines.mkString("\n").getBytes)
    dir.toString
  }

  private def connector(dir: String) =
    new FixtureConnector("twitter3", dir, Schemas.twitter3Raw,
      eventTime = Some(org.apache.spark.sql.functions.col("date")))

  private val c = Company(1, "C", Some("h"))
  private def rec(id: Long, iso: String) =
    s"""{"id":$id,"content":"x","date":"$iso","url":"u","user":{"username":"n"}}"""

  test("since inclusive, until exclusive, null event time passes") {
    val dir = writeFixture(Seq(
      rec(1, "2025-01-01T00:00:00Z"), // == since: kept
      rec(2, "2025-02-01T00:00:00Z"), // inside
      rec(3, "2025-03-01T00:00:00Z"), // == until: dropped
      rec(4, "2024-12-31T23:59:59Z"), // before since: dropped
      """{"id":5,"content":"no date","url":"u","user":{"username":"n"}}"""))
    val got = connector(dir).fetch(spark, c, FetchParams(
        Some(Timestamp.valueOf("2025-01-01 00:00:00")),
        Some(Timestamp.valueOf("2025-03-01 00:00:00")), None))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == Set(1L, 2L, 5L))
  }

  test("limit keeps the newest records") {
    val dir = writeFixture((1 to 6).map(i => rec(i, f"2025-01-0${i}T00:00:00Z")))
    val got = connector(dir).fetch(spark, c, FetchParams(limit = Some(2)))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == Set(5L, 6L)) // newest-first cap (twitter3 early-exit shape)
  }

  test("missing fixture or handle yields an empty, correctly-typed frame") {
    val dir = Files.createTempDirectory("graft-conn-empty").toString
    val none = connector(dir).fetch(spark, c, FetchParams())
    assert(none.count() == 0 && none.schema == Schemas.twitter3Raw)
    val noHandle = connector(dir).fetch(spark, Company(2, "X", None), FetchParams())
    assert(noHandle.count() == 0)
  }
}
