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

  test("fetchAll matches the per-company contract row-for-row") {
    val dir = writeFixture((1 to 6).map(i => rec(i, f"2025-01-0${i}T00:00:00Z")))
    val p = dir + "/twitter3"
    Files.write(java.nio.file.Paths.get(p, "g.json"),
      (7 to 9).map(i => rec(i, f"2025-02-0${i - 6}T00:00:00Z")).mkString("\n").getBytes)
    val fx = connector(dir)
    val comps = Seq(
      (Company(1, "C", Some("h")), Option(Timestamp.valueOf("2025-01-02 00:00:00"))),
      (Company(2, "G", Some("g")), Option.empty[Timestamp]))
    // the trait default IS the per-company union — wrap fetch to reach it
    val perCompany = new SourceConnector {
      def platform = fx.platform
      def fetch(s: org.apache.spark.sql.SparkSession, co: Company, pr: FetchParams) =
        fx.fetch(s, co, pr)
    }
    val until = Some(Timestamp.valueOf("2025-02-03 00:00:00"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col).toSeq: _*)
        .collect().map(_.toString).sorted.toSeq
    assert(canon(fx.fetchAll(spark, comps, until, Some(2))) ==
      canon(perCompany.fetchAll(spark, comps, until, Some(2))))
  }

  // ---- async start→poll→fetch seam (instagram/google_maps shape) --------

  private class VirtualClock {
    var now = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    def sleep(ms: Long): Unit = { sleeps += ms; now += ms }
  }

  private def asyncConn(dir: String, script: Map[String, Seq[AsyncPoll.RunStatus]],
                        clock: VirtualClock, timeoutMs: Long = 10000) = {
    val client = new FixtureRunClient(connector(dir), script)
    (new AsyncPollConnector("twitter3", client, pollEveryMs = 2000,
      timeoutMs = timeoutMs, nowMs = () => clock.now, sleepMs = clock.sleep), client)
  }

  test("async poll loop: RUNNING x2 then SUCCEEDED fetches the dataset on cadence") {
    import AsyncPoll._
    val dir = writeFixture((1 to 3).map(i => rec(i, f"2025-01-0${i}T00:00:00Z")))
    val clock = new VirtualClock
    val (conn, client) = asyncConn(dir,
      Map("h" -> Seq(Running, Running, Succeeded)), clock)
    val got = conn.fetch(spark, c, FetchParams())
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == Set(1L, 2L, 3L), "dataset must be the wrapped fixture fetch")
    // two RUNNING polls → exactly two cadence sleeps, nothing aborted
    assert(clock.sleeps.toSeq == Seq(2000L, 2000L))
    assert(client.abortedRuns.isEmpty)
  }

  test("async poll loop: deadline aborts a hung run") {
    import AsyncPoll._
    val dir = writeFixture(Seq(rec(1, "2025-01-01T00:00:00Z")))
    val clock = new VirtualClock
    val (conn, client) = asyncConn(dir,
      Map("h" -> Seq(Running)), clock, timeoutMs = 5000) // RUNNING forever
    val ex = intercept[PollTimeoutException] {
      conn.fetch(spark, c, FetchParams())
    }
    assert(ex.getMessage.contains("aborted"))
    assert(client.abortedRuns.size == 1, "the hung run must be aborted")
    // sleeps never overshoot the deadline: 2000, 2000, then the 1000 tail
    assert(clock.sleeps.toSeq == Seq(2000L, 2000L, 1000L))
  }

  test("async poll loop: a FAILED run surfaces its reason") {
    import AsyncPoll._
    val dir = writeFixture(Seq(rec(1, "2025-01-01T00:00:00Z")))
    val clock = new VirtualClock
    val (conn, _) = asyncConn(dir,
      Map("h" -> Seq(Running, Failed("actor crashed"))), clock)
    val ex = intercept[RunFailedException] {
      conn.fetch(spark, c, FetchParams())
    }
    assert(ex.getMessage.contains("actor crashed"))
  }

  test("async fetchAll starts every run up front and shares the poll cadence") {
    import AsyncPoll._
    val dir = Files.createTempDirectory("graft-conn-async")
    val p = dir.resolve("twitter3"); p.toFile.mkdirs()
    Files.write(p.resolve("h.json"), rec(1, "2025-01-01T00:00:00Z").getBytes)
    Files.write(p.resolve("g.json"), rec(2, "2025-01-02T00:00:00Z").getBytes)
    val clock = new VirtualClock
    // h completes on poll 2, g on poll 3 — ONE shared cadence, not per-run
    val (conn, _) = asyncConn(dir.toString,
      Map("h" -> Seq(Running, Succeeded), "g" -> Seq(Running, Running, Succeeded)),
      clock)
    val comps = Seq(
      (Company(1, "H", Some("h")), Option.empty[Timestamp]),
      (Company(2, "G", Some("g")), Option.empty[Timestamp]))
    val got = conn.fetchAll(spark, comps, None, None)
      .select("id", SourceConnector.CompanyName).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(got == Set(1L -> "H", 2L -> "G"))
    assert(clock.sleeps.toSeq == Seq(2000L, 2000L),
      "two poll rounds with pending runs → two shared sleeps")
  }

  test("fetchAll plan size is O(1) in company count (500-company control table)") {
    val dir = writeFixture((1 to 6).map(i => rec(i, f"2025-01-0${i}T00:00:00Z")))
    val fx = connector(dir)
    val comps = (1 to 500).map { i =>
      val handle = if (i == 1) "h" else s"ghost$i" // 499 companies have no fixture
      (Company(i, s"C$i", Some(handle)), Option.empty[Timestamp])
    }
    val t0 = System.nanoTime()
    val df = fx.fetchAll(spark, comps, Some(Timestamp.valueOf("2026-01-01 00:00:00")), Some(100))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("FileScan")) == 1,
      s"expected ONE scan for 500 companies:\n${plan.take(1500)}")
    assert(df.count() == 6)
    assert((System.nanoTime() - t0) / 1e9 < 60, "bounded planning time")
  }
}
