package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The async start→poll→fetch run lifecycle of the reference's Apify-style
  * connectors (S7/S8/S10/S11): `instagram_scraper.py:36-53` and
  * `google_maps_scraper.py:36-45` start a remote actor run, poll its
  * status on a fixed cadence (2 s) until it reports SUCCEEDED, then
  * download the run's dataset items — with a timeout abort so a hung run
  * cannot wedge the pipeline. Earlier rounds flattened this into a
  * synchronous fetch; this seam models the state machine itself, with the
  * clock and sleeper injected so the hermetic tests drive a poll sequence
  * (including the timeout-abort path) without wall-clock sleeping or
  * network (`ConnectorSpec`).
  */
object AsyncPoll {

  sealed trait RunStatus
  case object Running extends RunStatus
  case object Succeeded extends RunStatus
  final case class Failed(reason: String) extends RunStatus

  final class PollTimeoutException(platform: String, runId: String, timeoutMs: Long)
    extends RuntimeException(
      s"$platform run $runId still RUNNING after ${timeoutMs}ms; aborted")

  final class RunFailedException(platform: String, runId: String, reason: String)
    extends RuntimeException(s"$platform run $runId FAILED: $reason")

  /** The remote-run client: what an Apify-like HTTP binding implements.
    * `startRun` returns the run id the poll loop tracks; `fetchDataset`
    * downloads a SUCCEEDED run's items as a DataFrame.
    */
  trait AsyncRunClient {
    def startRun(company: Company, params: FetchParams): String
    def runStatus(runId: String): RunStatus
    def abortRun(runId: String): Unit
    def fetchDataset(spark: SparkSession, runId: String): DataFrame
  }
}

/** SourceConnector facade over the async-run lifecycle: `fetch` starts one
  * run and polls it to completion; `fetchAll` starts ALL companies' runs
  * up front (the runs execute remotely in parallel — the efficient shape
  * the reference's serial per-company loop leaves on the table) and polls
  * them round-robin on one shared cadence, aborting whatever still runs at
  * the deadline.
  *
  * `nowMs`/`sleepMs` are injected: production wiring passes the system
  * clock and Thread.sleep; tests pass a virtual clock so the cadence and
  * timeout arithmetic is asserted, not approximated. The status check runs
  * BEFORE the first sleep, so an already-completed run (the fixture-backed
  * client's default) costs zero sleeps — the production pipelines wire
  * through this connector without slowing the hermetic goldens down.
  */
final class AsyncPollConnector(
    val platform: String,
    client: AsyncPoll.AsyncRunClient,
    pollEveryMs: Long = 2000, // instagram_scraper.py:47 cadence
    timeoutMs: Long = 120000,
    nowMs: () => Long = () => System.currentTimeMillis(),
    sleepMs: Long => Unit = Thread.sleep)
  extends SourceConnector {

  import AsyncPoll._

  /** Poll the given runs until all are terminal; abort and throw on
    * deadline. Returns unit — callers fetch datasets of succeeded runs.
    */
  private def awaitAll(runs: Seq[String]): Unit = {
    val deadline = nowMs() + timeoutMs
    var pending = runs
    while (pending.nonEmpty) {
      val stillRunning = pending.filter { id =>
        client.runStatus(id) match {
          case Running          => true
          case Succeeded        => false
          case Failed(reason)   => throw new RunFailedException(platform, id, reason)
        }
      }
      if (stillRunning.isEmpty) return
      if (nowMs() >= deadline) {
        stillRunning.foreach(client.abortRun)
        throw new PollTimeoutException(platform, stillRunning.head, timeoutMs)
      }
      sleepMs(math.min(pollEveryMs, deadline - nowMs()))
      pending = stillRunning
    }
  }

  def fetch(spark: SparkSession, company: Company, params: FetchParams): DataFrame = {
    val runId = client.startRun(company, params)
    awaitAll(Seq(runId))
    client.fetchDataset(spark, runId)
  }

  override def fetchAll(
      spark: SparkSession,
      companies: Seq[(Company, Option[Timestamp])],
      until: Option[Timestamp],
      limit: Option[Int]): DataFrame = {
    import SourceConnector._
    require(companies.nonEmpty, s"$platform.fetchAll requires at least one company")
    val started = companies.map { case (c, since) =>
      (c, client.startRun(c, FetchParams(since, until, limit)))
    }
    awaitAll(started.map(_._2))
    started.map { case (c, runId) =>
      client.fetchDataset(spark, runId)
        .withColumn(CompanyId, lit(c.id))
        .withColumn(CompanyName, lit(c.name))
        .withColumn(CompanyHandle, lit(c.handle.orNull))
    }.reduce(_ unionByName _)
  }
}

/** Hermetic stand-in for the remote actor: runs "execute" instantly (or
  * follow a scripted status sequence per handle), and a SUCCEEDED run's
  * dataset is the wrapped fixture connector's fetch — the same
  * schema-on-read JSON the synchronous path uses, so normalizers and
  * goldens see identical data through the async seam.
  *
  * `statusScript` maps a company handle to the statuses its run reports on
  * successive polls (last element repeats); absent handles succeed on the
  * first poll. `abortedRuns` records timeout aborts for assertion.
  */
final class FixtureRunClient(
    underlying: SourceConnector,
    statusScript: Map[String, Seq[AsyncPoll.RunStatus]] = Map.empty)
  extends AsyncPoll.AsyncRunClient {

  import AsyncPoll._

  private val seq = new java.util.concurrent.atomic.AtomicLong()
  private val runs = scala.collection.concurrent.TrieMap.empty[String, (Company, FetchParams)]
  private val polls = scala.collection.concurrent.TrieMap.empty[String, Int]
  val abortedRuns = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  def startRun(company: Company, params: FetchParams): String = {
    val id = s"${underlying.platform}-run-${seq.incrementAndGet()}"
    runs.put(id, (company, params))
    id
  }

  def runStatus(runId: String): RunStatus = {
    val (company, _) = runs(runId)
    val script = company.handle.flatMap(statusScript.get).getOrElse(Seq(Succeeded))
    val i = polls.getOrElse(runId, 0)
    polls.put(runId, i + 1)
    script(math.min(i, script.length - 1))
  }

  def abortRun(runId: String): Unit = { abortedRuns.put(runId, true); () }

  def fetchDataset(spark: SparkSession, runId: String): DataFrame = {
    val (company, params) = runs(runId)
    underlying.fetch(spark, company, params)
  }
}
