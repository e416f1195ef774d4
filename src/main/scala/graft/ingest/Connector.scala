package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Fetch-window parameters pushed down to the source (SURVEY.md §4):
  * the reference threads (since, until, limit) into every scraper —
  * `since:`/`until:` in the Apify query (scrapers/twitter_scraper.py:27,35),
  * `onlyPostsNewerThan` (facebook_scraper.py:33), maxItems/resultsLimit/
  * page caps (§2.8 L2-L3). `limit` is in the platform's natural cap unit
  * (items for APIs, pages for the HTML sources).
  */
final case class FetchParams(
    since: Option[Timestamp] = None,
    until: Option[Timestamp] = None,
    limit: Option[Int] = None)

/** One tracked company from the control table (the reference's `users` row
  * driving each per-company task — tasks.py:109-119).
  */
final case class Company(
    id: Int,
    name: String,
    handle: Option[String])

/** A source of raw per-company records. The reference's ten scrapers (the
  * scrapers directory) are network clients; here the same contract is backed
  * by fixture files so the pipeline is testable hermetically — the pushdown
  * semantics (window filter, newest-first cap, early exit) are the part the
  * engine owns either way.
  */
trait SourceConnector {
  def platform: String
  def fetch(spark: SparkSession, company: Company, params: FetchParams): DataFrame
}

/** Fixture-backed connector: reads JSON-lines payloads with an explicit
  * schema (schema-on-read, PERMISSIVE) from
  * `<dir>/<platform>/<sanitized-handle>[suffix].json`, then applies the
  * pushed-down params:
  *  - `since`/`until` filter on `eventTime` (null event times pass through —
  *    required-field drops are the normalizer's F3-F9 filters, not the
  *    window's);
  *  - `limit` newest-first (orderBy eventTime desc + unique `tiebreak`,
  *    limit) — the reference's maxItems caps and twitter3's ordered
  *    early-exit (scrapers/twitter3_scraper.py:43-44,65-66) both reduce to
  *    this; the tiebreak makes the cut at the limit boundary deterministic
  *    across repeated fetches of the same window, which the sink-idempotence
  *    guarantee relies on (a tie kept one run and dropped the next would
  *    look like a new record);
  *  - multiple suffixes are unioned (Reddit's dual query,
  *    scrapers/reddit_scraper.py:66).
  * A custom `applyLimit` overrides the cap semantics (page-ranged HTML
  * sources cap on page_num — tasks.py:63,128,145).
  */
final class FixtureConnector(
    val platform: String,
    dir: String,
    schema: StructType,
    eventTime: Option[Column] = None,
    suffixes: Seq[String] = Seq(""),
    applyLimit: Option[(DataFrame, Int) => DataFrame] = None,
    tiebreak: Seq[Column] = Nil)
  extends SourceConnector {

  private def sanitize(h: String): String = h.replaceAll("[^A-Za-z0-9._-]", "_")

  private def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  def fetch(spark: SparkSession, company: Company, params: FetchParams): DataFrame = {
    val paths = company.handle.toSeq.flatMap { h =>
      suffixes.map(sfx => s"$dir/$platform/${sanitize(h)}$sfx.json")
    }.filter(p => new java.io.File(p).isFile)
    if (paths.isEmpty) return empty(spark)
    val raw = spark.read.schema(schema).json(paths: _*)
    val windowed = eventTime match {
      case Some(et) =>
        val afterSince = params.since.map(t => raw.filter(et.isNull || et >= lit(t))).getOrElse(raw)
        params.until.map(t => afterSince.filter(et.isNull || et < lit(t))).getOrElse(afterSince)
      case None => raw
    }
    params.limit match {
      case Some(n) =>
        applyLimit match {
          case Some(f) => f(windowed, n)
          case None =>
            eventTime match {
              case Some(et) =>
                windowed.orderBy(et.desc_nulls_last +: tiebreak: _*).limit(n)
              case None => windowed.limit(n)
            }
        }
      case None => windowed
    }
  }
}
