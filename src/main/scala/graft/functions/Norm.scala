package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Normalization library: the reference's per-record scalar surface
  * (SURVEY.md §2.2/§2.10) as composable `Column` combinators — all Spark
  * built-ins, zero UDFs, fully inside whole-stage codegen.
  *
  * Each combinator cites the reference behavior it re-expresses
  * (paths under /root/reference/).
  */
object Norm {

  // ---- date/time (§2.10; the reference's four parse formats) ----

  /** Twitter `"%a %b %d %H:%M:%S %z %Y"` → timestamp
    * (scrapers/twitter_scraper.py:69-70). Invalid input → null (the
    * reference returns None on parse failure), hence the `try_` variant —
    * Spark 4's ANSI mode makes plain to_timestamp THROW on bad input.
    * Spark ≥3.0's parser also rejects day-of-week (`EEE`) on the PARSE side
    * (it's redundant with the date); strip the leading weekday token first.
    */
  def parseTwitterTs(c: Column): Column =
    try_to_timestamp(regexp_replace(c, "^[A-Za-z]{3} ", ""), lit("MMM dd HH:mm:ss Z yyyy"))

  /** Trustpilot `"23 January 2025"` → date (utils/date_utils.py:5-13).
    * Invalid input → null (the reference returns None on ValueError).
    */
  def parseTrustpilotDate(c: Column): Column =
    try_to_date(c, "d MMMM yyyy")

  /** Feefo `"Date of purchase: 15/03/2025"` → date: strip the prefix then
    * parse dd/MM/yyyy (scrapers/feefo_scraper.py:53-57). Invalid → null.
    */
  def parseFeefoDate(c: Column): Column =
    try_to_date(regexp_replace(c, "^Date of purchase: ", ""), "dd/MM/yyyy")

  /** Reddit epoch-seconds → timestamp (scrapers/reddit_scraper.py:84-88). */
  def epochSecTs(c: Column): Column = timestamp_seconds(c.cast(LongType))

  /** LinkedIn epoch-milliseconds → timestamp
    * (scrapers/linkedin_scraper.py:74-80, utils/db_helpers.py:289).
    */
  def epochMsTs(c: Column): Column = timestamp_millis(c.cast(LongType))

  // ---- arrays / nested (§2.2 P2, P9, P10) ----

  /** First element of `arr` satisfying `pred`, else null — the reference's
    * "scan media list for first match" loops
    * (scrapers/twitter_scraper.py:89-94, facebook_scraper.py:89-97).
    * `try_element_at`: under ANSI mode plain element_at THROWS when the
    * filtered array is empty; the reference's loop yields None.
    */
  def firstWhere(arr: Column, pred: Column => Column): Column =
    try_element_at(filter(arr, pred), lit(1))

  /** Null-safe first element (empty or null array → null). */
  def first(arr: Column): Column = try_element_at(arr, lit(1))

  // ---- strings (§2.10) ----

  /** Trustpilot star rating from img alt text `"Rated 4 out of 5 stars"` →
    * int (scrapers/trustpilot_scraper.py:75-78: split on space, take [1],
    * int() wrapped in try/except → None). try_cast, not cast: a
    * non-numeric token ("Translated review", "4.5") must yield null like
    * the reference, not throw under ANSI mode.
    */
  def ratingFromAlt(c: Column): Column =
    try_element_at(split(c, " "), lit(2)).try_cast("int")

  /** Reddit permalink → absolute URL (scrapers/reddit_scraper.py:90). */
  def redditUrl(permalink: Column): Column =
    concat(lit("https://www.reddit.com"), permalink)

  /** LinkedIn author display name: first+last joined, nulls AND empty
    * strings skipped (scrapers/linkedin_scraper.py:91-94 filters falsy
    * parts — concat_ws skips only nulls, so "" must be folded to null
    * first or a missing first name leaves a leading space).
    */
  def fullName(first: Column, last: Column): Column =
    concat_ws(" ", nullif(first, lit("")), nullif(last, lit("")))

  /** Null-safe count default: the reference's `get(..., 0) or 0`
    * (scrapers/instagram_scraper.py:106-107, linkedin_scraper.py:99-106).
    */
  def orZero(c: Column): Column = coalesce(c.cast(IntegerType), lit(0))

  /** Text cleaning (fills the reference's empty preprocessors/clean.py):
    * lowercase, strip non-word/space runs, collapse whitespace, trim.
    */
  def cleanText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^\\p{L}\\p{N}\\s]+", " "), "\\s+", " "))
}
