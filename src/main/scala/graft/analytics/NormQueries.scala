package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.Norm

/** The reference's normalization surface (SURVEY.md §2.2 P1–P13, §2.4 X1–X2,
  * §2.10 scalar families) exercised as oracle-checked queries over the test
  * tables. The string inputs the reference parses (dates, alt-texts, URLs)
  * are *constructed* from table columns first — deterministically, with the
  * identical expression on the DuckDB side — then pushed through the same
  * parse path the ingest tier uses (graft.functions.Norm).
  *
  * Scale: every query here is scan → project (all codegen'd built-ins) with
  * at most one partial-aggregable groupBy; no shuffles beyond the final agg.
  */
object NormQueries {

  /** P5 (Trustpilot "23 January 2025", utils/date_utils.py:5-13) and
    * P6 (Feefo prefix-strip + dd/MM/yyyy, scrapers/feefo_scraper.py:53-57):
    * format → parse round-trips.
    */
  val dateRoundtrip: QueryDef = QueryDef(
    "p5_p6_date_roundtrip",
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%-d %B %Y') AS tp_str,
      |  CAST(strptime(strftime(o_orderdate, '%-d %B %Y'), '%-d %B %Y') AS DATE) AS tp_date,
      |  'Date of purchase: ' || strftime(o_orderdate, '%d/%m/%Y') AS feefo_str,
      |  CAST(strptime(replace('Date of purchase: ' || strftime(o_orderdate, '%d/%m/%Y'), 'Date of purchase: ', ''), '%d/%m/%Y') AS DATE) AS feefo_date
      |FROM orders WHERE o_orderkey % 19 = 0""".stripMargin) { (s, dir) =>
    val tpStr = date_format(col("o_orderdate"), "d MMMM yyyy")
    val feefoStr = concat(lit("Date of purchase: "), date_format(col("o_orderdate"), "dd/MM/yyyy"))
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 19 === 0)
      .select(
        col("o_orderkey"),
        tpStr.as("tp_str"),
        Norm.parseTrustpilotDate(tpStr).as("tp_date"),
        feefoStr.as("feefo_str"),
        Norm.parseFeefoDate(feefoStr).as("feefo_date"))
  }

  /** P3: Twitter `"%a %b %d %H:%M:%S %z %Y"` → UTC timestamp
    * (scrapers/twitter_scraper.py:69-70), emitted as epoch millis (exact
    * integer — no tz-representation ambiguity in the compare).
    */
  val twitterTsParse: QueryDef = QueryDef(
    "p3_twitter_ts_parse",
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%a %b %d %H:%M:%S') || ' +0000 ' || strftime(o_orderdate, '%Y') AS tw_str,
      |  CAST(epoch_ms(strptime(strftime(o_orderdate, '%a %b %d %H:%M:%S') || ' +0000 ' || strftime(o_orderdate, '%Y'), '%a %b %d %H:%M:%S %z %Y')) AS BIGINT) AS tw_epoch_ms
      |FROM orders WHERE o_orderkey % 23 = 0""".stripMargin) { (s, dir) =>
    val twStr = concat(
      date_format(col("o_orderdate"), "EEE MMM dd HH:mm:ss"),
      lit(" +0000 "),
      date_format(col("o_orderdate"), "yyyy"))
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 23 === 0)
      .select(
        col("o_orderkey"),
        twStr.as("tw_str"),
        unix_millis(Norm.parseTwitterTs(twStr)).as("tw_epoch_ms"))
  }

  /** P8 (Reddit epoch-seconds, scrapers/reddit_scraper.py:84-88) + P11
    * (LinkedIn epoch-millis, scrapers/linkedin_scraper.py:74-80): epoch unit
    * conversions both directions.
    */
  val epochUnits: QueryDef = QueryDef(
    "p8_p11_epoch_units",
    """SELECT event_id,
      |  CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
      |  CAST(epoch_ms(ts) AS BIGINT) // 1000 AS ts_sec,
      |  make_timestamp(CAST(epoch_ms(ts) AS BIGINT) * 1000) AS ms_roundtrip,
      |  make_timestamp((CAST(epoch_ms(ts) AS BIGINT) // 1000) * 1000000) AS sec_roundtrip
      |FROM events WHERE event_id % 7 = 0""".stripMargin) { (s, dir) =>
    val ms = unix_millis(col("ts"))
    Tables.events(s, dir)
      .filter(col("event_id") % 7 === 0)
      .select(
        col("event_id"),
        ms.as("ts_ms"),
        expr("unix_millis(ts) div 1000").as("ts_sec"),
        Norm.epochMsTs(ms).as("ms_roundtrip"),
        Norm.epochSecTs(expr("unix_millis(ts) div 1000")).as("sec_roundtrip"))
  }

  /** P7: null-coalescing alias projection (`id or shortCode`, counts
    * defaulting 0 — scrapers/instagram_scraper.py:102-109) + conditional
    * null introduction (the alias-field-missing case).
    */
  val coalesceAlias: QueryDef = QueryDef(
    "p7_coalesce_alias",
    """SELECT c_custkey,
      |  COALESCE(CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END, c_name) AS handle,
      |  COALESCE(CASE WHEN c_custkey % 2 = 0 THEN NULL ELSE c_acctbal END, CAST(0 AS DOUBLE)) AS bal0,
      |  COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg
      |FROM customer""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).select(
      col("c_custkey"),
      coalesce(when(col("c_custkey") % 3 === 0, lit(null)).otherwise(col("c_mktsegment")), col("c_name")).as("handle"),
      coalesce(when(col("c_custkey") % 2 === 0, lit(null)).otherwise(col("c_acctbal")), lit(0.0)).as("bal0"),
      coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("seg"))
  }

  /** P4 + §2.10 string family: the Trustpilot `split(alt)[1]` rating parse
    * (scrapers/trustpilot_scraper.py:75-78), regexp_replace, split+index,
    * URL building (f-string analog, trustpilot_scraper.py:37-38), concat_ws.
    */
  val stringSurface: QueryDef = QueryDef(
    "p4_string_surface",
    """SELECT p_partkey,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
      |  string_split(p_name, ' ')[1] AS first_word,
      |  string_split(p_name, ' ')[2] AS second_word,
      |  upper(trim(p_name)) AS up,
      |  'https://example.com/part/' || replace(lower(p_name), ' ', '-') AS url,
      |  concat_ws('|', p_brand, p_type, CASE WHEN p_size % 2 = 0 THEN NULL ELSE p_name END) AS joined,
      |  CAST(string_split('Rated ' || CAST(p_size AS VARCHAR) || ' out of 5 stars', ' ')[2] AS INTEGER) AS rating
      |FROM part WHERE p_partkey % 11 = 0""".stripMargin) { (s, dir) =>
    val alt = concat(lit("Rated "), col("p_size").cast(StringType), lit(" out of 5 stars"))
    Tables.part(s, dir)
      .filter(col("p_partkey") % 11 === 0)
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
        try_element_at(split(col("p_name"), " "), lit(1)).as("first_word"),
        try_element_at(split(col("p_name"), " "), lit(2)).as("second_word"),
        upper(trim(col("p_name"))).as("up"),
        concat(lit("https://example.com/part/"), replace(lower(col("p_name")), lit(" "), lit("-"))).as("url"),
        concat_ws("|",
          col("p_brand"), col("p_type"),
          when(col("p_size") % 2 === 0, lit(null)).otherwise(col("p_name"))).as("joined"),
        Norm.ratingFromAlt(alt).as("rating"))
  }

  /** §2.10 json: the reference's `resp.json()` + `.get()` chains
    * (every API scraper) as JSON-path extraction over `events.props`.
    *
    * The extraction is projected ONCE before the groupBy: Spark has no
    * cross-aggregate subexpression elimination, so putting the
    * `get_json_object` inside both `sum` and `count` parses every row's JSON
    * twice inside the aggregate (measured 6.8 s → ~1 s at sf0.1). The oracle
    * SUM is cast to BIGINT because DuckDB widens SUM(BIGINT) to HUGEINT.
    */
  val jsonProps: QueryDef = QueryDef(
    "p14_json_props",
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count("k").as("n_k"))
  }

  /** X2: flatten a nested collection and aggregate — the Reddit
    * `data.children[].data` unwrap (scrapers/reddit_scraper.py:54-55,78-81)
    * as explode(split(text)) → word counts. Plan contains a Generate node;
    * the groupBy is partial-aggregable (map-side combine before shuffle).
    */
  val explodeWordcount: QueryDef = QueryDef(
    "x2_explode_wordcount",
    """SELECT word, COUNT(*) AS n, MIN(doc_id) AS first_doc
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
      |GROUP BY word""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"))
  }

  /** X1: union of two array-valued fields then flatten — the Instagram
    * `topPosts ∪ latestPosts` shape (scrapers/instagram_scraper.py:78-92):
    * here two derived word sublists, concatenated pre-explode.
    */
  val concatExplode: QueryDef = QueryDef(
    "x1_concat_explode",
    """SELECT doc_id, COUNT(*) AS n_flat
      |FROM (SELECT doc_id,
      |        unnest(list_concat(
      |          list_filter(string_split(text, ' '), w -> length(w) >= 6),
      |          list_filter(string_split(text, ' '), w -> w LIKE 's%'))) AS w
      |      FROM documents) t
      |GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val words = split(col("text"), " ")
    val top = filter(words, w => length(w) >= 6)
    val latest = filter(words, w => w.startsWith("s"))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(concat(top, latest)).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_flat"))
  }

  /** P15: the date-arithmetic scalar family (§2.10 date surface beyond
    * parsing) — interval shift, month-end snap, quarter/ISO-weekday
    * extraction, formatting, day deltas. Cross-engine notes pinned in the
    * expressions: Spark `weekday()` is 0=Monday (ISO dow = weekday+1,
    * DuckDB `isodow`), `datediff(end, start)` argument order matches
    * `date_diff('day', start, end)`. Pure scan → project, all codegen'd.
    */
  val dateArith: QueryDef = QueryDef(
    "p15_date_arith",
    """SELECT o_orderkey,
      |  o_orderdate + INTERVAL 7 DAY AS plus7,
      |  last_day(o_orderdate) AS eom,
      |  quarter(o_orderdate) AS q,
      |  CAST(isodow(o_orderdate) AS INT) AS dow,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  CAST(date_diff('day', DATE '1996-01-01', o_orderdate) AS BIGINT) AS days_since
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      (col("o_orderdate") + expr("interval 7 days")).as("plus7"),
      last_day(col("o_orderdate")).as("eom"),
      quarter(col("o_orderdate")).as("q"),
      (weekday(col("o_orderdate")) + 1).as("dow"),
      date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
      datediff(col("o_orderdate"), lit("1996-01-01")).cast(LongType).as("days_since"))
  }

  val defs: Seq[QueryDef] = Seq(
    dateRoundtrip, twitterTsParse, epochUnits, coalesceAlias,
    stringSurface, jsonProps, explodeWordcount, concatExplode, dateArith)
}
