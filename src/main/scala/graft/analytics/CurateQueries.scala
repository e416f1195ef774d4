package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Training-data curation operators over the `documents` corpus — the
  * dataset-preparation tier a 100-TB pretraining pipeline runs between
  * dedup and tokenization: deterministic splits, PII scrubbing, and
  * sequence packing.
  *
  * Determinism: everything below is a pure function of the input rows —
  * splits order on md5 (cross-engine stable), no RNG anywhere — so
  * re-running any stage on the same corpus reproduces the same dataset
  * bit-for-bit (the property that makes a data recipe auditable).
  */
object CurateQueries {

  /** CU1: exact stratified train/val/test split — 80/10/10 WITHIN each
    * language stratum (per-stratum exact counts, not per-row coin flips:
    * a proportional hash split drifts on small strata, and training-mix
    * ratios are a contract). Rows rank inside their stratum by
    * md5(doc_id) — a deterministic shuffle — and the boundaries are
    * integer ceilings, so both engines compute identical assignments.
    *
    * Scale: one shuffle on the stratum key. Strata are language-sized
    * (huge but few); the rank is the same single window a 1000-executor
    * sort runs per partition — for a truly skewed stratum switch to the
    * two-phase salted rank (l3's pattern) and distribute the boundary
    * arithmetic per salt bucket.
    */
  val splitStratified: QueryDef = QueryDef(
    "cu_split_stratified",
    """SELECT doc_id, lang,
      |  CASE WHEN rn <= (4 * cnt + 4) // 5 THEN 'train'
      |       WHEN rn <= (9 * cnt + 9) // 10 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS cnt
      |  FROM documents) t""".stripMargin) { (s, dir) =>
    val order = Seq(md5(col("doc_id").cast(StringType)), col("doc_id"))
    val w = Window.partitionBy("lang").orderBy(order.map(_.asc): _*)
    val cw = Window.partitionBy("lang")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(cw))
      .select(col("doc_id"), col("lang"),
        when(col("rn") <= expr("(4 * cnt + 4) div 5"), lit("train"))
          .when(col("rn") <= expr("(9 * cnt + 9) div 10"), lit("val"))
          .otherwise(lit("test")).as("split"))
  }

  // PII patterns, written in the common subset of Java regex (Spark) and
  // RE2 (DuckDB): character classes, bounded repetition, \b word
  // boundaries — no backrefs, no lookaround.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** CU2: PII redaction — scrub emails and IPs to placeholder tokens
    * before a corpus ships to training. The synthetic corpus carries no
    * PII, so the query PLANTS deterministic contact lines first and then
    * proves the scrub: per-doc match counts plus an md5 of the redacted
    * text (hash-exact across engines). Scan → project, codegen regexes,
    * no shuffle at all except the final noop.
    */
  val piiRedact: QueryDef = QueryDef(
    "cu_pii_redact",
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
       |    '@example.com from host 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
       |    '.7' AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_split_to_array(t, '$EmailRe')) - 1 AS BIGINT) AS n_email,
       |  CAST(len(regexp_split_to_array(t, '$IpRe')) - 1 AS BIGINT) AS n_ip,
       |  md5(regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
       |      '$IpRe', '<IP>', 'g')) AS redacted_md5
       |FROM planted""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast(StringType),
          lit("@example.com from host 10.0."),
          (col("doc_id") % 256).cast(StringType), lit(".7")).as("t"))
      .select(col("doc_id"),
        (size(split(col("t"), EmailRe)) - 1).cast("long").as("n_email"),
        (size(split(col("t"), IpRe)) - 1).cast("long").as("n_ip"),
        md5(regexp_replace(regexp_replace(col("t"), EmailRe, "<EMAIL>"),
          IpRe, "<IP>")).as("redacted_md5"))
  }

  /** CU3: sequence packing — concatenate documents in a deterministic
    * order and chop into fixed-capacity token chunks (the pretraining
    * "pack to context window" step). A document lands in the chunk where
    * its first token falls: chunk = tokens-before-this-doc div capacity.
    *
    * Scale: packing is per-stratum (PARTITION BY lang), so the running
    * sum parallelizes across strata instead of funneling the corpus
    * through one global window; a production packer buckets by
    * hash(doc_id) first and packs within buckets — same plan shape, any
    * parallelism you want — because chunk membership only needs SOME
    * deterministic order, not a global one.
    */
  val packChunks: QueryDef = QueryDef(
    "cu_pack_chunks",
    """SELECT lang, chunk, COUNT(*) AS n_docs,
      |  CAST(SUM(toks) AS BIGINT) AS chunk_tokens,
      |  MIN(doc_id) AS first_doc
      |FROM (
      |  SELECT lang, doc_id, toks,
      |    (CAST(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - toks) // 2048
      |      AS chunk
      |  FROM (SELECT lang, doc_id,
      |          CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      |        FROM documents) d) p
      |GROUP BY lang, chunk""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .withColumn("chunk", expr("(sum(toks) over (partition by lang order by doc_id rows between unbounded preceding and current row) - toks) div 2048"))
      .groupBy("lang", "chunk")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("chunk_tokens"),
        min("doc_id").as("first_doc"))
  }

  val defs: Seq[QueryDef] = Seq(splitStratified, piiRedact, packChunks)
}
