package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.Norm

/** Text-analysis tier over the `documents` table — the operations a
  * large-scale training-data pipeline runs per document: quality scoring,
  * language ID, token counting, fingerprinting. Fills the reference's empty
  * `preprocessors/clean.py` / `inference/sentiment.py` extension points
  * (SURVEY.md §2.12) with deterministic, codegen-friendly built-ins.
  *
  * Scale: every query is scan → project (+ one partial-aggregable groupBy);
  * ratios are single int→double divisions (bit-identical on both engines),
  * fingerprints are md5 (identical hex on both engines). No UDFs.
  */
object TextQueries {

  private val stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  private def words(c: Column): Column = split(c, " ")
  private def nIn(c: Column, set: Seq[String]): Column =
    size(filter(words(c), w => w.isin(set.map(lit): _*)))

  /** The composite quality score as a shared (Spark expr, oracle SQL)
    * pair — tx_quality_score's `quality` column, also the keeper-choice
    * key in dd_cluster_keep_best. One definition so the two cannot drift.
    */
  private[analytics] def qualityExpr(t: Column): Column = {
    val nWords = size(words(t))
    val stopRatio = nIn(t, stopwords).cast(DoubleType) / nWords
    least(lit(1.0), nWords / lit(200.0)) * (lit(1.0) - stopRatio)
  }
  private[analytics] val QualitySql: String =
    s"""least(CAST(1 AS DOUBLE), length(string_split(text, ' ')) / CAST(200 AS DOUBLE))
       |    * (CAST(1 AS DOUBLE) - CAST(len(list_filter(string_split(text, ' '), w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE) / length(string_split(text, ' ')))""".stripMargin

  /** Per-document quality metrics: token count, average word length,
    * stopword / punctuation / digit ratios, and a composite score — the
    * standard heuristics pre-training corpora filter on (length,
    * symbol density, stopword density).
    */
  val qualityScore: QueryDef = QueryDef(
    "tx_quality_score",
    s"""SELECT doc_id,
       |  length(string_split(text, ' ')) AS n_words,
       |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / length(string_split(text, ' ')) AS avg_word_len,
       |  CAST(len(list_filter(string_split(text, ' '), w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE) / length(string_split(text, ' ')) AS stop_ratio,
       |  CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) AS digit_ratio,
       |  $QualitySql
       |    AS quality
       |FROM documents""".stripMargin) { (s, dir) =>
    val t = col("text")
    val nWords = size(words(t))
    val stopRatio = nIn(t, stopwords).cast(DoubleType) / nWords
    Tables.documents(s, dir).select(
      col("doc_id"),
      nWords.as("n_words"),
      (length(regexp_replace(t, " ", "")).cast(DoubleType) / nWords).as("avg_word_len"),
      stopRatio.as("stop_ratio"),
      (length(regexp_replace(t, "[^.,!?;:]", "")).cast(DoubleType) / length(t)).as("punct_ratio"),
      (length(regexp_replace(t, "[^0-9]", "")).cast(DoubleType) / length(t)).as("digit_ratio"),
      qualityExpr(t).as("quality"))
  }

  /** Character-n-gram language ID: score each candidate language by the
    * frequency of its characteristic bigrams (+ marker words as a second
    * signal), argmax with a fixed precedence tie-break, compared against
    * the labeled `lang` column. Accuracy is a property of the profiles,
    * not the engine — the oracle checks the computation.
    */
  val langId: QueryDef = {
    val profiles = Seq(
      "en" -> (Seq("th", "he", "in"), Seq("the", "a", "is", "of")),
      "de" -> (Seq("ch", "ei", "en"), Seq("der", "die", "das", "und")),
      "es" -> (Seq("ll", "os", "de"), Seq("el", "la", "los", "y")))
    def scoreSql(bigrams: Seq[String], words: Seq[String]) =
      s"len(regexp_extract_all(text, '${bigrams.mkString("|")}'))" +
        s" + 3 * len(list_filter(string_split(text, ' '), w -> w IN (${words.map("'" + _ + "'").mkString(",")})))"
    val Seq(enS, deS, esS) = profiles.map { case (_, (b, w)) => scoreSql(b, w) }
    QueryDef(
      "tx_lang_id",
      s"""SELECT doc_id, lang,
         |  $enS AS en_score,
         |  $deS AS de_score,
         |  $esS AS es_score,
         |  CASE
         |    WHEN $enS >= $deS AND $enS >= $esS THEN 'en'
         |    WHEN $deS >= $esS THEN 'de' ELSE 'es' END AS predicted
         |FROM documents""".stripMargin) { (s, dir) =>
      val t = col("text")
      def score(bigrams: Seq[String], ws: Seq[String]) =
        size(expr(s"regexp_extract_all(text, '${bigrams.mkString("|")}', 0)")) +
          lit(3) * nIn(t, ws)
      val Seq(en, de, es) = profiles.map { case (_, (b, w)) => score(b, w) }
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        en.as("en_score"), de.as("de_score"), es.as("es_score"),
        when(en >= de && en >= es, "en").when(de >= es, "de").otherwise("es").as("predicted"))
    }
  }

  /** Token counting: whitespace tokens, regex word-ish tokens (a BPE-style
    * pre-tokenizer split: letter runs / digit runs / single symbols), and
    * the chars/4 transformer-token estimate.
    */
  val tokenCount: QueryDef = QueryDef(
    "tx_token_count",
    """SELECT source,
      |  CAST(SUM(length(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS re_tokens,
      |  CAST(SUM((length(text) + 3) // 4) AS BIGINT) AS est_bpe_tokens,
      |  COUNT(*) AS n_docs
      |FROM documents GROUP BY source""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy("source")
      .agg(
        sum(size(split(col("text"), " "))).as("ws_tokens"),
        sum(size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))).as("re_tokens"),
        sum(expr("(length(text) + 3) div 4")).as("est_bpe_tokens"),
        count(lit(1)).as("n_docs"))
  }

  /** Document fingerprinting: md5 over raw and cleaned text (identical hex
    * digests on any engine), plus an 80-char-prefix block fingerprint — the
    * cheap first-pass key near-dup pipelines bucket on.
    */
  val fingerprint: QueryDef = QueryDef(
    "tx_fingerprint",
    s"""SELECT doc_id,
       |  md5(text) AS fp_raw,
       |  md5(${DedupQueries.CleanSql}) AS fp_clean,
       |  md5(substr(text, 1, 80)) AS fp_prefix
       |FROM documents""".stripMargin) { (s, dir) =>
    // cleanText uses \p{L}\p{N}; documents are ASCII so the oracle's
    // [a-z0-9 ] after lower() is the same class. \s+ ≡ ' +' on
    // single-line text.
    Tables.documents(s, dir).select(
      col("doc_id"),
      md5(col("text")).as("fp_raw"),
      md5(Norm.cleanText(col("text"))).as("fp_clean"),
      md5(substring(col("text"), 1, 80)).as("fp_prefix"))
  }

  /** Rolling-hash fingerprint via the custom codegen'd Catalyst expression
    * (graft.plans.RollingHash, registered through GraftExtensions). The
    * oracle reproduces the byte fold with a list_reduce over codepoints.
    */
  val rollingHash: QueryDef = QueryDef(
    "tx_rolling_hash",
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
      |    (h, c) -> (h * 31 + c) % 1000000007) AS fp
      |FROM documents""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), call_function("graft_rolling_hash", col("text")).as("fp"))
  }

  private val posLex = Seq("fast", "good", "great", "best")
  private val negLex = Seq("slow", "bad", "worst", "error")

  /** Sentiment scoring (fills the reference's empty inference/sentiment.py
    * extension point): lexicon hit counts per document, rolled up per
    * source — all integer arithmetic plus one exact division.
    */
  val sentiment: QueryDef = {
    def lexSql(words: Seq[String]) =
      s"len(list_filter(string_split(text, ' '), w -> w IN (${words.map("'" + _ + "'").mkString(",")})))"
    QueryDef(
      "tx_sentiment",
      s"""SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN ${lexSql(posLex)} > ${lexSql(negLex)} THEN 1 ELSE 0 END) AS BIGINT) AS pos_docs,
         |  CAST(SUM(CASE WHEN ${lexSql(posLex)} < ${lexSql(negLex)} THEN 1 ELSE 0 END) AS BIGINT) AS neg_docs,
         |  CAST(SUM(${lexSql(posLex)} - ${lexSql(negLex)}) AS DOUBLE) / COUNT(*) AS mean_score
         |FROM documents GROUP BY source""".stripMargin) { (s, dir) =>
      val score = nIn(col("text"), posLex) - nIn(col("text"), negLex)
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(score > 0, 1).otherwise(0)).as("pos_docs"),
          sum(when(score < 0, 1).otherwise(0)).as("neg_docs"),
          (sum(score).cast(DoubleType) / count(lit(1))).as("mean_score"))
    }
  }

  /** The composed corpus-selection pipeline — what a training-data run
    * actually executes per document: quality gate + length gate + block-
    * dedup keeper election, with per-rule flags so drops are auditable.
    */
  val corpusFilter: QueryDef = {
    val stopSql = stopwords.map("'" + _ + "'").mkString(",")
    QueryDef(
      "tx_corpus_filter",
      s"""WITH q AS (
         |  SELECT doc_id,
         |    length(string_split(text, ' ')) AS n_words,
         |    least(CAST(1 AS DOUBLE), length(string_split(text, ' ')) / CAST(200 AS DOUBLE))
         |      * (CAST(1 AS DOUBLE) - CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopSql))) AS DOUBLE) / length(string_split(text, ' ')))
         |      AS quality,
         |    md5(substr(text, 1, 80)) AS fp
         |  FROM documents),
         |k AS (SELECT fp, MIN(doc_id) AS keeper FROM q GROUP BY fp)
         |SELECT q.doc_id, q.n_words, q.quality,
         |  (q.doc_id = k.keeper) AS is_keeper,
         |  (q.n_words >= 20) AS len_ok,
         |  (q.quality >= 0.1) AS quality_ok,
         |  (q.doc_id = k.keeper AND q.n_words >= 20 AND q.quality >= 0.1) AS kept
         |FROM q JOIN k USING (fp)""".stripMargin) { (s, dir) =>
      val t = col("text")
      val nWords = size(words(t))
      val quality = least(lit(1.0), nWords / lit(200.0)) *
        (lit(1.0) - nIn(t, stopwords).cast(DoubleType) / nWords)
      val q = Tables.documents(s, dir).select(
        col("doc_id"), nWords.as("n_words"), quality.as("quality"),
        md5(substring(t, 1, 80)).as("fp"))
      val k = q.groupBy("fp").agg(min("doc_id").as("keeper"))
      q.join(k, "fp")
        .select(
          col("doc_id"), col("n_words"), col("quality"),
          (col("doc_id") === col("keeper")).as("is_keeper"),
          (col("n_words") >= 20).as("len_ok"),
          (col("quality") >= 0.1).as("quality_ok"),
          (col("doc_id") === col("keeper") && col("n_words") >= 20 &&
            col("quality") >= 0.1).as("kept"))
    }
  }

  // --- BM25 relevance ranking --------------------------------------------

  private val Bm25Terms = Seq("join", "stream", "filter")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val Bm25TopK = 20

  /** BM25-style relevance ranking of the corpus against a fixed term
    * query — the retrieval scorer a data pipeline uses for topical
    * subsetting ("give me the documents about X") and dedup-aware search.
    * Log-free variant: the idf factor is the raw Robertson ratio
    * (N - df + 0.5)/(df + 0.5) rather than its log — the same per-term
    * document ordering (log is monotone), but every factor is now plain
    * ratios of integers, so both engines compute each addend
    * bit-identically and the 3-term sum is a fixed-order expression, not
    * an aggregation. tf saturation and length normalization are standard
    * (k1 = 1.2, b = 0.75, avgdl as one exact DECIMAL-sum division).
    *
    * Scale: df/avgdl is one partial-aggregable pass reduced to a single
    * broadcast row; scoring is scan → project; ranking is a global top-k
    * (TakeOrdered, no full sort).
    */
  /** The BM25 ranked-list SQL (doc_id, score, rank ≤ Bm25TopK) — the
    * tx_bm25_rank oracle, factored out so ann_rrf_hybrid can embed the
    * SAME list as a CTE (fusion must fuse exactly what the lexical query
    * returns).
    */
  private val Bm25ListSql: String = {
    val dl = "length(string_split(text, ' '))"
    def tfSql(t: String) =
      s"len(list_filter(string_split(text, ' '), w -> w = '$t'))"
    val dfCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN ${tfSql(t)} > 0 THEN 1 ELSE 0 END) AS df$i"
    }
    // `e0` exponent literals force DOUBLE in DuckDB (bare `1.2` parses
    // as DECIMAL there, and decimal-vs-IEEE arithmetic differs in ulps)
    val scoreSql = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"""(CAST(${tfSql(t)} AS DOUBLE) * (1.0e0 + ${Bm25K1}e0)
         | / (${tfSql(t)} + ${Bm25K1}e0 * (1.0e0 - ${Bm25B}e0 + ${Bm25B}e0 * ($dl / avgdl)))
         | * ((n_docs - df$i + 0.5e0) / (df$i + 0.5e0)))""".stripMargin.replaceAll("\n", " ")
    }.mkString(" + ")
    s"""WITH stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(CAST($dl AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avgdl,
       |    ${dfCols.mkString(", ")}
       |  FROM documents)
       |SELECT doc_id, score, rank FROM (
       |  SELECT doc_id, $scoreSql AS score,
       |    ROW_NUMBER() OVER (ORDER BY $scoreSql DESC, doc_id) AS rank
       |  FROM documents, stats) t
       |WHERE rank <= $Bm25TopK""".stripMargin
  }

  /** The BM25 ranked list as a DataFrame — shared by tx_bm25_rank and the
    * hybrid fusion.
    */
  private def bm25List(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val dl = size(words(col("text")))
    def tf(t: String): Column = size(filter(words(col("text")), w => w === t))
    val statCols =
      count(lit(1)).as("n_docs") +:
        (sum(dl.cast(DecimalType(28, 6))).cast(DoubleType) / count(lit(1))).as("avgdl") +:
        Bm25Terms.zipWithIndex.map { case (t, i) =>
          sum(when(tf(t) > 0, 1L).otherwise(0L)).as(s"df$i")
        }
    val stats = Tables.documents(s, dir).agg(statCols.head, statCols.tail: _*)
    val score = Bm25Terms.zipWithIndex.map { case (t, i) =>
      tf(t).cast(DoubleType) * (lit(1.0) + lit(Bm25K1)) /
        (tf(t) + lit(Bm25K1) * (lit(1.0) - lit(Bm25B) + lit(Bm25B) * (dl / col("avgdl")))) *
        ((col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
    }.reduce(_ + _)
    Tables.documents(s, dir)
      .join(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(Bm25TopK)
      // constant partition key: post-limit rows (<=Bm25TopK) rank in one
      // partition either way, but an explicit spec keeps the bench log
      // free of "No Partition Defined" noise. pmod(doc_id,1) is always 0
      // yet non-foldable — lit(0) would be constant-folded out of the
      // spec (see GraphQueries.pagerank).
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(pmod(col("doc_id"), lit(1)))
        .orderBy(col("score").desc, col("doc_id"))))
      .select("doc_id", "score", "rank")
  }

  val bm25Rank: QueryDef = QueryDef("tx_bm25_rank", Bm25ListSql)(bm25List)

  private val RrfK = 60
  private val RrfTopK = 10

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack et al., SIGIR
    * 2009): fuse the BM25 lexical top-k with the dense-embedding cosine
    * top-k by RRF score Σ 1/(K + rank) — the standard hybrid-search
    * combiner (rank-based, so the two scorers need no score calibration).
    * The lexical query is Bm25Terms; the dense query is vector 0 as a
    * query-by-example; both lists are top-Bm25TopK, fused to RrfTopK.
    *
    * Scale: each input is a top-k list (the BM25 TakeOrdered; the dense
    * side any ANN tier — brute force here, ann_lsh/ivf at the lake,
    * identical fusion), so the fusion stage — a k×k full outer join on
    * doc id plus a k-row rank — is O(k) regardless of corpus size; the
    * corpus cost is exactly the two underlying retrievals. 1/(K+rank) is
    * one IEEE division of exact ints, bit-identical cross-engine.
    */
  val rrfHybrid: QueryDef = QueryDef(
    "ann_rrf_hybrid", {
      val cos = "list_dot_product(pe, e) / (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(e, e)))"
      s"""WITH bm AS ($Bm25ListSql),
         |vv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |pp AS (SELECT e AS pe FROM vv WHERE vec_id = 0),
         |ann AS (
         |  SELECT vec_id, rank FROM (
         |    SELECT vec_id,
         |      ROW_NUMBER() OVER (ORDER BY $cos DESC, vec_id) AS rank
         |    FROM vv, pp) t WHERE rank <= $Bm25TopK),
         |fused AS (
         |  SELECT COALESCE(bm.doc_id, ann.vec_id) AS doc_id,
         |    COALESCE(1.0e0 / ($RrfK + bm.rank), 0.0e0)
         |      + COALESCE(1.0e0 / ($RrfK + ann.rank), 0.0e0) AS rrf
         |  FROM bm FULL OUTER JOIN ann ON bm.doc_id = ann.vec_id)
         |SELECT doc_id, rrf, rank FROM (
         |  SELECT doc_id, rrf,
         |    ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rank FROM fused) t
         |WHERE rank <= $RrfTopK""".stripMargin
    }) { (s, dir) =>
    import graft.functions.Vec
    val W = org.apache.spark.sql.expressions.Window
    val bm = bm25List(s, dir).select(col("doc_id"), col("rank").as("rank_bm"))
    val v = Tables.embeddings(s, dir)
      .select(col("vec_id"), Vec.toDouble(col("embedding")).as("e"))
      .withColumn("nrm", Vec.dot(col("e"), col("e")))
    val probe = v.filter(col("vec_id") === 0)
      .select(col("e").as("pe"), col("nrm").as("pnrm"))
    val ann = v.join(broadcast(probe))
      .select(col("vec_id"),
        Vec.cosinePre(Vec.dot(col("pe"), col("e")), col("pnrm"), col("nrm")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id")).limit(Bm25TopK)
      .withColumn("rank_ann", row_number().over(W
        .partitionBy(pmod(col("vec_id"), lit(1)))
        .orderBy(col("cosine").desc, col("vec_id"))))
      .select("vec_id", "rank_ann")
    val fused = bm.join(ann, col("doc_id") === col("vec_id"), "full_outer")
      .select(coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
        (coalesce(lit(1.0) / (lit(RrfK) + col("rank_bm")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("rank_ann")), lit(0.0))).as("rrf"))
    fused
      .withColumn("rank", row_number().over(W
        .partitionBy(pmod(col("doc_id"), lit(1)))
        .orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rank") <= RrfTopK)
      .select("doc_id", "rrf", "rank")
  }

  /** Edit-distance (Levenshtein) near-dup scoring — the character-level
    * similarity the shingle/Jaccard family can't see (transpositions,
    * small in-word edits). Levenshtein is O(len²) per pair, so at scale it
    * is NEVER run all-pairs: candidates come from the cheap prefix-block
    * key (same blocking as dd_block_prefix) and the comparison is bounded
    * to the first 120 chars — per-pair cost is a constant, total cost is
    * Σ block² over blocks, never corpus². Both engines implement the
    * standard unit-cost DP, identical on this ASCII corpus.
    */
  val editDist: QueryDef = QueryDef(
    "tx_edit_dist",
    """WITH blocks AS (SELECT md5(substr(text, 1, 40)) AS fp, doc_id, text FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(levenshtein(substr(a.text, 1, 120), substr(b.text, 1, 120)) AS BIGINT) AS lev
      |FROM blocks a JOIN blocks b ON a.fp = b.fp AND a.doc_id < b.doc_id""".stripMargin) { (s, dir) =>
    val blocks = Tables.documents(s, dir)
      .select(md5(substring(col("text"), 1, 40)).as("fp"), col("doc_id"),
        substring(col("text"), 1, 120).as("head"))
    blocks.as("a")
      .join(blocks.as("b"), col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levenshtein(col("a.head"), col("b.head")).cast(LongType).as("lev"))
  }

  /** E64 — Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    * fraction of a document occupied by its most frequent word bigram and
    * by ALL repeated bigrams. Boilerplate, keyword stuffing, and
    * generation loops light these up; pretraining pipelines drop docs
    * above per-signal thresholds.
    *
    * Shape: explode bigrams → count per (doc, gram) → per-doc max/sum —
    * two partial-aggregable groupBys on (doc_id, gram) then doc_id, the
    * relational form that scales (a per-row higher-order-function count
    * would be O(words²) per doc and codegen-hostile). Ratios are single
    * int→double divisions. Docs under 2 words have no bigrams and emit no
    * row in BOTH engines (explicit size filter = the oracle's empty
    * unnest).
    */
  val repetition: QueryDef = QueryDef(
    "tx_repetition",
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |  WHERE length(string_split(text, ' ')) >= 2),
      |g AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram
      |  FROM w, unnest(range(1, length(ws))) AS t(i)),
      |c AS (SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY 1, 2)
      |SELECT doc_id,
      |  CAST(SUM(n) AS BIGINT) AS n_bigrams,
      |  CAST(MAX(n) AS BIGINT) AS top_bigram_n,
      |  CAST(MAX(n) AS DOUBLE) / SUM(n) AS top_bigram_frac,
      |  CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE) / SUM(n) AS dup_bigram_frac
      |FROM c GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val w = Tables.documents(s, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    // sequence(1, n-1) needs n >= 2: Spark infers step -1 when start >
    // stop, so an unguarded 1-word doc would yield [1, 0], not empty —
    // the size filter above is correctness, not just oracle parity
    val grams = w.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("ws")) - 1),
        i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1)))).as("gram"))
    grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(
        sum("n").as("n_bigrams"),
        max("n").as("top_bigram_n"),
        (max("n").cast(DoubleType) / sum("n")).as("top_bigram_frac"),
        (sum(when(col("n") > 1, col("n")).otherwise(lit(0L))).cast(DoubleType) / sum("n"))
          .as("dup_bigram_frac"))
  }

  /** E65 — cross-document n-gram novelty: for each document, the fraction
    * of its distinct word 8-grams that also appear in at least one OTHER
    * document. This is sub-document-granularity dedup signal — template
    * boilerplate and copied passages score high while the doc-level
    * fingerprint (dd_exact) and near-dup tiers (LSH) stay silent, and it
    * is the containment side of benchmark decontamination generalized to
    * corpus-vs-itself.
    *
    * Shape: distinct (doc, gram) → document frequency per gram → join
    * back → per-doc fraction. Both groupBys partial-aggregate; the join
    * is an equi-join on the gram hash — at 100 TB this is the same
    * banded-join scale class as LSH (gram space sharded by hash), never
    * all-pairs. Count columns are exact ints; the fraction is one
    * division.
    */
  val ngramNovelty: QueryDef = QueryDef(
    "tx_ngram_novelty",
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |  WHERE length(string_split(text, ' ')) >= 8),
      |g AS (
      |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS gram
      |  FROM w, unnest(range(1, length(ws) - 6)) AS t(i)),
      |df AS (SELECT gram, COUNT(*) AS n_docs FROM g GROUP BY 1)
      |SELECT doc_id,
      |  COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS shared_grams,
      |  CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS shared_frac
      |FROM g JOIN df USING (gram) GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val w = Tables.documents(s, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 8)
    // within-doc dedupe MAP-SIDE (r17, guide §2.3): distinct over
    // (doc_id, gram) only ever merges rows of the SAME document — the
    // array_distinct inside the projection computes exactly that set
    // before the explode, so the corpus-sized exchange of 8-word gram
    // strings the old `.distinct()` paid (half the query's 16.5 MB
    // shuffle) disappears outright; the window exchange below is the one
    // gram-keyed shuffle left. Set semantics are identical by
    // construction (cross-doc duplicates were never merged — doc_id is in
    // the key).
    val grams = w.select(col("doc_id"),
      explode(array_distinct(transform(sequence(lit(1), size(col("ws")) - 7),
        i => array_join(slice(col("ws"), i, lit(8)), " ")))).as("gram"))
    // Document frequency via count-over-window on the gram partition, NOT
    // a groupBy+self-join: the join form computed the whole
    // Scan→Generate→distinct subtree twice (the r7 verdict's cheapest big
    // win — at 100 TB the 8-gram explode dominates and paying it twice
    // halves throughput). The window shuffles the SAME gram-sharded rows
    // the join would, needs no second Generate, and drops one exchange;
    // PlanContractSpec pins the single-Generate shape.
    val withDf = grams.withColumn("n_docs",
      count(lit(1)).over(Window.partitionBy("gram")))
    withDf
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("shared_grams"),
        (sum(when(col("n_docs") > 1, 1L).otherwise(0L)).cast(DoubleType) / count(lit(1)))
          .as("shared_frac"))
  }

  /** Corpus-familiarity scoring — the unigram-LM quality proxy (the
    * CCNet-style "does this doc look like the corpus" filter): a unigram
    * table is trained from the corpus itself and each document scores the
    * add-one-smoothed MEAN word probability, plus its rare-word count.
    * Deliberately log-free: Σ log p would need cross-engine bit-identical
    * ln (not guaranteed between libm implementations — the same reason
    * tx_bm25_rank ranks by rational factors rather than the log IDF), so
    * the score is the arithmetic mean of exact rationals: every numerator
    * and denominator is an exact BIGINT sum, and the only floating-point
    * op is ONE final division of two exactly-representable integers —
    * IEEE-identical everywhere.
    *
    * Scale: the word table partial-aggregates on the word key; the
    * word⋈vocab join hash-shards on the word (the natural key — skewed
    * stopwords ride AQE skew splitting); the per-doc rollup shuffles on
    * doc_id; the corpus stats row is a two-level aggregate broadcast into
    * the per-doc result (|docs| × 1 row).
    */
  val familiarity: QueryDef = QueryDef(
    "tx_familiarity",
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |vocab AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
      |stats AS (
      |  SELECT CAST(SUM(c) AS BIGINT) AS n_total, COUNT(*) AS v_size FROM vocab),
      |doc AS (
      |  SELECT doc_id,
      |    COUNT(*) AS n_words,
      |    CAST(SUM(c + 1) AS BIGINT) AS sum_smooth,
      |    COUNT(CASE WHEN c <= 1 THEN 1 END) AS rare_words
      |  FROM w JOIN vocab USING (word) GROUP BY doc_id)
      |SELECT doc_id, n_words, rare_words,
      |  CAST(sum_smooth AS DOUBLE)
      |    / CAST(n_words * (n_total + v_size) AS DOUBLE) AS familiarity
      |FROM doc, stats""".stripMargin) { (s, dir) =>
    val w = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val vocab = w.groupBy("word").agg(count(lit(1)).as("c"))
    val stats = vocab.agg(sum("c").cast("long").as("n_total"),
      count(lit(1)).as("v_size"))
    val doc = w.join(vocab, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("c") + 1).cast("long").as("sum_smooth"),
        count(when(col("c") <= 1, lit(1))).as("rare_words"))
    doc.crossJoin(broadcast(stats)) // 1-row corpus stats
      .select(col("doc_id"), col("n_words"), col("rare_words"),
        (col("sum_smooth").cast(DoubleType) /
          (col("n_words") * (col("n_total") + col("v_size"))).cast(DoubleType))
          .as("familiarity"))
  }

  // --- BPE vocabulary induction -------------------------------------------

  /** The per-(session, dir) word-frequency table, materialized once and
    * shared by every consumer of corpus word counts — the one corpus-sized
    * pass of the BPE trainer (shingleBase's memo-and-persist pattern;
    * entries for stopped sessions are dropped so the map never pins a dead
    * SparkContext).
    */
  private def vocabBase(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    PlanCache.cached(s, dir, "bpe_vocab") {
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("freq"))
    }

  private val BpeSep = "\u001f"          // U+001F unit separator, not in corpus
  private val BpeSS = BpeSep + BpeSep    // symbol boundary: ␟␟ between symbols

  /** One BPE round's pair table: adjacent-symbol pairs weighted by word
    * frequency. `rep` encodes a word's current symbol list as
    * `␟␟s1␟␟s2␟␟…␟␟` — DOUBLE separators so a merge can be applied by plain
    * `replace` (leftmost non-overlapping in both engines): the pattern
    * `␟a␟␟b␟` (single ␟ at the outer edges) only matches WHOLE adjacent
    * symbols (a symbol-internal 'a' is preceded by a letter, not ␟), and
    * consecutive occurrences `␟␟a␟␟b␟␟a␟␟b␟␟` each retain a leading ␟
    * after the previous replacement consumed one — the single-separator
    * encoding fails exactly this case.
    */
  private def bpePairs(v: DataFrame): DataFrame =
    v.select(col("freq"), filter(split(col("rep"), BpeSS), x => length(x) > 0).as("s"))
      .select(col("freq"), explode(when(size(col("s")) >= 2,
        expr("transform(sequence(1, size(s)-1), i -> concat(element_at(s, i), ' ', element_at(s, i+1)))"))
        .otherwise(array())).as("pair"))
      .groupBy("pair").agg(sum("freq").as("cnt"))

  /** The round's winning pair under the classic BPE rule: max corpus
    * frequency, ties to the lexicographically smallest pair. */
  private def bpeWinner(v: DataFrame): DataFrame =
    bpePairs(v).orderBy(col("cnt").desc, col("pair").asc).limit(1)

  /** Rewrite every word's symbol string with the winner merged. A LEFT
    * join on TRUE (1-row broadcast, like the oracle's LEFT JOIN w ON TRUE)
    * rather than a cross join, so an EXHAUSTED round (no pairs left —
    * every word a single symbol) is an identity rewrite instead of
    * silently emptying the vocabulary.
    */
  private def bpeApply(v: DataFrame, w: DataFrame): DataFrame =
    v.join(broadcast(w.select(col("pair").as("wpair"))), lit(true), "left")
      .withColumn("rep", when(col("wpair").isNull, col("rep"))
        .otherwise(call_function("replace", col("rep"),
          concat(lit(BpeSep), call_function("replace", col("wpair"), lit(" "), lit(BpeSS)), lit(BpeSep)),
          concat(lit(BpeSep), call_function("replace", col("wpair"), lit(" "), lit("")), lit(BpeSep)))))
      .drop("wpair")

  /** Merge rounds of the BPE trainer (r11 verdict ask #7: a parameterized
    * N-round loop — 10 — replacing the 3-round unroll; the oracle CTEs
    * generate programmatically over the same N).
    */
  private[graft] val BpeRounds = 10

  private def bpeOracleRound(r: Int): String = {
    val prev = if (r == 1) "v1" else s"v${r}"
    s"""p$r AS (SELECT s[i] || ' ' || s[i+1] AS pair, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, list_filter(string_split(rep, chr(31)||chr(31)), x -> x <> '') AS s FROM $prev) t,
       |       unnest(range(1, len(s))) AS u(i)
       |  GROUP BY 1),
       |w$r AS (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
       |v${r + 1} AS MATERIALIZED (SELECT word, freq,
       |  CASE WHEN pair IS NULL THEN rep
       |       ELSE replace(rep, chr(31) || replace(pair, ' ', chr(31)||chr(31)) || chr(31),
       |                         chr(31) || replace(pair, ' ', '') || chr(31)) END AS rep
       |  FROM $prev LEFT JOIN w$r ON TRUE)""".stripMargin
  }

  /** The N-round training loop (dd_components' iteration pattern, as the
    * 3-round unroll's scaladoc already prescribed for a production-depth
    * trainer): per round, count adjacent pairs, checkpoint the 1-row
    * winner (the broadcast the rewrite applies), rewrite the vocab reps
    * and checkpoint THEM — so each round costs ONE pair count plus ONE
    * rewrite over |vocab| (flat per round) instead of re-deriving the
    * whole merge chain. Stops early when the pair table exhausts (the
    * oracle's LEFT-JOIN identity rounds mirror the tail). Returns the
    * winner union (merge_rank, pair, cnt) and the final rep table; both
    * memo-and-persisted per (session, dir) by the callers.
    */
  /** Spec observability: bpeTrain passes run in this process (BpeMergeSpec
    * pins one-shared-train across all three BPE consumers — r12 advice #3).
    */
  private[analytics] val trainRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  private[graft] def bpeTrain(s: org.apache.spark.sql.SparkSession,
      dir: String,
      onRound: (Int, Double) => Unit = (_, _) => ()): (DataFrame, DataFrame) = {
    trainRuns.incrementAndGet()
    val vocab = vocabBase(s, dir)
    var v = vocab.withColumn("rep",
      concat(lit(BpeSS), array_join(filter(split(col("word"), ""), x => length(x) > 0), BpeSS), lit(BpeSS)))
      .localCheckpoint(true)
    var winners: Option[DataFrame] = None
    var r = 1
    var exhausted = false
    while (r <= BpeRounds && !exhausted) {
      val t0 = System.nanoTime()
      val w = bpeWinner(v).localCheckpoint(true)
      if (w.isEmpty) exhausted = true
      else {
        val wr = w.select(lit(r).as("merge_rank"), col("pair"), col("cnt"))
        winners = Some(winners.fold(wr)(_.unionAll(wr)))
        v = bpeApply(v, w).localCheckpoint(true)
        // measurement seam (the SpanW lesson: profile THE loop, not a
        // copy) — BpeProfile prints the per-round walls the flat-cost
        // claim is pinned with
        onRound(r, (System.nanoTime() - t0) / 1e9)
        r += 1
      }
    }
    // degenerate corpus (every word one symbol): zero merges, empty frame
    // with the winners schema
    (winners.getOrElse(bpeWinner(v).limit(0)
      .select(lit(1).as("merge_rank"), col("pair"), col("cnt"))), v)
  }

  /** ONE training run per (session, dir) feeds every consumer (r12
    * advice #3: winners-cached, reps-cached and the lake build each
    * invoked bpeTrain separately, so a session running all three BPE
    * queries trained the same tokenizer up to three times). Both derived
    * artifacts come out of a single bpeTrain pass: `cached` only invokes
    * its builder on a miss, and a cold miss fills the shared `pair` local
    * once — so either both PlanCache keys warm from one train, or both
    * are already warm and no train runs at all.
    */
  private def bpeTrained(s: org.apache.spark.sql.SparkSession,
                         dir: String): (DataFrame, DataFrame) = {
    var pair: Option[(DataFrame, DataFrame)] = None
    def train(): (DataFrame, DataFrame) = {
      if (pair.isEmpty) pair = Some(bpeTrain(s, dir))
      pair.get
    }
    (PlanCache.cached(s, dir, "bpe_winners")(train()._1),
      PlanCache.cached(s, dir, "bpe_reps")(train()._2))
  }

  private def bpeWinnersCached(s: org.apache.spark.sql.SparkSession,
                               dir: String): DataFrame = bpeTrained(s, dir)._1

  private def bpeRepsCached(s: org.apache.spark.sql.SparkSession,
                            dir: String): DataFrame = bpeTrained(s, dir)._2

  /** BPE vocabulary induction — the tokenizer-training step of a pretrain
    * pipeline, as a pure relational dataflow: ONE corpus pass builds the
    * word-frequency table (exactly what production BPE trainers operate
    * on — the corpus is never re-read), then each of $BpeRounds merge
    * rounds (r12: a parameterized loop, no longer a 3-round unroll) counts
    * adjacent-symbol pairs weighted by word frequency, selects the argmax
    * pair (ties → lexicographic, a total order), and applies the merge to
    * every word via a boundary-safe string replace (encoding above). The
    * oracle's round CTEs generate programmatically over the same N (the
    * PQ-oracle-generator precedent), with LEFT-JOIN identity rounds after
    * pair exhaustion so both engines state the same fixed-N dataflow.
    *
    * Scale: the corpus-sized work is the single word count (explode →
    * partial-aggregated groupBy — the exchange carries distinct words),
    * materialized ONCE into a per-(session, dir) persisted table
    * (shingleBase's pattern: at 100 TB the word table is written to the
    * lake once and every tokenizer/familiarity consumer reads it). Every
    * merge round then runs on the VOCAB (|distinct words|, millions at
    * 100 TB, not billions of tokens): pair explode ≤ word-length rows per
    * word, partial-aggregated to distinct pairs; the winner is a 1-row
    * broadcast; and each round's reps localCheckpoint (bpeTrain — the
    * dd_components iteration pattern), so per-round cost is FLAT — one
    * pair count plus one rewrite — independent of how many rounds
    * preceded it. The trained artifacts (winner list, final rep table)
    * memo-and-persist per (session, dir) and both BPE queries share them.
    */
  val bpeMerge: QueryDef = QueryDef(
    "tx_bpe_merge",
    s"""WITH words AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |vocab AS (SELECT word, COUNT(*) AS freq FROM words WHERE word <> '' GROUP BY word),
       |v1 AS MATERIALIZED (SELECT word, freq,
       |  chr(31)||chr(31) || array_to_string(string_split(word, ''), chr(31)||chr(31)) || chr(31)||chr(31) AS rep
       |  FROM vocab),
       |${(1 to BpeRounds).map(bpeOracleRound).mkString(",\n")}
       |${(1 to BpeRounds).map(r =>
         s"SELECT $r AS merge_rank, pair, replace(pair, ' ', '') AS merged, cnt FROM w$r")
         .mkString("\nUNION ALL ")}""".stripMargin) { (s, dir) =>
    bpeWinnersCached(s, dir)
      .select(col("merge_rank"), col("pair"),
        call_function("replace", col("pair"), lit(" "), lit("")).as("merged"), col("cnt"))
  }

  // --- TF-IDF keyword extraction ------------------------------------------

  private val TfidfTopK = 3

  /** TF-IDF keyword extraction — top-k characteristic terms per document,
    * the classic relevance/topic signal (and the feature clustering /
    * dedup-explanation pipelines attach to every doc). Log-free like
    * tx_familiarity and tx_bm25_rank: the score is the exact rational
    * tf·N/df stated as ONE IEEE division of two exact BIGINTs (tf·N and
    * df both < 2^53), so the ranking — and the reported score — are
    * bit-identical cross-engine; ln-based idf would hinge on libm. Ties
    * break lexicographically (a total order, so top-k is deterministic).
    *
    * Scale: ONE corpus explode partial-aggregates to the (doc, word) tf
    * table; df is a COUNT window OVER the word partition of that same
    * table (counting each doc once) — the aggregate-branch form
    * (df = tf.groupBy(word)) re-derived the explode a second time
    * (ScanAudit: dups=(documents,3)); the window keeps the derivation
    * single and shuffles the same word key the join would have. N is a
    * 1-row broadcast off a doc_id-only scan; the per-doc top-k is l3's
    * rank-and-filter with doc-sized window state.
    */
  val tfidfKeywords: QueryDef = QueryDef(
    "tx_tfidf_keywords",
    s"""WITH w AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word),
       |tfdf AS (SELECT doc_id, word, tf,
       |    COUNT(*) OVER (PARTITION BY word) AS df FROM tf),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, word, tf, df,
       |    CAST(tf * n_docs AS DOUBLE) / df AS tfidf,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |                       ORDER BY CAST(tf * n_docs AS DOUBLE) / df DESC, word) AS rk
       |  FROM tfdf, n)
       |SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       |  tfidf, CAST(rk AS INT) AS rk
       |FROM scored WHERE rk <= $TfidfTopK""".stripMargin) { (s, dir) =>
    val w = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val tf = w.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("word")))
    val n = Tables.documents(s, dir).select(col("doc_id")).agg(count(lit(1)).as("n_docs"))
    val tfidf = (col("tf") * col("n_docs")).cast(DoubleType) / col("df")
    tf.crossJoin(broadcast(n)) // 1-row corpus size
      .withColumn("tfidf", tfidf)
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("word"))))
      .filter(col("rk") <= TfidfTopK)
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        col("tfidf"), col("rk"))
  }

  /** BPE tokenization with the LEARNED vocabulary — the apply half of the
    * train→apply loop (tx_bpe_merge learns the merges; this query encodes
    * the corpus with them and reports exact per-document token counts —
    * the number every packing / pricing / context-budget decision
    * downstream consumes). Same $BpeRounds-round training (shared cached
    * artifacts); the encoded width of a word is the symbol count of its
    * final rep.
    *
    * Scale: training runs once per (session, dir) — bpeTrain's flat
    * per-round loop — and this query reads the CACHED final rep table;
    * the apply is ONE word-sharded join of the corpus occurrences against
    * the |vocab|-row word→rep table plus a doc_id rollup — the join a
    * production tokenizer service does against its pretokenized cache.
    */
  val bpeTokenize: QueryDef = QueryDef(
    "tx_bpe_tokenize",
    s"""WITH words AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |vocab AS (SELECT word, COUNT(*) AS freq FROM words WHERE word <> '' GROUP BY word),
       |v1 AS MATERIALIZED (SELECT word, freq,
       |  chr(31)||chr(31) || array_to_string(string_split(word, ''), chr(31)||chr(31)) || chr(31)||chr(31) AS rep
       |  FROM vocab),
       |${(1 to BpeRounds).map(bpeOracleRound).mkString(",\n")},
       |wd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |tok AS (
       |  SELECT doc_id, len(list_filter(string_split(rep, chr(31)||chr(31)), x -> x <> '')) AS n_sym
       |  FROM wd JOIN v${BpeRounds + 1} USING (word) WHERE word <> '')
       |SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(n_sym) AS BIGINT) AS n_tokens,
       |  CAST(CAST(SUM(n_sym) AS DOUBLE) / COUNT(*) AS DOUBLE) AS tokens_per_word
       |FROM tok GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val reps = bpeRepsCached(s, dir)
      .select(col("word"),
        size(filter(split(col("rep"), BpeSS), x => length(x) > 0)).as("n_sym"))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(reps, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_sym").cast("long").as("n_tokens"),
        (sum("n_sym").cast(DoubleType) / count(lit(1))).cast(DoubleType)
          .as("tokens_per_word"))
  }

  // --- lake-persisted tokenizer + incremental batch tokenization -----------

  /** The trained tokenizer as LAKE TABLES (the r11 lesson applied to the
    * last process-local trained artifact: the ANN index moved to MergeSink
    * storage in r11; the BPE winner list and final word→rep table follow
    * in r12): `winners` keyed by merge_rank (the merge recipe a tokenizer
    * SERVICE ships), `reps` keyed by word with SMALL files so a batch
    * probe's manifest pruning is a real subset. Version-keyed memo like
    * every ensure* sibling.
    */
  private val bpeLake = VersionedMemo.paths[(String, String)](v => Seq(v._1, v._2))

  private[graft] def ensureBpeLake(s: org.apache.spark.sql.SparkSession,
                                   dir: String): (String, String) =
    bpeLake.get(s, dir) {
      val base = Staging.freshBase("graft_bpe", dir).getPath
      val winners = s"$base/winners"; val reps = s"$base/reps"
      val (w, v) = bpeTrained(s, dir) // the one shared train (r12 advice)
      graft.ingest.MergeSink.merge(s, winners, w,
        Seq("merge_rank"), Seq(col("merge_rank")), targetFileRows = 16)
      graft.ingest.MergeSink.merge(s, reps, v.select("word", "rep"),
        Seq("word"), Seq(col("word")), targetFileRows = 8)
      (winners, reps)
    }

  /** INCREMENTAL batch tokenization against the PERSISTED tokenizer — the
    * daily-ingest form of tx_bpe_tokenize (the dd_incr_* convention): the
    * arriving batch (doc_id % 5 = 0, the standing split) tokenizes by
    * probing the word-keyed rep LAKE table through `readOverlapping`, so
    * the read is manifest-pruned to the files covering the BATCH'S
    * vocabulary — no retrain, no corpus re-read, the trained artifact is
    * storage another session/process reads as-is. On the ORACLE corpus the
    * batch shares the full vocabulary so the prune degenerates to most
    * files (honest note); the pruning claim is pinned at QUERY tier on an
    * out-of-vocab-skewed fixture (BpeMergeSpec r13: the live query's rep
    * scan set is a strict minority of the table's files when the batch
    * vocabulary is a narrow slice), plus the 1-word narrow-probe spec.
    * Oracle: the full tokenize dataflow restricted to the batch docs —
    * persistence must be invisible.
    */
  val bpeIncrLake: QueryDef = QueryDef(
    "tx_bpe_incr_lake",
    s"""WITH words AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |vocab AS (SELECT word, COUNT(*) AS freq FROM words WHERE word <> '' GROUP BY word),
       |v1 AS MATERIALIZED (SELECT word, freq,
       |  chr(31)||chr(31) || array_to_string(string_split(word, ''), chr(31)||chr(31)) || chr(31)||chr(31) AS rep
       |  FROM vocab),
       |${(1 to BpeRounds).map(bpeOracleRound).mkString(",\n")},
       |wd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
       |       WHERE doc_id % 5 = 0),
       |tok AS (
       |  SELECT doc_id, len(list_filter(string_split(rep, chr(31)||chr(31)), x -> x <> '')) AS n_sym
       |  FROM wd JOIN v${BpeRounds + 1} USING (word) WHERE word <> '')
       |SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(n_sym) AS BIGINT) AS n_tokens,
       |  CAST(CAST(SUM(n_sym) AS DOUBLE) / COUNT(*) AS DOUBLE) AS tokens_per_word
       |FROM tok GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val (_, repsSink) = ensureBpeLake(s, dir)
    val batchWords = Tables.documents(s, dir)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val reps = graft.ingest.MergeSink
      .readOverlapping(s, repsSink, batchWords.select("word"), Seq("word"))
      .select(col("word"),
        size(filter(split(col("rep"), BpeSS), x => length(x) > 0)).as("n_sym"))
    batchWords.join(reps, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_sym").cast("long").as("n_tokens"),
        (sum("n_sym").cast(DoubleType) / count(lit(1))).cast(DoubleType)
          .as("tokens_per_word"))
  }

  /** Synthetic crawl page around a document (the codec-fixture pattern
    * brought to HTML): the doc's words become the article — an h2 title
    * plus 8-word paragraphs — wrapped in REAL chrome that each prune rule
    * must remove to match the oracle: a nav link bar (tag prune), a
    * header h1 (tag prune), a sidebar div carrying DOC-DERIVED text
    * (class-token prune — skipping it leaks the sidebar into main text),
    * a link-dense in-ARTICLE p of pure anchors (the link-density gate —
    * no subtree prune removes it), a related-stories div with doc words
    * (class prune) and a footer (tag prune). Even/odd docs vary which
    * traps are present so both page shapes are on the oracle path.
    */
  /** HTML-escape for embedded doc text: &, <, > become entities the DOM
    * parser decodes back to the raw characters, so `textStripped` returns
    * the ORIGINAL text and the oracle's raw-word computation holds even
    * for documents containing markup metacharacters (a literal "&nbsp;"
    * in a doc escapes to "&amp;nbsp;" and round-trips too).
    */
  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def syntheticPage(docId: Long, text: String): String = {
    val words = text.trim.split("\\s+").map(escapeHtml)
    val sb = new StringBuilder
    sb ++= "<html><head><title>Site</title><style>body{margin:0}</style></head><body>"
    sb ++= """<nav class="navbar"><ul><li><a href="/">Home</a></li>"""
    sb ++= """<li><a href="/p">Products</a></li><li><a href="/c">Contact</a></li></ul></nav>"""
    sb ++= "<header><h1>Example Site</h1></header>"
    if (docId % 2 == 0)
      sb ++= s"""<div class="sidebar"><p>About our excellent ${words.head} services and partners worldwide</p><a href="/a">archive</a></div>"""
    sb ++= "<article>"
    sb ++= s"<h2>Report $docId</h2>"
    words.grouped(8).foreach(p => sb ++= s"<p>${p.mkString(" ")}</p>")
    if (docId % 2 == 1)
      sb ++= """<p><a href="#">Read more</a> <a href="#">Subscribe now</a> <a href="#">Share this article</a></p>"""
    sb ++= "</article>"
    sb ++= s"""<div class="related"><h3>Related stories</h3><p>More about ${words.last} and other topics from our archive pages</p></div>"""
    sb ++= s"<footer><p>(c) 2026 Example Site - all rights reserved. ${words.head} newsletter signup.</p></footer>"
    sb ++= "</body></html>"
    sb.toString
  }

  /** Main-content HTML extraction (r15, the r14 verdict ask #5 — the
    * missing stage between the scrape tier and tx_quality_score):
    * boilerplate removal via MainContent's deterministic tag/class-token
    * prune + integer link-density scoring over the HtmlDoc DOM. The
    * oracle states the expected main text BY CONSTRUCTION — the h2 title
    * plus the ≥25-char 8-word paragraphs, newline-joined — so any chrome
    * leaking through (or any article span wrongly dropped) hash-
    * mismatches. Scale: one mapPartitions pass, embarrassingly parallel,
    * no shuffle — the same posture as the codec tier.
    */
  val htmlExtract: QueryDef = QueryDef(
    "tx_html_extract",
    """WITH w AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
      |  FROM documents),
      |p AS (
      |  SELECT doc_id,
      |    ['Report ' || doc_id] ||
      |    list_filter([array_to_string(ws[i*8+1:(i+1)*8], ' ')
      |                 for i in range(0, (len(ws)+7)//8)], s -> len(s) >= 25) AS kept
      |  FROM w)
      |SELECT doc_id, array_to_string(kept, chr(10)) AS main_text,
      |  CAST(len(kept) AS INTEGER) AS n_blocks,
      |  CAST(len(array_to_string(kept, chr(10))) AS BIGINT) AS n_chars
      |FROM p""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val spans = graft.ingest.MainContent.mainBlocks(syntheticPage(docId, text))
        val main = spans.mkString("\n")
        (docId, main, spans.size, main.length.toLong)
      })
      .toDF("doc_id", "main_text", "n_blocks", "n_chars")
  }

  private val gzipShardStage = VersionedMemo.paths[String](Seq(_))

  /** Stage the documents corpus as 8 gzip JSONL shards — the compressed
    * text container real corpora arrive in (done ONCE per (session, dir):
    * the staging is the upstream exporter's role, not part of the
    * operator under test).
    */
  private[graft] def ensureGzipShards(s: org.apache.spark.sql.SparkSession,
                                      dir: String): String =
    gzipShardStage.get(s, dir) {
      val shards = s"${Staging.freshBase("graft_gz", dir).getPath}/shards"
      graft.sources.GzipJsonl.writeShards(
        Tables.documents(s, dir).select("doc_id", "text", "lang", "n_chars"),
        shards, shards = 8)
      shards
    }

  /** Corpus recovery through the COMPRESSED TEXT container (r16, E156):
    * the engine must reconstruct the documents table from real
    * `*.jsonl.gz` bytes — per-shard gunzip (CRC-checked, named failures),
    * newline record framing, `from_json` schema-on-read — and aggregate
    * it; the oracle computes the same aggregate from the parquet
    * original, so ANY loss or corruption in the byte → record path
    * (missing rows, broken escaping, truncated members, charset slips)
    * hash-mismatches. sum_len recomputes length from the RECOVERED text,
    * not the carried n_chars column: the text payload itself is verified,
    * not just the metadata fields.
    */
  val gzipShards: QueryDef = QueryDef(
    "tx_gzip_shards",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_len,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      |FROM documents GROUP BY lang""".stripMargin) { (s, dir) =>
    val lines = graft.sources.GzipJsonl.readLines(s, ensureGzipShards(s, dir))
    lines
      .select(from_json(col("line"),
        "doc_id BIGINT, text STRING, lang STRING, n_chars BIGINT",
        Map.empty[String, String]).as("d"))
      .select("d.*")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum(length(col("text")).cast(LongType)).as("sum_len"),
        sum("doc_id").as("sum_ids"))
  }

  private val wetStage = VersionedMemo.paths[String](Seq(_))

  /** Stage the corpus as 8 WET shards (warcinfo leader + one gzip member
    * per conversion record — the crawl-tooling shape), once per
    * (session, dir).
    */
  private[graft] def ensureWetShards(s: org.apache.spark.sql.SparkSession,
                                     dir: String): String =
    wetStage.get(s, dir) {
      val shards = s"${Staging.freshBase("graft_wet", dir).getPath}/shards"
      graft.sources.Warc.writeWetShards(
        Tables.documents(s, dir).select("doc_id", "text"), shards, shards = 8)
      shards
    }

  /** Corpus recovery through the WARC/WET crawl archive (r16, E162 — the
    * E156 stretch): the engine walks real WET bytes — multi-member
    * gunzip, version line, named headers, Content-Length-framed payloads,
    * record separators, the warcinfo leader filtered by type — and must
    * reproduce every document VERBATIM: the oracle emits one row per doc
    * straight from parquet and the md5 fingerprint is over the RECOVERED
    * payload, so a one-byte framing slip (header drift, length
    * off-by-one, separator misparse) mismatches that record's hash.
    */
  val warcRecords: QueryDef = QueryDef(
    "tx_warc_records",
    """SELECT doc_id, 'http://example.com/doc/' || doc_id AS uri,
      |  CAST(length(text) AS BIGINT) AS n_chars, md5(text) AS fp
      |FROM documents""".stripMargin) { (s, dir) =>
    graft.sources.Warc.readRecords(s, ensureWetShards(s, dir))
      .filter(col("warc_type") === "conversion")
      .select(
        regexp_extract(col("target_uri"), "doc/(\\d+)$", 1).cast(LongType)
          .as("doc_id"),
        col("target_uri").as("uri"),
        length(col("payload")).cast(LongType).as("n_chars"),
        md5(col("payload").cast(BinaryType)).as("fp"))
  }

  val defs: Seq[QueryDef] =
    Seq(qualityScore, langId, tokenCount, fingerprint, rollingHash, sentiment,
      corpusFilter, bm25Rank, editDist, repetition, ngramNovelty, familiarity,
      bpeMerge, tfidfKeywords, bpeTokenize, rrfHybrid, bpeIncrLake, htmlExtract,
      gzipShards, warcRecords)
}
