package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Norm
import graft.ingest.MergeSink

/** Inverted text index AS A MergeSink TABLE — retrieval composed from the
  * lakehouse primitives instead of a bespoke index format: one row per
  * term holding its sorted posting list, range-clustered on
  * xxhash64(term) like any MergeSink table. Every index capability is
  * inherited rather than re-implemented:
  *
  *  - term lookup   = MergeSink.pointRead → manifest interval prune →
  *                    O(1) files read at any index size;
  *  - AND query     = posting-list intersection of the pruned lookups;
  *  - incremental   = read ONLY the batch's terms' current postings
  *    update          (pruned), union the new doc ids, MERGE — cost
  *                    O(terms touched by the batch), never O(index);
  *  - versioning / time travel / compaction / vacuum = MergeSink's.
  *
  * Tokenization is Norm.cleanText + whitespace split (the corpus
  * contract shared with the tx_* tier). `InvertedIndexSpec` proves
  * lookups and AND queries equal direct corpus scans, and that
  * incremental build ≡ full rebuild.
  */
object InvertedIndex {

  private def postingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(Norm.cleanText(col("text")), " ")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("term")
      .agg(sort_array(collect_set(col("doc_id"))).as("postings"))

  /** Full build: one scan of `docs` (doc_id, text) → term rows → MERGE. */
  def build(spark: SparkSession, path: String, docs: DataFrame,
      targetFileRows: Long = 4096): Unit = {
    MergeSink.merge(spark, path, postingsOf(docs),
      Seq("term"), Seq(col("term")), targetFileRows)
    ()
  }

  /** Incremental update: only the batch's terms are read (each a pruned
    * point-range read through the manifest) and rewritten with the new
    * doc ids unioned in. Cost scales with the batch's vocabulary, not
    * the index.
    *
    * Concurrency: this is a read-modify-write, and MergeSink's CAS only
    * serializes the WRITES — a racing addDocs could commit between our
    * postings read and our commit, and re-merging our (now stale) combined
    * batch would drop its doc ids. So the read version is pinned via
    * merge's `expectedVersion`: any advance past it ABORTS the merge
    * before commit (ReadConflictException) and the whole
    * read-combine-merge retries against the new state (optimistic
    * read-set validation — the same loop Delta's OCC runs when a
    * conflicting transaction commits first).
    */
  def addDocs(spark: SparkSession, path: String, docs: DataFrame,
      targetFileRows: Long = 4096, maxRetries: Int = 8,
      afterRead: () => Unit = () => ()): Unit = {
    // materialized once: every validate-retry reuses the batch postings,
    // only the read-combine-merge re-executes
    val fresh = postingsOf(docs).localCheckpoint(true)
    MergeSink.occRetry(path, "addDocs", maxRetries) { readV =>
      // test seam: lets a spec park this writer between its version read
      // and its commit so a racing addDocs can land first — the
      // deterministic reproduction of the lost-update window the OCC
      // retry exists for. Production callers leave the no-op default.
      afterRead()
      // pruned read-for-update: only files overlapping the batch's term
      // digests are opened (O(batch vocabulary), not O(index))
      val existing = MergeSink.readOverlapping(spark, path, fresh.select("term"), Seq("term"))
        .join(fresh.select("term"), Seq("term"), "left_semi")
        .select(col("term"), col("postings").as("old"))
      val combined = fresh
        .join(existing, Seq("term"), "left")
        .select(col("term"),
          // typedLit keeps the element type ArrayType(Long, containsNull =
          // false) — an untyped array() literal widens nullability and the
          // merge's schema-compatibility check rightly rejects the drift
          sort_array(array_distinct(concat(
            coalesce(col("old"), typedLit(Array.empty[Long])), col("postings")))).as("postings"))
      MergeSink.merge(spark, path, combined, Seq("term"), Seq(col("term")),
        targetFileRows, expectedVersion = Some(readV))
    }
    ()
  }

  /** DELETE documents from the index (r13 — the last index tier to get the
    * delete verb: ANN postings, dedup bands/windows and the cluster tables
    * all prune on upstream deletion, and a purged doc must stop being
    * retrievable too). The dropped docs' terms recompute through the same
    * tokenization that inserted them, the touched posting rows read
    * manifest-pruned, doc ids `array_except` in place — O(dropped docs'
    * vocabulary) files, never the index; rows whose postings empty out
    * stay as empty-array rows (the posting-table convention — lookups
    * return them as zero hits); re-removal is a content no-op; and the
    * commit rides the shared OCC loop so a racing addDocs can't have its
    * postings silently dropped by a stale rewrite.
    */
  def removeDocs(spark: SparkSession, path: String, docs: DataFrame,
      targetFileRows: Long = 4096, maxRetries: Int = 8): Unit = {
    val dropped = docs
      .select(col("doc_id"), explode(split(Norm.cleanText(col("text")), " ")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("term")
      .agg(collect_set(col("doc_id")).as("__drop"))
      .localCheckpoint(true) // reused by every OCC retry
    MergeSink.occRetry(path, "removeDocs", maxRetries) { readV =>
      val old = MergeSink.readOverlapping(spark, path,
        dropped.select("term"), Seq("term"))
      // inner join: rewrite ONLY the touched term rows; same-file
      // neighbors carry over through merge's copy-on-write untouched
      val updated = old.join(dropped, Seq("term"))
        .select(col("term"),
          array_except(col("postings"), col("__drop")).as("postings"))
      MergeSink.merge(spark, path, updated, Seq("term"), Seq(col("term")),
        targetFileRows, expectedVersion = Some(readV))
    }
    ()
  }

  /** Posting list of one term: O(1) files via the manifest. */
  def lookup(spark: SparkSession, path: String, term: String): DataFrame =
    MergeSink.pointRead(spark, path, Seq("term"), Seq(term))

  /** Documents containing ALL `terms` (conjunctive query). One batched
    * `pointReadKeys` scan fetches every term's posting row (union of the
    * manifest-pruned files, one Spark job instead of one per term), then
    * the intersection is a count-of-distinct-terms-per-doc filter: a doc
    * id appears in all N posting lists iff N distinct query terms carry
    * it. Posting lists are sets (collect_set at build), so the count is
    * exact.
    */
  def andQuery(spark: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "andQuery needs at least one term")
    val uniq = terms.distinct
    MergeSink.pointReadKeys(spark, path, Seq("term"), uniq.map(Seq(_)))
      .select(col("term"), explode(col("postings")).as("doc_id"))
      .groupBy("doc_id")
      .agg(count(col("term")).as("n_terms"))
      .where(col("n_terms") === uniq.size)
      .select("doc_id")
  }
}
