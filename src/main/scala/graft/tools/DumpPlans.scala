package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: regenerate PLANS.md — the committed `explain("formatted")`
  * evidence for the flagship plans, with a one-paragraph reading guide per
  * query (what the plan must show and why it survives a 100-TB scale-up).
  * Usage: runMain graft.tools.DumpPlans [sfDir] [outFile]
  */
object DumpPlans {

  private val entries: Seq[(String, String)] = Seq(
    "tpch_q1_pricing_summary" ->
      """All eight aggregates ride ONE scan: the date predicate is in
        |PushedFilters, ReadSchema carries only the 7 needed columns, and
        |partial HashAggregate sits below the single Exchange (map-side
        |combine) — at 100 TB the cost is the pruned scan, the shuffle
        |carries |groups| rows per partition.""".stripMargin,
    "tpch_q5_local_supplier" ->
      """The 6-way star: region/nation/supplier collapse into broadcasts
        |(no fact shuffle for the dims), lineitem and the date-filtered
        |orders co-shuffle once on the order key, customer joins on one
        |further exchange with the nation equality riding it. Every scan
        |is column-pruned; the revenue sum partial-aggregates.""".stripMargin,
    "tpch_q2_min_cost_supplier" ->
      """The correlated subquery is GONE from the plan — decorrelated to
        |groupBy(part).min(cost) equi-joined back on (part, cost): two
        |aggregates over the same synthetic-partsupp exchange, bounded
        |dims broadcast, final top-100 as TakeOrderedAndProject.""".stripMargin,
    "tpch_q4_order_priority" ->
      """EXISTS became a LEFT SEMI join (each order emitted at most once,
        |no fan-out, no DISTINCT) with the ship-lag inequality evaluated
        |inside the join; the quarter window prunes the orders scan.""".stripMargin,
    "tpch_q17_small_qty_revenue" ->
      """The per-group scalar correlated subquery, decorrelated: TWO pruned
        |lineitem scans by design — the avg branch reads 2 columns and
        |map-side-reduces to |parts| rows before its exchange, the probe
        |branch reads 3 columns and prunes on the broadcast brand filter
        |before its join. The alternative single-scan form (avg as a window
        |over the part key) would shuffle the ENTIRE fact; two sequential
        |pruned column scans are cheaper than one full-fact shuffle at
        |100 TB. No nested loop anywhere; PlanContractSpec pins the shape.""".stripMargin,
    "tpch_q18_large_volume" ->
      """HAVING-on-aggregate: lineitem partial-aggregates per order below
        |ONE exchange (the only fact shuffle), the threshold filter runs on
        |the aggregate, and the tiny survivor set joins BACK as the
        |broadcast side against orders and customer — verified in the final
        |adaptive plan (one lineitem scan, BroadcastHashJoin, no
        |SortMergeJoin; PlanContractSpec). Top-100 is TakeOrdered.""".stripMargin,
    "tpch_q21_waiting_suppliers" ->
      """The dual correlated existential: both distinct-supplier counts are
        |window collect_sets over the order-key partition of ONE
        |lineitem⋈orders join — the earlier groupBy-rejoin form scanned
        |lineitem twice and its late-filter IsNotNulls made the subtrees
        |non-identical, so even AQE exchange reuse could not deduplicate
        |them. One lineitem scan, one shuffle class end-to-end
        |(PlanContractSpec pins it in the final adaptive plan); per-order
        |supplier sets are bounded, so window state is O(supp/order).""".stripMargin,
    "s1_f1_new_keys_anti" ->
      """The never-ingested-keys control scan: a LEFT ANTI join whose
        |build side is the distinct key set — AQE sizes it and broadcasts,
        |so the fact side never shuffles.""".stripMargin,
    "j5_asof_join" ->
      """AS-OF via merge-ordered union (no range explosion): both sides
        |shuffle once on the key, the per-key last-value window resolves
        |the as-of match; no CartesianProduct anywhere.""".stripMargin,
    "j6_range_join_bucketed" ->
      """The bounded range join: both sides explode into their 2 covering
        |buckets, the join is an EQUI-join on (key, bucket) with the exact
        |range predicate as a residual filter — candidate pairs are
        |O(pairs-within-bound), never O(n·m).""".stripMargin,
    "l3_topk_per_group" ->
      """Two-phase salted top-k: rank within (group, salt) first — 64-way
        |parallel, WindowGroupLimit pushes rank<=3 into the sort — then
        |re-rank the 64·3 survivors per group. A single-phase window would
        |funnel each group through one task.""".stripMargin,
    "dd_minhash_lsh" ->
      """The near-dup pipeline: one compiled graft_shingles pass per doc,
        |Carter-Wegman signatures from two rolling hashes, band keys
        |exploded, and the candidate join is an EQUI-join on band_key —
        |the plan contains no cartesian, and the Jaccard verify joins the
        |shared shingle table by doc id.""".stripMargin,
    "ann_lsh_topk" ->
      """Sign-LSH search: the corpus scans once into sign buckets, the 5
        |probes (multiprobed to Hamming-1) broadcast, and scoring is the
        |codegen'd graft_dot inside the bucket equi-join — never a full
        |corpus scan per probe.""".stripMargin,
    "ev_sessionize" ->
      """Gaps-and-islands sessionization: one shuffle on user_id, both
        |windows (lag, running sum) and the final aggregate share that
        |partitioning — the plan has exactly one Exchange.""".stripMargin,
    "tx_ngram_novelty" ->
      """Cross-doc 8-gram novelty: grams explode and DISTINCT per doc ONCE
        |(exactly one Generate in the plan — the r7 form's groupBy+self-join
        |paid the dominant explode twice), document frequency rides a
        |count-over-window on the gram partition (same gram-sharded shuffle
        |the join needed, minus one exchange and the second Generate), and
        |the per-doc rollup partial-aggregates on doc_id.""".stripMargin,
    "pipe_pretrain_corpus" ->
      """The curation tier end-to-end in ONE plan: quality gate (codegen'd
        |projection on the scan), exact-dedup keeper (partial-aggregable
        |groupBy on the content hash), decontamination (broadcast probe
        |set), and the per-language rollup — Catalyst fuses all four
        |stages off the documents scan with no intermediate
        |materialization; the whole recipe is one job.""".stripMargin,
    "tpch_q9_product_profit" ->
      """The multi-fact star with the synthetic partsupp dim collapsed into a window: because ps_supplycost joins back on exactly its derivation keys (partkey, suppkey), the groupBy+re-join becomes `min() OVER (PARTITION BY l_partkey, l_suppkey)` — ONE lineitem scan (the naive form scans it twice and self-joins), with the part LIKE-filter broadcast BELOW the window (sound: the filter depends only on the partition key). Final adaptive plan at sf0.1: 1 lineitem scan, 1 Window, 4 broadcast joins (part, supplier⋈nation, orders — AQE broadcasts orders at this SF; at cluster scale it degrades gracefully to the order-key co-shuffle), 2 exchanges. PlanContractSpec pins the single-scan + window shape.""".stripMargin,
    "tpch_q8_market_share" ->
      """The widest join in the suite (7 tables) feeding a ratio-of-conditional-aggregates: numerator and denominator accumulate as two conditional DECIMAL partials over the SAME pass. Final adaptive plan at sf0.1: ONE lineitem scan; part (type-pruned) and supplier⋈nation broadcast against it; the region-filtered customer side arrives as a LEFT SEMI (6 broadcast joins, 1 sort-merge, 3 exchanges). PlanContractSpec pins the single-scan + broadcast-dims shape.""".stripMargin,
    "dd_span_dedup" ->
      """Span-level exact dedup (E70). The load-bearing properties, all visible in
        |the final plan: exactly TWO pruned document scans (ReadSchema
        |doc_id+text only) — the firsts aggregation side and the probe side; the
        |span count rides the probe explode as size() arithmetic (no third scan);
        |the first-occurrence table partial-aggregates (partial_min below its
        |exchange) so the span exchange carries distinct spans, not occurrences;
        |at sf0.1 AQE broadcasts the distinct-span table (BroadcastHashJoin
        |LeftOuter) — at corpus scale it degrades to the hash-sharded equi-join
        |with AQE skew-split, never a sort of occurrence rows; reassembly is one
        |groupBy(doc_id, n_spans) exchange with ObjectHashAggregate collect_list
        |(doc-sized state). PlanContractSpec pins the two-scan + partial-agg
        |shape.""".stripMargin,
    "tx_bpe_merge" ->
      """BPE vocabulary induction (E71, r12: 10 trained rounds). The declared
        |query is a READ: an InMemoryTableScan over the persisted winner
        |union, whose branches are localCheckpointed RDD scans — one 1-row
        |checkpoint per training round (the dd_components iteration pattern;
        |per-round cost measured flat in BASELINE r12). ZERO documents
        |FileScans appear anywhere in this plan (PlanContractSpec pins it):
        |training — the single corpus word-count pass plus vocab-sized pair
        |counts, winner broadcasts and rewrites — ran ONCE behind the
        |per-(session, dir) cache; at the lake the same artifacts persist as
        |MergeSink tables (tx_bpe_incr_lake's probe side).""".stripMargin,
    "ev_funnel" ->
      """Ordered conversion funnel (E78). The contract this plan proves: ONE
        |events scan feeding ONE exchange on user_id; the per-type timestamp
        |lists build in ObjectHashAggregate with partial aggregation below the
        |exchange (collect_list partials merge map-side), and the sequential
        |step logic (ts2/ts3) runs as array expressions ABOVE the aggregate —
        |no second scan, no join chain, no per-step passes. The final depth
        |rollup is a 4-row aggregate.""".stripMargin,
    "a14_kmv_setops" ->
      """KMV set-operation sketch (E74). The data pass is the distinct
        |partial-agg + per-type rank behind the localCheckpoint (materialized
        |before this plan — ScanAudit shows zero live event scans here); the
        |plan below is pure sketch ALGEBRA: the |types|² pair join on k-bounded
        |arrays and the estimate projections. At 100 TB only the checkpointed
        |stage touches data; this plan's cost is |types|²·k regardless of
        |corpus size.""".stripMargin,
    "dd_semdedup" ->
      """SemDeDup semantic dedup (E94). Contracts this plan proves: (1) the
        |cluster ASSIGNMENT — the one K×d BroadcastNestedLoopJoin fan-out plus
        |the max_by argmax whose partial aggregation collapses n×K candidate
        |rows to n winners BELOW the vec_id exchange — lives inside ONE
        |persisted InMemoryRelation, and all three consumers (both pair-join
        |sides and the verdict join) read the cache: the fan-out runs once as a
        |contract, not as an AQE-reuse outcome (unpersisted, 2 of 3 BNLJs
        |survived reuse — measured before the fix). (2) The within-cluster
        |pair stage is a cid-keyed SortMergeJoin carrying the cosine and
        |id-order predicates — Σ cluster² work, never CartesianProduct. (3)
        |The verdict is a distinct partial-agg + left outer equi-join,
        |hash-sharded. Window-free throughout.""".stripMargin,
    "ev_topk_trending" ->
      """Windowed trending top-k (E95). The contract: the rank NEVER sees raw
        |events — one partial-aggregable (hour, type) count collapses the
        |corpus before the exchange, and the row_number runs over the tiny
        |aggregate table. Spark's WindowGroupLimit (Partial below the
        |exchange, Final above) additionally prunes each partition to its top
        |3 BEFORE shuffling — the top-k pushdown that keeps rank state k-bounded
        |at any corpus size. The streaming twin (ev_stream_topk) maintains the
        |same counts incrementally (watermark-bounded update-mode upserts; the
        |ev_watermarked_window machinery verbatim) and runs this rank at read
        |time — top-k needs retraction under count updates, counts are pure
        |monotone upserts, so stream maintains what streams well.""".stripMargin,
    "ann_rrf_hybrid" ->
      """Hybrid retrieval via reciprocal-rank fusion (E97). Contracts: the dense
        |list is a TakeOrderedAndProject (k rows off one corpus scan against the
        |1-row broadcast probe — never a global sort); the lexical list is
        |tx_bm25_rank's plan verbatim (1-row stats broadcast, TakeOrdered); the
        |FUSION is a k×k FullOuter equi-join on doc id plus a k-row rank — the
        |whole fusion stage is O(k) and corpus-size-independent, so hybrid
        |search costs exactly its two retrievals. Swapping the dense side to
        |ann_lsh/ann_ivf changes only that subtree.""".stripMargin,
    "ev_anomaly_mad" ->
      """Median/MAD robust anomaly flags (E99). Contracts: the per-event dev
        |table (events ⋈ broadcast |types|-row median) is persisted ONCE and
        |read by both consumers — the MAD aggregation and the flag pass — so no
        |live events FileScan exists outside the InMemoryRelation (contract-
        |pinned); both aggregations collapse to |types| rows map-side and
        |broadcast back onto the scan: events NEVER shuffle. The exact
        |percentile is the oracle statement; approx_percentile (GK, partial-
        |aggregable) is the 100-TB swap with the identical plan shape.""".stripMargin,
    "gr_bfs_distance" ->
      """Multi-source BFS (E101). The contract: the visible plan is ONE
        |relaxation round — prior rounds are eagerly checkpointed (Scan
        |ExistingRDD), because relax references its input twice (keep ∪
        |neighbor+1) and an unchained 3-round plan re-expands the frontier
        |2^rounds times (ScanAudit caught 30 echoed lineitem scans; the
        |checkpoint made the query 1.8–2.2× faster outright). The sym edge
        |table persists hash-partitioned (InMemoryTableScan); the min-dist
        |groupBy partial-aggregates map-side.""".stripMargin,
    "pipe_incremental_corpus" ->
      """Incremental curation pipeline (E104). Contracts: the quality-scored
        |batch frame and its clean projection are checkpointed ONCE (Scan
        |ExistingRDD) and feed all six verdict branches; every dedup stage is an
        |equi-join (fingerprints on fp, bands on band_key from the shared
        |persisted shingle cache); the ONLY nested loop is the O(batch)×O(eval)
        |probe broadcast, contract-pinned to stay the only one. Left joins
        |flag, a CASE picks the first failing stage.""".stripMargin,
    "dd_incr_components" ->
      """Incremental connected components (E106). The visible plan is the
        |UPDATE-SET assembly — both star contractions (corpus fixed point and
        |delta propagation) ran to convergence behind localCheckpoints (Scan
        |ExistingRDD), exactly like dd_components_star's rounds; what remains is
        |the batch left join and the changed-label fan-out equi-join, both
        |hash-sharded. No live documents scan: candidates came from the shared
        |shingle cache inside the contractions.""".stripMargin,
    "ann_ivf_topk" ->
      """The r9 operating point: the trained-cell tables come back as
        |InMemoryTableScan (the session caches — training is construction,
        |not probe cost), the probe-cell assignment broadcasts, and the
        |data-sized branch is ONE equi-join of the corpus against the
        |broadcast pcells on the cell id — at the lake the corpus is
        |partitioned by cell and this join IS partition pruning
        |(nprobe/cells of the table read).""".stripMargin,
    "ann_ivfpq_topk" ->
      """The composed index probe: cached code table joined to cached cell
        |assignments, restricted by the broadcast probe-cell set BEFORE the
        |eight broadcast ADC lookups — so the ADC work runs on the pruned
        |candidate set only; the fixed-order adist sum feeds a per-probe
        |window (cell-bounded rows), and the exact-cosine refine touches
        ||probes|·Refine original vectors via two broadcast joins. No
        |corpus-sized shuffle anywhere after the cached tables.""".stripMargin,
    "ann_knn_join" ->
      """The batch-ANN shape: the all-vector probe assignment collapses
        |map-side (collect-sort-slice aggregate over the broadcast centroid
        |table — n rows reach the exchange, never n×k), candidates come
        |from ONE equi-join on the cell id against the cached assignment
        |(pair volume nprobe·occupancy per vector, held constant by the
        |planner), and the per-vector rank windows over cell-bounded
        |candidate sets.""".stripMargin,
    "dd_incr_lsh_lake" ->
      """The lake probe: the corpus side is a parquet scan of ONLY the
        |manifest-pruned posting files (readOverlapping lists the hit set —
        |no directory listing of the full table), the batch bands derive
        |from the shared shingle cache, and the explode+verify joins are
        |batch-sized. The one corpus-sized structure in the plan is the
        |pruned file scan itself — O(batch-bands) files by the manifest's
        |key-digest intervals.""".stripMargin,
    "mm_avg_hash" ->
      """The real-codec multimodal path: ONE documents scan feeds the
        |mapPartitions BMP encode (fixture synthesis) and decode+aHash
        |(the featurizer under test) — all in a single stage, no shuffle at
        |all; the per-record work is the container parse, which is exactly
        |what a JNI codec binding would slot into.""".stripMargin,
    "mm_frame_sample" ->
      """The r10 real-VIDEO path: same single-stage shape as mm_avg_hash —
        |one documents scan, mapPartitions AVI encode (fixture synthesis)
        |then demux + per-frame DIB decode, one row out per sampled frame
        |(the one-to-many demuxer iterator), zero shuffles. The last media
        |kind off the stub.""".stripMargin,
    "cu_token_budget" ->
      """The r10 distributed prefix sum (TotalOrder): ONE live documents
        |scan; the running total rides Window [..], [__pkt..] — a BUCKET
        |partition spec, never the r9 empty one that funneled the corpus
        |through a single task — with the per-bucket offsets folded in as
        |LITERALS (the histogram job ran at plan build, a second parallel
        |pass). Exchange hashes on __pkt: every window task sees one
        |bucket. Flat 1×/3×/10× wall in BASELINE.md is this plan's
        |receipt.""".stripMargin,
    "cu_shard_balance" ->
      """Same TotalOrder machinery for the global RANK: bucket-partitioned
        |row_number + literal offsets, then the snake-fold arithmetic and
        |an 8-row partial-aggregated shard rollup. No unpartitioned window
        |anywhere (QuerySmokeSpec's scale guard asserts this across all
        |declared queries).""".stripMargin,
    "dd_incr_span_lake" ->
      """The daily span probe against the LAKE: the corpus span set is a
        |MergeSink table and this plan's scan lists ONLY the files whose
        |key-digest interval brackets a batch span (readOverlapping manifest
        |pruning — the file list is in the scan's Location). Batch spans
        |derive in-plan (O(batch)); the existence check is the residual
        |left join over the pruned files. Since r13 the table carries the
        |per-window refcount and the probe filters cnt > 0 inside the scan
        |stage — a deleteDocs-zeroed window is dead before its physical
        |prune commits (fail-closed across the two-commit gap).""".stripMargin,
    "pipe_incremental_corpus_lake" ->
      """Every verdict stage O(batch) against pruned lake tables: exact-dup
        |probes the fp MergeSink, near-dup candidates come from the batch
        |band self-join + the band-postings probe, and the exact-Jaccard
        |verify reads corpus shingles from the doc-keyed shingle table
        |pruned to the touched ids — NO corpus-wide artifact is derived
        |in-plan. The one BroadcastNestedLoopJoin is the pinned-eval
        |substring probe (O(batch)×O(eval)), the same fan-out the in-plan
        |pipeline carries.""".stripMargin,

    "dd_exact_substr" ->
      """HASH-KEYED two-phase ExactSubstr (r11): the corpus-sized exchange
        |is groupBy(h) over the codegen'd rolling hash — 8-byte keys,
        |partial_count map-side combine — and only hash-repeating rows
        |(the LogicalRDD below is the checkpointed candidate set, a
        |vanishing fraction) carry strings into the exact (h, s) verify
        |re-count. n_win is per-doc arithmetic on the single live documents
        |scan: no second explode, no Window anywhere. Measured shuffle
        |write 7.6 → 2.1 MB at sf0.1 (3.6×).""".stripMargin,

    "dd_incr_substr_lake" ->
      """The lake probe joins on the TWO 64-bit keys (h = rolling hash,
        |fp = xxhash64 verify) against the string-free window table —
        |manifest pruning and any shuffle ride fixed-width longs; the
        |batch-internal dup set is the two-phase shape in miniature and
        |the string column is dropped before the corpus join (78 → 49 MB
        |shuffle at the 10× replica). r13: the table adds the per-window
        |refcount (still all-longs, contract-pinned) and the probe's
        |cnt > 0 residual runs inside the scan stage.""".stripMargin,

    "ann_ivf_lake" ->
      """The lake-served IVF probe: pcells from the read-back centroid
        |table (broadcast), member postings from the manifest-pruned FILE
        |subset of the cell-keyed posting table (the FileScan below lists
        |only the hit files), exact cosine against original vectors, plain
        |per-probe rank — identical results to ann_ivf_topk with zero
        |training work in-plan.""".stripMargin,

    "ann_ivfpq_incr" ->
      """The incremental lake index end-to-end at probe time: everything
        |corpus-sized is a read of MERGED posting tables (slice built +
        |batch appended through readOverlapping read-modify-write); the
        |ADC table derives from the read-back codebook (broadcast), the
        |shortlist is cell-bounded, the refine touches |probes|·Refine
        |original vectors. No retrain, no corpus re-encode in any run
        |after the first.""".stripMargin,

    "mm_png_stats" ->
      """Image stats through the COMPRESSED container: one documents scan,
        |PNG encode/decode inside mapPartitions (CRC-checked chunk walk,
        |multi-IDAT Inflater, all five scanline filters) — per-doc work,
        |no shuffle until the implicit output collect.""".stripMargin,
    "ann_ivfpq_delete" ->
      """The probe AFTER the posting DELETE (r12): the plan is
        |ann_ivfpq_incr's — manifest-pruned salted posting reads, broadcast
        |read-back codebook, cell-bounded shortlist, exact refine — because
        |the delete happened to STORAGE (array_except / lambda-filter over
        |the touched files only, OCC-pinned commit), not to the query. A
        |dropped vector is simply absent from the posting arrays the
        |FileScan returns; nothing in-plan filters it.""".stripMargin,
    "tx_bpe_incr_lake" ->
      """Incremental batch tokenization against the PERSISTED tokenizer:
        |the batch docs scan prunes on doc_id % 5 (one pruned documents
        |pass), the word→rep side is a FileScan of the manifest-pruned
        |subset of the rep lake table (readOverlapping on the batch's word
        |digests), joined word-sharded and rolled up per doc. NO training
        |in-plan: the 10 merge rounds ran once at build and live in
        |storage — at 100 TB a daily tokenize reads O(batch ∪ its
        |vocabulary files), never the corpus.""".stripMargin,
    "ann_graph_beam" ->
      """The graph walk's FINAL round (each beam round localCheckpoints, so
        |the visible plan is the last union + rank): the per-probe window
        |ranks a candidate set the law bounds at ≤ entries·nprobe + rounds·ef·M
        |rows per probe — there is no corpus-sized exchange anywhere; the
        |corpus appears only as the scoring join's scan side, which is the
        |in-plan tier's honest limit (the lake twin removes it).""".stripMargin,
    "ann_graph_lake" ->
      """The same walk over MergeSink posting tables: every per-round
        |FileScan lists ONLY the manifest-pruned files of that round's key
        |set (beam ids → adjacency rows, unseen ids → vectors) — probe IO
        |is O(candidate files) at any corpus size, measured flat at 10×
        |data. The centroid read is the |cells|-row routing table every
        |lake ANN tier pays.""".stripMargin,
    "ann_graph_incr" ->
      """The walk over the slice-built + batch-INSERTED index — the plan is
        |ann_graph_lake's (pruned per-round fetches) because the insert
        |happened to STORAGE exactly (maintained tables ≡ one-shot rebuild,
        |spec-pinned): nothing in-plan distinguishes a maintained index
        |from a rebuilt one, which is the maintenance contract.""".stripMargin)

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = graft.Sessions.local(appName = "graft-dumpplans")
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append(
      s"""# PLANS — `explain("formatted")` evidence for the flagship plans
         |
         |Generated by `runMain graft.tools.DumpPlans $dir` — regenerate after
         |any plan-shaped change; PlanContractSpec asserts the load-bearing
         |properties in CI, this file is the human-readable audit trail. Scan
         |paths reference $dir (the plans are SF-independent; AQE may swap
         |join strategies at other scales, which is the point of leaving the
         |strategy to AQE).
         |""".stripMargin)
    for ((name, note) <- entries) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      sb.append(s"\n## $name\n\n")
      sb.append(note.linesIterator.map(_.trim).mkString(" ")).append("\n\n")
      sb.append("```\n")
      sb.append(df.queryExecution.explainString(FormattedMode).trim)
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out (${entries.size} plans)")
    spark.stop()
  }
}
