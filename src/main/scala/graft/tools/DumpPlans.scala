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
        |materialization; the whole recipe is one job.""".stripMargin)

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
