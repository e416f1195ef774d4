package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Plan CONTRACTS for the performance-critical queries: the physical shape
  * each one exists to demonstrate is asserted, so a refactor that silently
  * degrades the plan (a TakeOrdered becoming a global sort, an anti-join
  * losing its broadcast, a filter falling out of the scan) fails CI, not
  * the 100-TB run. Static shapes are read from the initial plan; AQE
  * runtime choices are read from the final adaptive plan after executing
  * at sf0.001.
  */
class PlanContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def df(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, sf)

  private def initialPlan(name: String): String =
    df(name).queryExecution.executedPlan.toString

  /** Drop every InMemoryRelation's indented subtree from a plan printout —
    * cached subtrees echo under each InMemoryTableScan (twice once
    * materialized: Final + Initial sections), so node-count assertions on
    * the LIVE outer plan must strip them first.
    */
  private def stripCachedSubtrees(p: String): Vector[String] = {
    def indent(l: String) = l.takeWhile(c =>
      c == ' ' || c == ':' || c == '+' || c == '-' || c == '*' || c == '(').length
    var cacheIndent = -1
    p.linesIterator.toVector.filter { l =>
      if (cacheIndent >= 0 && indent(l) > cacheIndent && l.trim.nonEmpty) false
      else {
        cacheIndent = if (l.contains("InMemoryRelation")) indent(l) else -1
        true
      }
    }
  }

  private def finalPlan(name: String): String = {
    val d = df(name)
    d.collect() // drive AQE to its final plan
    // the adaptive plan's toString appends the pre-AQE "Initial Plan"
    // section — slice it off so node counts reflect what actually ran
    d.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("s1 anti-join: AQE broadcasts the distinct-key build side") {
    val p = finalPlan("s1_f1_new_keys_anti")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "anti-join regressed to a shuffled join")
  }

  test("l2 global top-k plans as TakeOrdered, not a global sort") {
    val p = initialPlan("l2_topk_recency")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("tpch_q1 aggregates map-side: partial+final HashAggregate, one exchange") {
    val p = initialPlan("tpch_q1_pricing_summary")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1, p.take(1500))
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p.take(1500))
  }

  test("filter queries push predicates into the parquet scan") {
    Seq("tpch_q1_pricing_summary", "f10_dispatch_guards", "k9_watermark_advance")
      .foreach { q =>
        val p = initialPlan(q)
        assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
          s"$q lost its scan pushdown")
      }
  }

  test("scans are column-pruned to the projection") {
    // p7 projects 4 of customer's 8 columns; the scan must not read more
    val p = initialPlan("p7_coalesce_alias")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.nonEmpty && read.count(_ == ':') <= 4, s"scan reads too much: $read")
  }

  test("j2 star join: bounded dims broadcast; the fact side is never broadcast") {
    val p = finalPlan("j2_star_join_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // the operator and the scan it feeds print on DIFFERENT lines, so the
    // check walks each BroadcastExchange SUBTREE (following lines with
    // deeper indentation) and asserts none of them scans lineitem
    val lines = p.linesIterator.toVector
    def indent(l: String): Int = l.indexWhere(c => c != ' ' && c != '+' && c != '-' && c != ':')
    lines.zipWithIndex.filter(_._1.contains("BroadcastExchange")).foreach { case (bl, i) =>
      val d = indent(bl)
      val subtree = lines.drop(i + 1).takeWhile(l => indent(l) > d)
      assert(!subtree.exists(_.contains("lineitem")),
        s"the fact table is inside a broadcast subtree:\n${(bl +: subtree).mkString("\n")}")
    }
  }

  test("l3 per-group top-k keeps the two-phase salted shape") {
    val p = initialPlan("l3_topk_per_group")
    // two window stages (the salted local rank, then the global re-rank),
    // each with the rank<=3 pushed down as a WindowGroupLimit
    assert(p.linesIterator.count(_.contains("- Window [")) == 2, p.take(2000))
    assert(p.linesIterator.exists(_.contains("WindowGroupLimit")),
      "rank filter no longer pushes into the window")
  }

  test("bm25: the corpus-stats row is broadcast, ranking is TakeOrdered") {
    val p = initialPlan("tx_bm25_rank")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1500))
    assert(p.contains("TakeOrderedAndProject"),
      "bm25 top-k regressed to a global sort")
  }

  test("kmeans: centroids broadcast every iteration; corpus is never broadcast") {
    val p = initialPlan("cu_kmeans")
    // 3 assignment rounds → ≥3 broadcasts of the K-row centroid side
    assert(p.linesIterator.count(_.contains("BroadcastExchange")) >= 3, p.take(2000))
    val lines = p.linesIterator.toVector
    def indent(l: String): Int = l.indexWhere(c => c != ' ' && c != '+' && c != '-' && c != ':')
    lines.zipWithIndex.filter(_._1.contains("BroadcastExchange")).foreach { case (bl, i) =>
      val d = indent(bl)
      val subtree = lines.drop(i + 1).takeWhile(l => indent(l) > d)
      // a broadcast subtree may aggregate OVER the corpus scan (K×d rows
      // out) or scan the K seed rows under a pushed vec_id filter, but
      // must never broadcast the raw unbounded embeddings relation
      val scansRaw = subtree.exists(_.contains("embeddings.parquet"))
      val bounded = subtree.exists(_.contains("HashAggregate")) ||
        subtree.exists(_.contains("Window")) ||
        subtree.exists(_.contains("LessThan(vec_id"))
      assert(!scansRaw || bounded,
        s"raw corpus broadcast:\n${(bl +: subtree).mkString("\n").take(1500)}")
    }
  }

  test("j7 full outer: shuffle join on the key, both sides reduced first") {
    val p = initialPlan("j7_full_outer")
    assert(p.contains("FullOuter"), p.take(1500))
    // unmatched rows survive on both sides, so neither may broadcast;
    // the aggregation on the orders side must happen BELOW the join
    assert(!p.contains("BroadcastHashJoin"), "full outer cannot broadcast a side")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p.take(1500))
  }

  test("incremental LSH dedup: band equi-join, never a corpus cross product") {
    val p = initialPlan("dd_incr_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("edit distance runs only on blocked candidate pairs") {
    val p = initialPlan("tx_edit_dist")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("pagerank: contributions partial-aggregate before each shuffle") {
    val p = initialPlan("gr_pagerank")
    // every groupBy(dst) must have a map-side partial HashAggregate — the
    // property that keeps per-iteration shuffle volume O(nodes), not
    // O(edges)
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 6, p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), "top-50 regressed to a global sort")
  }

  test("tpch_q4: EXISTS decorrelates to a LEFT SEMI join; the quarter filter reaches the scan") {
    val p = initialPlan("tpch_q4_order_priority")
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "order-date window no longer pushes into the orders scan")
  }

  test("tpch_q10: returnflag prunes the lineitem scan; nation broadcasts; top-20 is TakeOrdered") {
    val p = initialPlan("tpch_q10_returned_items")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returnflag filter fell out of the lineitem scan")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), "top-20 regressed to a global sort")
  }

  test("tpch_q14: one lineitem pass — both conditional sums share a single scan and agg") {
    val p = initialPlan("tpch_q14_promo_effect")
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1,
      "the promo ratio must not scan lineitem twice")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "ship-month window no longer pushes into the scan")
  }

  test("tpch_q18: the HAVING aggregate partial-aggregates below the joins; facts never broadcast the big side") {
    val p = initialPlan("tpch_q18_large_volume")
    // partial+final HashAggregate for the per-order quantity sum
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), "top-100 regressed to a global sort")
  }

  test("ngram novelty: gram join is an equi-join, never a cross product") {
    val p = initialPlan("tx_ngram_novelty")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    // the final per-doc groupBy partial-aggregates; the within-doc dedupe
    // is MAP-SIDE (r17): array_distinct in the projection, never a
    // distinct-aggregate exchange of gram strings — exactly ONE gram-keyed
    // exchange (the df window) plus the doc_id rollup may shuffle
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p.take(2000))
    assert(p.contains("array_distinct"),
      "within-doc gram dedupe must stay map-side (array_distinct):\n" + p.take(2000))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      "more exchanges than the df window + doc rollup:\n" + p.take(2000))
  }

  test("ngram novelty: the 8-gram explode runs ONCE (df via window, not a self-join)") {
    // r7 verdict #3: the groupBy+join form computed the Scan→Generate→
    // distinct subtree twice; the window form cannot — pin it
    val p = initialPlan("tx_ngram_novelty")
    assert(p.linesIterator.count(_.contains("Generate explode")) == 1,
      "the gram explode must appear exactly once:\n" + p.take(2000))
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      "documents must be scanned exactly once")
    assert(p.contains("collect_set") || p.linesIterator.exists(_.contains("- Window [")),
      "doc frequency must ride a window over the gram partition")
  }

  test("tpch_q21: one lineitem scan; both existential counts ride one order-key window") {
    // r7 verdict #3/#4: the groupBy-rejoin form scanned lineitem (and
    // joined orders) twice, and the late-filter's pushed IsNotNulls made
    // the subtrees non-identical so exchange reuse could never fire
    val p = finalPlan("tpch_q21_waiting_suppliers")
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1,
      "q21 must scan lineitem exactly once:\n" + p.take(2000))
    assert(p.linesIterator.count(_.contains("orders.parquet")) == 1,
      "q21 must scan orders exactly once")
    assert(p.linesIterator.count(_.contains("- Window [")) == 2,
      "the two distinct-supplier counts must be window collect_sets")
    assert(p.contains("TakeOrderedAndProject"), "top-100 regressed to a global sort")
  }

  test("tpch_q18: one lineitem scan; the survivor set joins back as the broadcast side") {
    val p = finalPlan("tpch_q18_large_volume")
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1,
      "q18 must aggregate lineitem once, not rescan it for the re-join")
    // the HAVING survivors are tiny — AQE must broadcast them against
    // orders rather than shuffling the orders fact
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "survivor re-join regressed to a shuffle join")
  }

  test("tpch_q17: decorrelated avg — two PRUNED scans, partial agg, no nested loop") {
    // the double scan is DELIBERATE: the avg branch map-side-reduces to
    // |parts| rows before its exchange, while a single-scan window form
    // would shuffle the whole fact — at 100 TB two pruned column scans
    // are cheaper than one full-fact shuffle (PLANS.md has the numbers)
    val p = initialPlan("tpch_q17_small_qty_revenue")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the correlated subquery must stay decorrelated")
    val lineitemScans = p.linesIterator.filter(_.contains("lineitem.parquet")).toVector
    assert(lineitemScans.size == 2, s"expected the two-branch shape, got:\n$p".take(2000))
    // both scans column-pruned: avg branch 2 cols, probe branch 3 cols
    lineitemScans.foreach { l =>
      val cols = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(l)
        .map(_.group(1).count(_ == ':')).getOrElse(-1)
      assert(cols >= 2 && cols <= 3, s"scan reads too much: ${l.take(300)}")
    }
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "per-part average must partial-aggregate below its exchange")
  }

  test("tpch_q15/q11: ONE lineitem scan each — global max/total as a window over the aggregated frame") {
    Seq("tpch_q15_top_supplier", "tpch_q11_important_stock").foreach { q =>
      val p = finalPlan(q)
      assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1,
        s"$q replicates its fact aggregation subtree")
      assert(!p.contains("BroadcastNestedLoop"), s"$q regressed to a nested-loop threshold join")
    }
  }

  test("tpch_q2: ONE lineitem scan — min-cost decorrelation is a window, not a groupBy re-join") {
    val p = finalPlan("tpch_q2_min_cost_supplier")
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1,
      "the partsupp aggregation must not be computed twice")
    assert(p.contains("Window"), "expected the per-part window min")
    assert(p.contains("TakeOrdered"), "top-100 must stay a TakeOrdered, not a global sort")
  }

  test("tpch_q9: ONE lineitem scan — the partsupp round-trip is a window, not a self-join") {
    val p = finalPlan("tpch_q9_product_profit")
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1,
      "the synthetic-partsupp cost join must stay a pair-key window over the single scan")
    assert(p.contains("Window"), "expected the window-min ps_supplycost")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("tpch_q8: ONE lineitem scan; part and supplier resolve by broadcast") {
    val p = finalPlan("tpch_q8_market_share")
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1)
    assert(p.contains("BroadcastHashJoin"), "part/supplier dims must broadcast")
  }

  test("pipeline: near-dup chain runs ONCE; decontamination is one left-anti probe pass") {
    val p = finalPlan("pipe_pretrain_corpus")
    // 2 Generates = the two sides of the band self-join (inherent to a
    // self-join); 3+ means a stage re-references the verified-pair subtree
    assert(p.linesIterator.count(_.contains("Generate explode")) == 2,
      "the LSH band chain must appear exactly once per self-join side")
    val bnlj = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toVector
    assert(bnlj.size == 1 && bnlj.head.contains("LeftAnti"),
      s"decontamination must be ONE left-anti probe broadcast, got:\n${bnlj.mkString("\n")}")
  }

  test("ev_funnel: one events pass — no per-step join chain") {
    val p = initialPlan("ev_funnel")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("events.parquet")) == 1,
      "the funnel must read events exactly once (per-type lists, not step joins)")
    assert(p.contains("partial_collect_list") || p.contains("objHashAggregate") ||
      p.contains("ObjectHashAggregate"),
      "per-type timestamp lists must build in the aggregate")
  }

  test("cu_mixture_weights: one corpus scan feeds the whole allocation") {
    val p = initialPlan("cu_mixture_weights")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents.parquet")) == 1,
      "weight total / shortfall must be windows over the domain table, " +
        "not re-derived aggregate branches")
  }

  test("dd_exact_substr: skew-proof shape — partial-agg dup set on the 8-BYTE hash, no gram-row window") {
    // the gram stream is the heaviest volume class in the dedup tier: the
    // occurrence count must be a map-side-combined aggregate (heavy
    // boilerplate windows collapse BEFORE the shuffle), never a
    // count-over-window that ships every gram row to one reducer per key —
    // and since r11 the corpus-sized exchange must carry the 64-bit
    // rolling hash, NOT window strings (the r10 verdict's ask #2)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.types.{LongType, StringType}
    val cand = DedupQueries.substrCandidates(spark, sf)
    val cp = cand.queryExecution.executedPlan.toString
    assert(!cp.contains("Window"),
      "occ regressed to a gram-row window — one boilerplate key melts a reducer")
    assert(cp.contains("partial_count"),
      "the dup-hash count lost its map-side partial phase")
    // the corpus-sized aggregate groups by EXACTLY one LongType key (h):
    // a string in the grouping would put the W-word windows back on the wire
    val gramAggs = cand.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.groupingExpressions.nonEmpty => a
    }
    assert(gramAggs.nonEmpty)
    gramAggs.foreach { a =>
      assert(a.groupingExpressions.forall(_.dataType == LongType),
        s"gram-stream aggregate key is not the 8-byte hash: ${a.groupingExpressions}")
    }
    // ...and the candidate join key is hash-only too
    cand.queryExecution.optimizedPlan.collect { case j: Join => j }.foreach { j =>
      assert(j.condition.forall(_.references.forall(_.dataType == LongType)),
        s"candidate join regressed off the 8-byte key: ${j.condition}")
    }
    // the FULL query keeps the exact string verify within hash buckets
    // (the (h, s) re-count) and needs only ONE live documents scan — the
    // n_win side is per-doc arithmetic; the gram subtree sits behind the
    // checkpoint, asserted above
    val p = initialPlan("dd_exact_substr")
    assert(!p.contains("Window"))
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents.parquet")) == 1,
      "n_win must be per-doc arithmetic on one pruned scan (no extra explode)")
    val q = df("dd_exact_substr")
    val verifyJoins = q.queryExecution.optimizedPlan.collect { case j: Join => j }
      .filter(_.condition.exists(_.references.exists(_.dataType == StringType)))
    assert(verifyJoins.nonEmpty,
      "the within-bucket STRING verify join is gone — hash collisions would leak")
  }

  test("dd_incr_substr_lake: the corpus probe joins on the two 64-bit keys, table stores no strings") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.types.LongType
    // the lake window table is (h, fp, refcount) ONLY — fixed-width longs,
    // the W×-smaller state the 100-TB design demands; a string column
    // reappearing here fails (cnt is the r13 per-window refcount that
    // makes document DELETION reach this tier)
    val sink = DedupQueries.ensureSubstrSink(spark, sf)
    val schema = graft.ingest.MergeSink.read(spark, sink).schema
    assert(schema.fieldNames.toSet == Set("h", "fp", "cnt"),
      s"window table regressed to string storage: ${schema.simpleString}")
    assert(schema.fields.forall(_.dataType == LongType))
    // and the probe's corpus join references only LongType keys
    val q = df("dd_incr_substr_lake")
    val hashJoins = q.queryExecution.optimizedPlan.collect { case j: Join => j }
      .filter(_.condition.exists(c =>
        c.references.nonEmpty && c.references.forall(_.dataType == LongType)))
    assert(hashJoins.nonEmpty,
      "the corpus probe lost its hash-only (h, fp) join key")
  }

  test("dd_span_dedup: exactly two pruned document scans, partial-agg firsts") {
    val p = initialPlan("dd_span_dedup")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents.parquet")) == 2,
      "span dedup must scan documents exactly twice (firsts side + probe side)")
    assert(p.contains("partial_min"),
      "first-occurrence keys must partial-aggregate below their exchange")
    // the span count must ride the explode, not a third aggregation over spans
    assert(!p.contains("partial_count(1), partial_min") &&
      p.linesIterator.count(_.contains("Generate posexplode")) == 2, p.take(1200))
  }

  test("cu_ngram_decontaminate: corpus grams broadcast-join the eval set") {
    val p = finalPlan("cu_ngram_decontaminate")
    // the contamination join must be a broadcast HASH join on the gram —
    // the whole point vs cu_decontaminate's nested-loop substring probe
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "gram decontamination regressed to the nested-loop substring shape")
    // the CORPUS gram stream must flow map-side into that join: no
    // exchange may sit between the corpus-side Generate (explode) and the
    // join — only the matched collision rows shuffle (for the distinct
    // aggregate). The eval branch's Generate feeds the broadcast; assert
    // at least one Generate has no Exchange above it before the join.
    val lines = p.linesIterator.toVector
    val joinIdx = lines.indexWhere(_.contains("BroadcastHashJoin"))
    val corpusSide = lines.drop(joinIdx + 1)
      .takeWhile(l => !l.contains("BroadcastExchange"))
    assert(corpusSide.exists(_.contains("Generate")) &&
      !corpusSide.exists(_.contains("Exchange")),
      s"corpus grams shuffle before the contamination join:\n${corpusSide.mkString("\n")}")
  }

  test("ev_scd2_history: one user shuffle serves all three window passes") {
    val p = initialPlan("ev_scd2_history")
    assert(p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(user_id")) == 1,
      s"change-detect lag, close-out lead and version must reuse ONE " +
        s"user_id exchange:\n${p.take(1500)}")
  }

  test("ev_attribution: single events scan, window then small-key rollup") {
    val p = initialPlan("ev_attribution")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("events.parquet")) == 1, p.take(1200))
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p.take(1200))
  }

  test("a15_column_stats: one lineitem scan; Expand feeds the distinct agg") {
    val p = initialPlan("a15_column_stats")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem.parquet")) == 1,
      "ANALYZE must be one pass over the table")
    assert(p.contains("Expand"), "exact multi-column NDV must plan as Expand")
  }

  test("dd_entity_match: candidates only from equi-blocks, never all-pairs") {
    val p = initialPlan("dd_entity_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "entity matching regressed to an all-pairs join")
    // levenshtein must sit ABOVE an equi-join (join keys blk + nationkey)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p.take(1200))
  }

  test("tx_bpe_merge: training cached once; the query reads the winners table, ZERO live corpus scans") {
    // r12: training moved out of the query plan entirely — the N-round
    // loop localCheckpoints each round and the winner union persists per
    // (session, dir), so the declared query is a read of the trained
    // artifact (the pre-r12 unrolled form showed 7 cache reads; a
    // regression to live training re-introduces documents FileScans here)
    val p = initialPlan("tx_bpe_merge")
    assert(p.contains("InMemoryTableScan"),
      "the winners must come from the persisted trained-artifact cache")
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents.parquet"))
    assert(scans == 0, s"live corpus scans in the BPE query plan: $scans")
  }

  test("dd_semdedup: assignment cached once, pair join equi, no window rank") {
    val p = initialPlan("dd_semdedup")
    // the assignment table (holding the K×d broadcast + argmax) is
    // persisted: all three consumers must read the cache, so NO nested
    // loop (and no all-pairs) may appear in the outer plan
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 3,
      s"pair sides + verdict join must read the cached assignment:\n${p.take(1500)}")
    // each InMemoryTableScan prints the cached subtree (which holds the
    // one legitimate K×d fan-out; once materialized, its AQE printout even
    // repeats it under == Final Plan == AND == Initial Plan ==) — so strip
    // every InMemoryRelation's indented subtree and assert no BNLJ remains
    // as a LIVE node in the outer plan
    val outer = stripCachedSubtrees(p)
    assert(!outer.exists(_.contains("BroadcastNestedLoopJoin")),
      "a centroid fan-out (or an all-pairs join) leaked out of the assignment cache")
    assert(!p.contains("CartesianProduct"), "pair stage regressed to all-pairs")
    // within-cluster pairing is an equi-join on cid
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(1500))
    // the assignment argmax is a partial-aggregable max_by, NOT a
    // rank-over-n×K window (the exchange must carry n rows, not n×K)
    assert(!p.contains("Window"), "assignment argmax regressed to a window rank")
  }

  test("ev_topk_trending: rank runs over the aggregate table, not raw events") {
    val p = initialPlan("ev_topk_trending")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("events.parquet")) == 1,
      "trending must be one events pass")
    // the Window (rank) must sit ABOVE the final HashAggregate: counts
    // collapse the corpus to hours × |type| rows before any rank state
    val lines = p.linesIterator.toVector
    val winIdx = lines.indexWhere(_.contains("Window"))
    val aggIdx = lines.indexWhere(_.contains("HashAggregate"))
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"rank does not run over the aggregated counts:\n${p.take(1200)}")
  }

  test("cu_token_budget: one live documents scan; the prefix sum is bucket-partitioned") {
    val p = initialPlan("cu_token_budget")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents.parquet")) == 1,
      "the budget cut's LIVE plan must be one corpus pass (the bucket " +
        "histogram is a separate plan-build job)")
    // the running sum must ride the TotalOrder bucket partition — a
    // corpus-sized window with no partition spec is the 100-TB funnel the
    // r9 verdict flagged
    val win = p.linesIterator.find(_.trim.startsWith("+- Window "))
      .orElse(p.linesIterator.find(_.contains("Window ["))).getOrElse("")
    assert(win.contains("__pkt"),
      s"budget window lost its bucket partition spec: $win")
  }

  test("cu_shard_balance: the global rank is bucket-partitioned, never one task") {
    val p = initialPlan("cu_shard_balance")
    val win = p.linesIterator.find(_.contains("Window [")).getOrElse("")
    assert(win.contains("__pkt"),
      s"shard rank lost its bucket partition spec: $win")
    // rank + snake fold + final shard rollup partial-aggregates map-side
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p.take(1500))
  }

  test("ann_rrf_hybrid: both inputs are top-k lists; fusion is an equi-join") {
    val p = initialPlan("ann_rrf_hybrid")
    // the dense list must come from a TakeOrdered, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    // the fusion join is a doc-id equi-join (FullOuter), not a nested loop
    assert(p.contains("FullOuter"), p.take(1500))
    val outer = stripCachedSubtrees(p)
    assert(!outer.exists(_.contains("CartesianProduct")), "fusion regressed to all-pairs")
  }

  test("cu_embed_decontaminate: one probe fan-out, map-side accounting collapse") {
    val p = initialPlan("cu_embed_decontaminate")
    // exactly the O(|eval|) probe broadcast against the corpus scan
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1, p.take(1500))
    // the per-probe count/max must partial-aggregate below the exchange
    assert(p.contains("partial_count") || p.contains("partial_max"),
      "accounting aggregate lost its map-side partial phase")
  }

  test("dd_media_dedup: multiprobe pairs meet in equi-buckets, never all-pairs") {
    val p = initialPlan("dd_media_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "media pair stage regressed to an unbounded join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(1200))
    // the 17-way probe fan-out is a Generate fused below the join
    assert(p.contains("Generate"), "probe masks must expand via explode, not a join")
  }

  test("gr_bfs_distance: rounds checkpoint; edges come from the cache") {
    val p = initialPlan("gr_bfs_distance")
    // prior rounds are materialized (localCheckpoint → ExistingRDD), so the
    // final plan is ONE relax step — without the checkpoint the frontier
    // subtree re-expands 2^rounds times (ScanAudit caught 30 echoed scans)
    assert(p.contains("Scan ExistingRDD"),
      s"relaxation rounds are not checkpointed:\n${p.take(1500)}")
    // r17: the sym table is the SHARED layout-pinned checkpoint
    // (GraphQueries.symTable → LogicalRDD), no longer an InMemoryRelation —
    // the final round reads it as a second ExistingRDD scan, and no live
    // lineitem scan may appear anywhere in the round's plan
    assert(p.linesIterator.count(_.contains("Scan ExistingRDD")) >= 2,
      "the final round must read the checkpointed sym table:\n" + p.take(1500))
    val outer = stripCachedSubtrees(p)
    assert(!outer.exists(l => l.contains("FileScan parquet") && l.contains("lineitem.parquet")),
      "a live lineitem scan escaped the edge checkpoint — a round re-derives edges")
  }

  test("ev_ewma_smooth: one events scan, partial collect below the exchange") {
    val p = initialPlan("ev_ewma_smooth")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("events.parquet")) == 1,
      "the fold must consume ONE ordered collect per type")
    assert(p.contains("partial_collect_list"),
      "per-type sequence must partial-aggregate map-side")
  }

  test("pipe_incremental_corpus: verdict joins are equi; probe broadcast is the only fan-out") {
    val p = initialPlan("pipe_incremental_corpus")
    val outer = stripCachedSubtrees(p)
    // the ONLY nested loop allowed is the eval-probe broadcast (substring
    // predicate, O(batch)×O(eval)); every dedup stage must join on a key
    assert(outer.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"a dedup stage regressed to a nested loop:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    // the near-dup stages must ride the shared persisted shingle table
    assert(p.contains("InMemoryTableScan"),
      "band candidates must come from the shared shingle cache")
  }

  test("ann ivf/pq/ivfpq/knn: training cached, corpus never broadcast raw, no all-pairs") {
    // the r9 recall fixes (trained cells, normalized PQ, exact refine) ride
    // plan properties that only value-tests guarded: pin them. (1) the
    // trained tables come from the PlanCache — a refactor that re-derives
    // them re-trains per consumer; (2) any broadcast subtree touching the
    // corpus must be bounded (an aggregate, a cache read, or the probe
    // filter) — the raw embeddings relation must never be the build side;
    // (3) no stage regresses to an unkeyed all-pairs join.
    Seq("ann_ivf_topk", "ann_pq_topk", "ann_ivfpq_topk", "ann_knn_join").foreach { q =>
      val p = initialPlan(q)
      assert(p.contains("InMemoryTableScan"),
        s"$q retrains instead of reading the PlanCache")
      val outer = stripCachedSubtrees(p)
      assert(!outer.exists(_.contains("CartesianProduct")), s"$q plans all-pairs")
      def indent(l: String): Int =
        l.indexWhere(c => c != ' ' && c != '+' && c != '-' && c != ':')
      outer.zipWithIndex.filter(_._1.contains("BroadcastExchange")).foreach {
        case (bl, i) =>
          val d = indent(bl)
          val sub = outer.drop(i + 1).takeWhile(l => indent(l) > d)
          val raw = sub.exists(_.contains("embeddings.parquet"))
          val bounded = sub.exists(l => l.contains("HashAggregate") ||
            l.contains("InMemoryTableScan") || l.contains("Window") ||
            l.contains("LessThan(vec_id"))
          assert(!raw || bounded,
            s"$q broadcasts the raw corpus:\n${(bl +: sub).mkString("\n").take(1200)}")
      }
    }
  }

  test("ann ivf/knn: the per-probe top-k pushes into the window as a group limit") {
    Seq("ann_ivf_topk", "ann_knn_join").foreach { q =>
      val p = initialPlan(q)
      assert(p.linesIterator.exists(_.contains("WindowGroupLimit")),
        s"$q rank<=k no longer pushes into the window:\n${p.take(1200)}")
    }
  }

  test("ev_anomaly_mad: events scans live inside the persisted dev cache") {
    val p = initialPlan("ev_anomaly_mad")
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
      s"MAD aggregation and flag pass must both read the dev cache:\n${p.take(1500)}")
    val outer = stripCachedSubtrees(p)
    assert(!outer.exists(l => l.contains("FileScan parquet") && l.contains("events.parquet")),
      "a live events scan escaped the dev cache — the flag pass re-scans the table")
  }
}
