package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.Num._
import graft.functions.Norm

/** Extended relational surface beyond the reference's own operators:
  * struct-array extraction as a standalone oracle query (the P2/P9/P10
  * shape), grouping sets, distinct aggregates, pivot, richer window frames,
  * and the two operators Spark lacks natively — AS-OF join and range join —
  * implemented the way they scale (merge-union trick / bucketed equi-join),
  * oracle-checked against DuckDB's native ASOF/inequality joins.
  */
object ExtQueries {

  /** P2/P9/P10 as an oracle query: build struct arrays, then higher-order
    * first-match extraction (scrapers/twitter_scraper.py:89-94 shape).
    */
  val structArrayExtract: QueryDef = {
    val mediaSql =
      """[{'t': 'photo', 'u': 'img_' || CAST(p_partkey AS VARCHAR)},
        | {'t': CASE WHEN p_size % 2 = 0 THEN 'video' ELSE 'gif' END,
        |  'u': 'vid_' || CAST(p_partkey AS VARCHAR)}]""".stripMargin
    QueryDef(
      "p2_struct_array_extract",
      s"""SELECT p_partkey,
         |  list_filter($mediaSql, m -> m.t IN ('video', 'animated_gif'))[1].u AS video_url,
         |  ($mediaSql)[1].u AS first_url
         |FROM part WHERE p_partkey % 13 = 0""".stripMargin) { (s, dir) =>
      val media = array(
        struct(lit("photo").as("t"),
          concat(lit("img_"), col("p_partkey").cast(StringType)).as("u")),
        struct(when(col("p_size") % 2 === 0, "video").otherwise("gif").as("t"),
          concat(lit("vid_"), col("p_partkey").cast(StringType)).as("u")))
      Tables.part(s, dir)
        .filter(col("p_partkey") % 13 === 0)
        .select(
          col("p_partkey"),
          Norm.firstWhere(media, m => m.getField("t").isin("video", "animated_gif"))
            .getField("u").as("video_url"),
          element_at(media, 1).getField("u").as("first_url"))
    }
  }

  /** ROLLUP grouping sets with GROUPING() markers and exact-decimal sums. */
  val rollupSpend: QueryDef = QueryDef(
    "a3_rollup_spend",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("spend"),
        grouping(col("o_orderstatus")).cast(LongType).as("g_status"),
        grouping(col("o_orderpriority")).cast(LongType).as("g_prio"))
  }

  /** General GROUPING SETS — slices neither ROLLUP nor CUBE can express
    * ((status), (priority), ()): two independent one-dimension summaries
    * plus the grand total from ONE scan. Catalyst plans this as a single
    * Expand + one shuffle; at 100 TB that replaces three separate
    * scan+agg jobs over the fact table with one.
    */
  val groupingSetsAgg: QueryDef = QueryDef(
    "a9_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("spend"),
        grouping(col("o_orderstatus")).cast(LongType).as("g_status"),
        grouping(col("o_orderpriority")).cast(LongType).as("g_prio"))
  }

  /** Distinct aggregates (exact; the approx/HLL variant is engine-local by
    * nature and has no cross-engine oracle).
    */
  val distinctAgg: QueryDef = QueryDef(
    "a4_distinct_agg",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT l_partkey) AS n_part,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n"))
  }

  /** Approximate distinct (HLL sketches — SURVEY §7.2-7). Sketch internals
    * are engine-local, so no cross-engine oracle can compare estimates
    * directly; like the sink queries, the oracle states the POSTCONDITION:
    * the HLL++ estimate (approx_count_distinct) and the DataSketches HLL
    * estimate (hll_sketch_agg → estimate) land within the error bound of
    * the exact count, emitted as booleans both engines agree on. Sketch
    * MERGEABILITY (the property that makes HLL the right answer at 100 TB:
    * partial sketches combine associatively across partitions/days) is
    * proven in SketchSpec.
    */
  val approxDistinct: QueryDef = QueryDef(
    "a7_approx_distinct",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_supp_exact,
      |  TRUE AS approx_ok,
      |  TRUE AS sketch_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp_exact"),
        approx_count_distinct(col("l_suppkey"), 0.05).as("n_approx"),
        hll_sketch_estimate(hll_sketch_agg(col("l_suppkey"))).as("n_sketch"))
      .select(
        col("l_returnflag"), col("n_supp_exact"),
        (abs(col("n_approx") - col("n_supp_exact")) <=
          col("n_supp_exact") * lit(0.15)).as("approx_ok"),
        (abs(col("n_sketch") - col("n_supp_exact")) <=
          col("n_supp_exact") * lit(0.15)).as("sketch_ok"))
  }

  /** Discrete quantiles (p50/p90/p99), the element-exact way: rank within
    * the group with a unique tiebreak and pick the ceil(p·n)-th element.
    * The index is INTEGER arithmetic — ceil(p·n) as (k·n + k) div m — so
    * both engines select exactly the same element (interpolated
    * `percentile`/`quantile_cont` would hinge on float rounding, and
    * DuckDB parses 0.9 as DECIMAL, diverging from double multiply).
    * Scale: one shuffle on the group key; for a low-cardinality group key
    * the same two-phase salted pattern as l3 applies before this shape.
    */
  val quantileDisc: QueryDef = QueryDef(
    "a8_quantile_disc",
    """WITH ranked AS (
      |  SELECT event_type, value, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM events)
      |SELECT event_type, MAX(cnt) AS n,
      |  MAX(CASE WHEN rn = (cnt + 1) // 2 THEN value END) AS p50,
      |  MAX(CASE WHEN rn = (9 * cnt + 9) // 10 THEN value END) AS p90,
      |  MAX(CASE WHEN rn = (99 * cnt + 99) // 100 THEN value END) AS p99
      |FROM ranked GROUP BY event_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
    val cw = Window.partitionBy("event_type")
    Tables.events(s, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(cw))
      .groupBy("event_type")
      .agg(
        max("cnt").as("n"),
        max(when(col("rn") === expr("(cnt + 1) div 2"), col("value"))).as("p50"),
        max(when(col("rn") === expr("(9 * cnt + 9) div 10"), col("value"))).as("p90"),
        max(when(col("rn") === expr("(99 * cnt + 99) div 100"), col("value"))).as("p99"))
  }

  /** Pivot: order-status counts per priority (Spark `pivot` operator; the
    * oracle states it as conditional aggregation).
    */
  val pivotStatus: QueryDef = QueryDef(
    "a5_pivot_status",
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
      |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
  }

  /** Window extras: RANK/DENSE_RANK over a tied ordering, NTILE and a
    * moving frame over a total ordering.
    */
  val rankFrames: QueryDef = QueryDef(
    "w3_rank_frames",
    """SELECT o_custkey, o_orderkey,
      |  RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rk,
      |  DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS drk,
      |  NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_spend
      |FROM orders""".stripMargin) { (s, dir) =>
    val tied = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    val total = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"),
      rank().over(tied).as("rk"),
      dense_rank().over(tied).as("drk"),
      ntile(4).over(total).as("quartile"),
      sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .over(total.rowsBetween(-2, Window.currentRow))
        .cast(DoubleType).as("moving_spend"))
  }

  /** AS-OF join, the scalable way: probes and the series are UNIONED and
    * merge-ordered per key; `last_value` over the strictly-preceding frame
    * picks each probe's predecessor — one shuffle on the key, no range
    * explosion, no per-probe scan. The kind column breaks ts ties so the
    * `<` is strict, and s_event totalizes the order so ties between two
    * series events at the same ts pick a deterministic predecessor (the
    * max event_id). Oracle: LEFT JOIN + arg_max by (ts, event_id) — the
    * same total order, expressible tie-deterministically in SQL (native
    * ASOF breaks equal-ts predecessors arbitrarily).
    */
  val asofJoin: QueryDef = QueryDef(
    "j5_asof_join",
    """SELECT p.event_id AS probe_id, p.user_id,
      |  arg_max(e.event_id, printf('%020d%020d', epoch_ms(e.ts), e.event_id)) AS prev_event_id,
      |  CAST(MAX(epoch_ms(e.ts)) AS BIGINT) AS prev_ts_ms
      |FROM (SELECT * FROM events WHERE event_id % 17 = 0) p
      |LEFT JOIN events e ON p.user_id = e.user_id AND e.ts < p.ts
      |GROUP BY p.event_id, p.user_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
    val probes = ev.filter(col("event_id") % 17 === 0)
      .select(col("user_id"), col("ts"), lit(0).as("kind"),
        col("event_id").as("probe_id"),
        lit(null).cast(LongType).as("s_event"))
    val series = ev
      .select(col("user_id"), col("ts"), lit(1).as("kind"),
        lit(null).cast(LongType).as("probe_id"),
        col("event_id").as("s_event"))
    // probes sort BEFORE series at equal ts (kind 0 < 1) → the preceding
    // frame sees only strictly-earlier series rows
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"), col("s_event"))
      .rowsBetween(Window.unboundedPreceding, -1)
    probes.unionByName(series)
      .withColumn("prev_event_id", last(col("s_event"), ignoreNulls = true).over(w))
      .withColumn("prev_ts_ms",
        last(when(col("kind") === 1, unix_millis(col("ts"))), ignoreNulls = true).over(w))
      .filter(col("kind") === 0)
      .select(col("probe_id"), col("user_id"), col("prev_event_id"), col("prev_ts_ms"))
  }

  /** Range join, the scalable way: time-bucket both sides (bucket length =
    * window length, so a window spans ≤ 2 buckets), explode each probe to
    * its two candidate buckets, equi-join on (key, bucket), then apply the
    * exact range predicate — a bounded equi-join instead of the nested-loop
    * a naive theta join plans. Oracle: DuckDB's inequality join.
    */
  val rangeJoinBucketed: QueryDef = QueryDef(
    "j6_range_join_bucketed",
    """SELECT p.event_id AS probe_id, COUNT(*) AS n_in_window
      |FROM (SELECT * FROM events WHERE event_id % 29 = 0) p
      |JOIN events e
      |  ON e.user_id = p.user_id AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 10 MINUTE
      |GROUP BY p.event_id""".stripMargin) { (s, dir) =>
    val WindowMs = 600000L
    val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
    val bucket = expr(s"unix_millis(ts) div $WindowMs")
    val series = ev.select(col("user_id"), bucket.as("bucket"), col("ts").as("s_ts"))
    val probes = ev.filter(col("event_id") % 29 === 0)
      .select(col("event_id").as("probe_id"), col("user_id"), col("ts").as("p_ts"),
        explode(array(bucket, bucket + 1)).as("bucket"))
    probes.join(series, Seq("user_id", "bucket"))
      .filter(col("s_ts") >= col("p_ts") &&
        col("s_ts") < col("p_ts") + expr("INTERVAL 10 MINUTES"))
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_in_window"))
  }

  /** FULL OUTER join — the one outer-join shape j1–j4 don't cover, with
    * genuinely unmatched rows on BOTH sides (negative-balance customers
    * with no pending orders; pending-order customers with non-negative
    * balance). Scale note: full outer preserves unmatched rows of both
    * inputs, so neither side can broadcast — the honest plan is a
    * shuffle join on the key, and that is what Catalyst picks; both
    * inputs here are pre-aggregated/filtered so the shuffle carries the
    * reduced sides only.
    */
  val fullOuter: QueryDef = QueryDef(
    "j7_full_outer",
    """SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, c.c_name,
      |  o.n_open, o.open_spend
      |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal < 0) c
      |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_open,
      |             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_spend
      |           FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey) o
      |  ON c.c_custkey = o.o_custkey""".stripMargin) { (s, dir) =>
    val pending = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "P")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_open"), dsum(col("o_totalprice")).as("open_spend"))
    val negBal = Tables.customer(s, dir)
      .filter(col("c_acctbal") < 0)
      .select("c_custkey", "c_name")
    negBal.join(pending, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_open"), col("open_spend"))
  }

  /** RANGE window frame (time-based trailing hour per user) — the frame is
    * defined by VALUE distance, not row count; Spark expresses it as
    * rangeBetween over an epoch-ms ordering.
    */
  val rangeFrame: QueryDef = QueryDef(
    "w4_range_frame",
    """SELECT user_id, event_id,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |                 RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS n_last_hour,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
      |    OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |          RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS v_last_hour
      |FROM events""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(unix_millis(col("ts")))
      .rangeBetween(-3600000L, Window.currentRow)
    Tables.events(s, dir).select(
      col("user_id"), col("event_id"),
      count(lit(1)).over(w).as("n_last_hour"),
      sum(col("value").cast(DecimalType(18, 6))).over(w)
        .cast(DoubleType).as("v_last_hour"))
  }

  /** min_by / max_by aggregates (deterministic: the ordering column is the
    * unique order key).
    */
  val minMaxBy: QueryDef = QueryDef(
    "a6_min_max_by",
    """SELECT o_custkey,
      |  max_by(o_orderpriority, o_orderkey) AS latest_key_priority,
      |  min_by(o_orderpriority, o_orderkey) AS first_key_priority,
      |  MAX(o_orderkey) AS max_key
      |FROM orders GROUP BY o_custkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(
        max_by(col("o_orderpriority"), col("o_orderkey")).as("latest_key_priority"),
        min_by(col("o_orderpriority"), col("o_orderkey")).as("first_key_priority"),
        max("o_orderkey").as("max_key"))
  }

  /** UNPIVOT / melt — wide measure columns to long (metric, value) rows,
    * the reshape every feature store and metrics pipeline needs before a
    * per-metric groupBy. Spark's native `unpivot` plans one Expand node
    * (each input row emits k output rows in-place, no shuffle, no join
    * against a metric-name table); the oracle states the same relation as
    * a UNION ALL of per-measure projections.
    */
  val unpivotMeasures: QueryDef = QueryDef(
    "a13_unpivot",
    """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).unpivot(
      ids = Array(col("l_orderkey"), col("l_linenumber")),
      values = Array(col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax")),
      variableColumnName = "metric",
      valueColumnName = "value")
  }

  /** Approximate quantiles (percentile_approx — Greenwald-Khanna sketch):
    * the single-pass MERGEABLE percentile path, which is what survives
    * 100 TB — a8's element-exact rank pick needs a full per-group sort
    * behind a window, the sketch needs one partial-aggregable scan and
    * O(1/eps) state per group. No cross-engine oracle can compare sketch
    * internals, so (like a7) the oracle states the POSTCONDITION: the
    * estimate lands inside the exact [p-5%, p+5%] rank bracket (GK's
    * worst-case guarantee at accuracy 1000 is ~50x tighter, so the
    * booleans are stable under ANY partition/merge order — the property
    * that makes the sketch safe to ship distributed in the first place).
    */
  val approxQuantile: QueryDef = QueryDef(
    "a11_approx_quantile",
    """SELECT event_type, COUNT(*) AS n, TRUE AS p50_ok, TRUE AS p90_ok
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("ap50"),
        percentile_approx(col("value"), lit(0.9), lit(1000)).as("ap90"),
        expr("percentile(value, 0.45)").as("lo50"),
        expr("percentile(value, 0.55)").as("hi50"),
        expr("percentile(value, 0.85)").as("lo90"),
        expr("percentile(value, 0.95)").as("hi90"))
      .select(col("event_type"), col("n"),
        (col("ap50") >= col("lo50") && col("ap50") <= col("hi50")).as("p50_ok"),
        (col("ap90") >= col("lo90") && col("ap90") <= col("hi90")).as("p90_ok"))
  }

  /** Statistical moments (mean / sample variance / stddev / correlation)
    * computed the way they stay DETERMINISTIC on a cluster: the built-in
    * `var_samp`/`corr` accumulate doubles in partition order, so two runs
    * of the same query can hash-differ in the last bit. Instead the five
    * power sums Σx, Σy, Σx², Σy², Σxy are accumulated EXACTLY (decimal —
    * associative, partition-order-independent), and the float arithmetic
    * happens once per GROUP on the closed-form moments, written with the
    * identical operation order in both engines. This is the map-side-
    * combinable "algebraic aggregate" decomposition every MPP engine uses;
    * exactness of the partials is what makes it reproducible at 100 TB.
    * Scale note: Σx² of DECIMAL(18,2)² sums in DECIMAL(38,4), which holds
    * to ~10^23 row·value² — beyond that, widen the cast or pre-scale.
    */
  val statsMoments: QueryDef = QueryDef(
    "a10_stats_moments",
    """WITH s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  CAST(sx AS DOUBLE) / n AS mean_qty,
      |  (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / NULLIF(n - 1, 0) AS var_qty,
      |  sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / NULLIF(n - 1, 0)) AS std_qty,
      |  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) /
      |    NULLIF(sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) *
      |     sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n), 0) AS corr_qty_price
      |FROM s""".stripMargin) { (s, dir) =>
    val q = col("l_quantity").cast(DecimalType(18, 2))
    val p = col("l_extendedprice").cast(DecimalType(18, 2))
    val sums = Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(q).as("sx"), sum(p).as("sy"),
        sum(q * q).as("sxx"), sum(p * p).as("syy"), sum(q * p).as("sxy"))
    // mirror the oracle's operation order EXACTLY — IEEE + identical input
    // + identical tree = identical bits. Degenerate groups (n = 1, or
    // zero variance) divide by NULLIF(...,0) → NULL in BOTH engines;
    // without the guard Spark's non-ANSI Divide yields NULL while
    // DuckDB's IEEE division yields inf/NaN — a latent hash divergence.
    val n = col("n"); val nm1 = nullif(col("n") - 1, lit(0L))
    def d(c: String) = col(c).cast(DoubleType)
    val cxx = d("sxx") - d("sx") * d("sx") / n
    val cyy = d("syy") - d("sy") * d("sy") / n
    val cxy = d("sxy") - d("sx") * d("sy") / n
    sums.select(col("l_returnflag"), n,
      (d("sx") / n).as("mean_qty"),
      (cxx / nm1).as("var_qty"),
      sqrt(cxx / nm1).as("std_qty"),
      (cxy / nullif(sqrt(cxx) * sqrt(cyy), lit(0.0))).as("corr_qty_price"))
  }

  /** Distribution window functions — PERCENT_RANK / CUME_DIST / LEAD over
    * a per-priority total ordering. Rank ratios are integers-over-integers
    * evaluated once per row, so cross-engine doubles agree exactly; the
    * orderkey tiebreak totalizes the order (no peer-group ambiguity).
    * Scale: one shuffle on the partition key; frames never materialize.
    */
  val distributionFrames: QueryDef = QueryDef(
    "w5_distribution_frames",
    """SELECT o_orderkey, o_orderpriority,
      |  PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS pr,
      |  CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS cd,
      |  LEAD(o_orderkey, 1) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS next_key
      |FROM orders""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_orderpriority"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"),
      lead(col("o_orderkey"), 1).over(w).as("next_key"))
  }

  // --- KMV distinct sketch with set operations ----------------------------

  private val KmvK = 64
  private val KmvMod = 1000000007L

  /** Per-type KMV sketch column: the k smallest DISTINCT hash values,
    * sorted ascending. Built scalably: groupBy(type, hv) partial-aggregates
    * raw events down to distinct hashes BEFORE the per-type top-k rank
    * (l3's per-group-top-k pattern), so no aggregation state ever holds a
    * full distinct set — a collect_set-then-slice formulation would
    * materialize every distinct hash per group, which is exactly what a
    * sketch exists to avoid.
    */
  private def kmvSketches(s: org.apache.spark.sql.SparkSession, dir: String) = {
    // hash the md5 HEX of the key, not the raw decimal string: the fold of
    // a 1-3 digit id is small and monotone in the id (nowhere near uniform
    // on [0, mod)), and KMV's (k-1)/h_k estimator is only unbiased under
    // uniform hashes — md5 supplies the avalanche, the fold the numeric
    val hv = Tables.events(s, dir)
      .select(col("event_type"),
        call_function("graft_rolling_hash", md5(col("user_id").cast(StringType))).as("hv"))
      .groupBy("event_type", "hv").agg(lit(1).as("one")).drop("one")
    hv.withColumn("rn",
        row_number().over(Window.partitionBy("event_type").orderBy("hv")))
      .filter(col("rn") <= KmvK)
      .groupBy("event_type")
      .agg(sort_array(collect_list("hv")).as("sketch"))
      // materialize the |types|-row sketch table before the pair self-join:
      // both join sides would otherwise re-derive it from a full events
      // scan each (ScanAudit: dups=(events,2)) — at 100 TB the data pass
      // must happen once, and the set-op algebra runs on sketch STATE
      .localCheckpoint()
  }

  /** KMV estimate from a sketch: exact size when the sketch is not full
    * (fewer than k distinct values — the sketch IS the set), else the
    * classic (k-1)/h_(k) estimator with hashes normalized by the modulus.
    * (k-1)·mod is an exactly-representable double; the single division is
    * IEEE-identical on both engines.
    */
  private def kmvEst(sketch: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(sketch) < KmvK, size(sketch).cast(DoubleType))
      .otherwise(lit((KmvK - 1).toDouble * KmvMod) /
        element_at(sketch, KmvK).cast(DoubleType))

  /** A14: KMV (k-minimum-values) distinct sketches with SET OPERATIONS —
    * the sketch family's gap after HLL (a7: distinct counts, no
    * intersections) and CMS/GK: bottom-k sketches compose under union by
    * construction (merge = k smallest of the concatenation), and the
    * merged sketch yields principled union, Jaccard, and intersection
    * estimates — "how many users did BOTH click and purchase" from
    * k-sized state per group. Deterministic end-to-end (the hash is the
    * engine's codegen'd graft_rolling_hash; the oracle re-derives it by
    * list_reduce), so unlike a7's engine-specific HLL the ESTIMATES
    * themselves hash-match cross-engine — estimator variance is pinned by
    * SketchSpec-style properties instead of oracle slack.
    *
    * Scale: events partial-aggregate to distinct (type, hash) pairs; the
    * per-type rank keeps k rows; everything after runs on |types| rows of
    * k-length arrays (the type×type candidate join is |types|² on
    * k-bounded lists — set-op ALGEBRA on sketch state, never on data).
    */
  val kmvSetOps: QueryDef = QueryDef(
    "a14_kmv_setops",
    s"""WITH h AS (
       |  SELECT event_type,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(md5(CAST(user_id AS VARCHAR)), ''), c -> CAST(ord(c) AS BIGINT))),
       |      (a, c) -> (a * 31 + c) % $KmvMod) AS hv
       |  FROM events),
       |sk AS (SELECT event_type, (list_sort(list_distinct(list(hv))))[1:$KmvK] AS sketch
       |       FROM h GROUP BY event_type),
       |pairs AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |    a.sketch AS sa, b.sketch AS sb,
       |    (list_sort(list_distinct(a.sketch || b.sketch)))[1:$KmvK] AS merged
       |  FROM sk a JOIN sk b ON a.event_type < b.event_type),
       |est AS (
       |  SELECT type_a, type_b,
       |    CASE WHEN len(sa) < $KmvK THEN CAST(len(sa) AS DOUBLE)
       |         ELSE CAST(${(KmvK - 1).toDouble * 1000000007L} AS DOUBLE) / CAST(sa[len(sa)] AS DOUBLE) END AS est_a,
       |    CASE WHEN len(sb) < $KmvK THEN CAST(len(sb) AS DOUBLE)
       |         ELSE CAST(${(KmvK - 1).toDouble * 1000000007L} AS DOUBLE) / CAST(sb[len(sb)] AS DOUBLE) END AS est_b,
       |    CASE WHEN len(merged) < $KmvK THEN CAST(len(merged) AS DOUBLE)
       |         ELSE CAST(${(KmvK - 1).toDouble * 1000000007L} AS DOUBLE) / CAST(merged[len(merged)] AS DOUBLE) END AS est_union,
       |    CAST(len(list_intersect(list_intersect(merged, sa), sb)) AS DOUBLE)
       |      / len(merged) AS jaccard
       |  FROM pairs)
       |SELECT type_a, type_b, est_a, est_b, est_union,
       |  jaccard * est_union AS est_inter, jaccard
       |FROM est""".stripMargin) { (s, dir) =>
    val sk = kmvSketches(s, dir)
    val pairs = sk.as("a")
      .join(sk.as("b"), col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.sketch").as("sa"), col("b.sketch").as("sb"),
        slice(array_sort(array_union(col("a.sketch"), col("b.sketch"))), 1, KmvK)
          .as("merged"))
    pairs.select(col("type_a"), col("type_b"),
        kmvEst(col("sa")).as("est_a"),
        kmvEst(col("sb")).as("est_b"),
        kmvEst(col("merged")).as("est_union"),
        (size(array_intersect(array_intersect(col("merged"), col("sa")), col("sb")))
          .cast(DoubleType) / size(col("merged"))).as("jaccard"))
      .select(col("type_a"), col("type_b"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("jaccard") * col("est_union")).as("est_inter"), col("jaccard"))
  }

  /** A15 — ANALYZE-style column statistics (the CBO input every engine
    * collects before planning 100-TB joins): per-column row count, null
    * count, exact NDV, and min/max, for five lineitem columns in ONE scan.
    *
    * Shape: a single global aggregate computes all five columns' stats
    * side by side — Catalyst plans the 5 COUNT(DISTINCT)s as one Expand
    * (×5 rows, each tagged with its grouping id) feeding a two-phase
    * distinct aggregate, the standard exact-NDV ANALYZE plan; min/max/
    * count ride the same pass as partial aggregates. The 1-row result is
    * then unpivoted driver-free with `stack`. Cost at scale: the expand
    * multiplies the SHUFFLED distinct values by the column count — for
    * very wide schemas the sketch path (a7_approx_distinct's HLL) is the
    * single-expand alternative; exact NDV is what ANALYZE publishes when
    * it can afford it. Min/max as DOUBLE so one stack column carries
    * mixed-width numerics on both engines.
    */
  val columnStats: QueryDef = {
    val statCols = Seq("l_partkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    QueryDef(
      "a15_column_stats",
      statCols.map { c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_null,
           |  COUNT(DISTINCT $c) AS ndv,
           |  CAST(MIN($c) AS DOUBLE) AS min_v, CAST(MAX($c) AS DOUBLE) AS max_v
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")) { (s, dir) =>
      val aggs = count(lit(1)).as("n") +: statCols.flatMap(c => Seq(
        count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        min(col(c)).cast(DoubleType).as(s"min_$c"),
        max(col(c)).cast(DoubleType).as(s"max_$c")))
      Tables.lineitem(s, dir)
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${statCols.length}, " +
          statCols.map(c => s"'$c', n, n - cnt_$c, ndv_$c, min_$c, max_$c")
            .mkString(", ") +
          ") AS (col_name, n_rows, n_null, ndv, min_v, max_v)")
    }
  }

  val defs: Seq[QueryDef] = Seq(
    structArrayExtract, rollupSpend, groupingSetsAgg, distinctAgg,
    approxDistinct, quantileDisc, pivotStatus, rankFrames, asofJoin,
    rangeJoinBucketed, fullOuter, rangeFrame, minMaxBy, statsMoments,
    distributionFrames, approxQuantile, unpivotMeasures, kmvSetOps,
    columnStats)
}
