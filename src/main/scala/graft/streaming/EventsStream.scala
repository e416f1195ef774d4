package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import org.apache.spark.sql.types._
import graft.ingest.{DedupSink, MergeSink, Watermarks}
import graft.sources.EventsSource

/** Structured Streaming runner for the `events` table (SURVEY.md §2.11):
  * `readStream` over the parquet dir → `Trigger.AvailableNow` (the
  * incremental micro-batch the reference's cron ticks approximate) →
  * `foreachBatch` into the idempotent dedup sink.
  *
  * Exactly-once EFFECT comes from the sink's conflict-key anti-join, not
  * from checkpoint bookkeeping alone: replaying the whole source against a
  * populated sink (fresh checkpoint, duplicated feed, task retry) inserts
  * nothing new — the same at-least-once→exactly-once posture as the
  * reference's ON CONFLICT sinks absorbing re-scraped pages.
  *
  * Scale: each micro-batch shuffles only batch + sink keys (see DedupSink);
  * checkpointed offsets keep steady-state batches incremental, and
  * AvailableNow drains multi-file backlogs in bounded batches.
  */
object EventsStream {

  /** State-store partition count for the stateful drains. Shuffle
    * partitions become state-store INSTANCES — each one loads, commits,
    * and snapshots per micro-batch — so they must track stateful-key
    * cardinality (~3.4 k windows/users here), not core count: 32 stores
    * holding ~100 keys each spend more wall time on store lifecycle than
    * on aggregation (measured: 8 partitions cut the watermarked-window
    * drain from 8.3 s to 7.0 s at sf0.1). On a real cluster this scales
    * back up with key count — it is per-QUERY state layout, not a
    * session-wide setting, which is why it is applied scoped here and
    * restored after the drain.
    */
  val StatePartitions = 8

  /** Run `body` (a streaming drain) under the state-tuned session confs,
    * restoring the previous values afterwards:
    *  - `shuffle.partitions` → StatePartitions (state layout, above);
    *  - no-data micro-batches OFF: their only purpose is advancing the
    *    watermark to emit APPEND-mode finalizations and evict state; our
    *    drains emit in update/complete mode or on-arrival (inner-join
    *    append), so every result row is already out before the no-data
    *    batch, and AvailableNow tears the state down afterwards anyway —
    *    the extra ~1 s batch buys nothing. A sink whose emissions WAIT on
    *    the watermark (outer-join null padding, append-mode aggregation
    *    finalization) MUST NOT use this helper.
    */
  private def withStateTunedConf[T](spark: SparkSession)(body: => T): T = {
    val conf = spark.conf
    val prevParts = conf.get("spark.sql.shuffle.partitions")
    val prevNoData = conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    conf.set("spark.sql.shuffle.partitions", StatePartitions.toString)
    conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try body
    finally {
      conf.set("spark.sql.shuffle.partitions", prevParts)
      conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
    }
  }

  /** Run `body` under the RocksDB state-store provider (transformWithState
    * requires it), restoring the conf afterwards — one helper instead of
    * three drifting copies (r17). Measured and rejected here: RocksDB
    * changelog checkpointing (per-batch delta logs instead of snapshot
    * uploads) — it REGRESSED the session-timeout drain 5.5 → 7.1 s at
    * sf0.1, since these drains are 1-3 batches over tiny state where the
    * changelog machinery is pure overhead; on a long-lived production
    * query with many batches it is the right knob, so it belongs in
    * deployment conf, not the operator.
    */
  private def withRocksDbState[T](spark: SparkSession)(body: => T): T = {
    val conf = spark.conf
    val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = conf.getOption(ProviderKey)
    conf.set(ProviderKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try withStateTunedConf(spark)(body)
    finally prevProvider match {
      case Some(v) => conf.set(ProviderKey, v)
      case None    => conf.unset(ProviderKey)
    }
  }

  /** Events stream over a staged dir: schema derived from the staged
    * files' own footers, ts-unit normalization shared with the batch path —
    * see EventsSource (round 6 lost the whole streaming tier to a
    * hardcoded-unit schema here; the loader is now the single authority).
    */
  private def eventsStream(spark: SparkSession, sourceDir: String): DataFrame =
    EventsSource.stream(spark, sourceDir)

  /** Drain everything currently in `sourceDir` into the dedup sink at
    * `sinkPath`; returns when the AvailableNow run finishes.
    */
  def drain(spark: SparkSession, sourceDir: String, sinkPath: String,
            checkpoint: String): Unit = {
    val q = eventsStream(spark, sourceDir).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        DedupSink.append(batch.sparkSession, sinkPath, batch,
          key = Seq("event_id"), tiebreak = Seq(col("ts")))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Per-user running state (count + first/last event time). All-integer
    * so the result is iteration-order-independent.
    */
  final case class UserState(n: Long, minTsMs: Long, maxTsMs: Long)
  final case class UserAgg(user_id: Long, n_events: Long, first_ms: Long, last_ms: Long)

  /** Funnel state: the minimum view timestamp plus the FULL click/purchase
    * timestamp lists. The lists are required for correctness under
    * out-of-order arrival: a late early view LOWERS ts1, which can only
    * make previously-ineligible clicks eligible — so eligibility must be
    * recomputed from the complete lists, never from a running "first
    * qualifying click" scalar (that value is not monotone under late
    * data). State is bounded by a user's own funnel events — the same
    * per-key contract as the batch collect — and a production pipeline
    * finalizes users past the watermark to reclaim it.
    */
  final case class FunnelState(minViewMs: Long, clicks: Seq[Long], purchases: Seq[Long])
  final case class FunnelAgg(user_id: Long, depth: Int, ms_to_convert: Option[Long])

  /** Key-bucket count for the stateful sink's physical layout: updated keys
    * touch only their own bucket partitions, so the per-micro-batch upsert
    * rewrites O(touched buckets), not the whole sink.
    */
  val StateBuckets = 64

  /** Custom keyed state via `mapGroupsWithState` (SURVEY.md §2.11 /
    * the brief's KeyValueGroupedDataset surface): state accumulates across
    * micro-batches in the state store; each trigger emits the updated
    * per-user aggregate, which foreachBatch upserts into the sink
    * (newest state per key wins). Shared by both drains below.
    */
  private def statefulStream(spark: SparkSession, sourceDir: String): Dataset[UserAgg] = {
    import spark.implicits._
    val stream = eventsStream(spark, sourceDir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
      .as[(Long, Long)]
    stream
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, UserAgg](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[UserState]) =>
          var n = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
          rows.foreach { case (_, ms) =>
            n += 1; if (ms < mn) mn = ms; if (ms > mx) mx = ms
          }
          val prev = state.getOption.getOrElse(UserState(0L, Long.MaxValue, Long.MinValue))
          val next = UserState(prev.n + n, math.min(prev.minTsMs, mn), math.max(prev.maxTsMs, mx))
          state.update(next)
          UserAgg(uid, next.n, next.minTsMs, next.maxTsMs)
      }
  }

  private def drainStateful(spark: SparkSession, sourceDir: String,
                            checkpoint: String)(
      sinkFn: Dataset[UserAgg] => Unit): Unit =
    withStateTunedConf(spark) {
      val q = statefulStream(spark, sourceDir).writeStream
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: Dataset[UserAgg], _: Long) => sinkFn(batch) }
        .start()
      q.awaitTermination()
    }

  /** Stateful drain → bucket-partitioned parquet upsert: the sink is
    * partitioned by a hash bucket of the key; each micro-batch merges ONLY
    * the buckets its updated keys live in (partition-pruned read,
    * anti-join, union) and rewrites just those partitions via dynamic
    * partition overwrite — O(updated keys) per trigger at scale.
    */
  def statefulCounts(spark: SparkSession, sourceDir: String, sinkPath: String,
                     checkpoint: String): Unit =
    drainStateful(spark, sourceDir, checkpoint) { batch =>
      upsert(batch.sparkSession, sinkPath, batch.toDF(), Seq("user_id"))
    }

  /** statefulCounts, but each micro-batch commits through the lakehouse
    * MergeSink: matched users update to their newest state, new users
    * insert, and the key-range manifest bounds every commit's rewrite to
    * the files the batch's users live in — a versioned, time-travelable
    * streaming sink. Replaying the whole source through a FRESH
    * checkpoint re-merges the identical final state (last-writer-wins ∘
    * deterministic aggregates = idempotent), which is the lakehouse
    * expression of the at-least-once → exactly-once effect.
    */
  def statefulCountsMerge(spark: SparkSession, sourceDir: String, sinkPath: String,
                          checkpoint: String): Unit =
    drainStateful(spark, sourceDir, checkpoint) { batch =>
      MergeSink.merge(batch.sparkSession, sinkPath, batch.toDF(),
        key = Seq("user_id"), tiebreak = Seq(col("user_id")))
      ()
    }

  /** The same per-user aggregate via `transformWithState` — Spark 4's
    * arbitrary-stateful-processing API (the successor to
    * mapGroupsWithState): an object-style `StatefulProcessor` holding a
    * typed `ValueState`, with per-state TTL and timer support the old API
    * lacks, backed by the RocksDB state store (which transformWithState
    * requires — and which is also the store you want at 100 TB: state
    * spills to disk + changelog checkpointing instead of full in-memory
    * HDFS-backed maps). Output must equal the mapGroupsWithState drain
    * and the batch GROUP BY — same oracle.
    */
  private class UserAggProcessor extends StatefulProcessor[Long, (Long, Long), UserAgg] {
    @transient private var st: ValueState[UserState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserState]("agg", Encoders.product[UserState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[(Long, Long)],
        tv: TimerValues): Iterator[UserAgg] = {
      var n = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
      rows.foreach { case (_, ms) =>
        n += 1; if (ms < mn) mn = ms; if (ms > mx) mx = ms
      }
      val prev = if (st.exists()) st.get() else UserState(0L, Long.MaxValue, Long.MinValue)
      val next = UserState(prev.n + n, math.min(prev.minTsMs, mn), math.max(prev.maxTsMs, mx))
      st.update(next)
      Iterator.single(UserAgg(uid, next.n, next.minTsMs, next.maxTsMs))
    }
  }

  def transformWithStateCounts(spark: SparkSession, sourceDir: String,
      sinkPath: String, checkpoint: String): Unit = {
    import spark.implicits._
    withRocksDbState(spark) {
      val stream = eventsStream(spark, sourceDir)
        .select(col("user_id"), unix_millis(col("ts")).as("ms"))
        .as[(Long, Long)]
      val q = stream.groupByKey(_._1)
        .transformWithState(new UserAggProcessor, TimeMode.None(), OutputMode.Update())
        .writeStream
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: Dataset[UserAgg], _: Long) =>
          upsert(batch.sparkSession, sinkPath, batch.toDF(), Seq("user_id"))
        }
        .start()
      q.awaitTermination()
    }
  }

  /** The ordered conversion funnel (ev_funnel's semantics) as a streaming
    * state machine on `transformWithState`: per-user FunnelState absorbs
    * each micro-batch's events, and the processor re-derives the funnel
    * (ts1 = min view; ts2 = min click > ts1; ts3 = min purchase > ts2)
    * from the COMPLETE state — an order-free fold, so arrival order,
    * batch boundaries, and late data cannot change the final answer; the
    * sink upsert by user converges to exactly the batch funnel. This is
    * the sequence-detection workload (the thing windowed aggregation
    * cannot express) that motivates arbitrary state in the first place.
    */
  private class FunnelProcessor
      extends StatefulProcessor[Long, (Long, String, Long), FunnelAgg] {
    @transient private var st: ValueState[FunnelState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[(Long, String, Long)],
        tv: TimerValues): Iterator[FunnelAgg] = {
      val prev = if (st.exists()) st.get() else FunnelState(Long.MaxValue, Nil, Nil)
      var minView = prev.minViewMs
      val clicks = Seq.newBuilder[Long]; clicks ++= prev.clicks
      val purchases = Seq.newBuilder[Long]; purchases ++= prev.purchases
      rows.foreach { case (_, tpe, ms) =>
        tpe match {
          case "view"     => if (ms < minView) minView = ms
          case "click"    => clicks += ms
          case "purchase" => purchases += ms
          case _          => () // funnel ignores other event types
        }
      }
      val next = FunnelState(minView, clicks.result(), purchases.result())
      st.update(next)
      val ts1 = if (next.minViewMs == Long.MaxValue) None else Some(next.minViewMs)
      val ts2 = ts1.flatMap(t1 => next.clicks.filter(_ > t1).minOption)
      val ts3 = ts2.flatMap(t2 => next.purchases.filter(_ > t2).minOption)
      val depth = if (ts3.isDefined) 3 else if (ts2.isDefined) 2
                  else if (ts1.isDefined) 1 else 0
      Iterator.single(FunnelAgg(uid, depth, ts3.flatMap(t3 => ts1.map(t3 - _))))
    }
  }

  /** Drain the events stream through the funnel state machine; the sink
    * holds one row per user (depth + completer latency), upserted per
    * batch — RocksDB-backed like the other transformWithState drain.
    */
  def streamFunnel(spark: SparkSession, sourceDir: String,
      sinkPath: String, checkpoint: String): Unit = {
    import spark.implicits._
    withRocksDbState(spark) {
      val stream = eventsStream(spark, sourceDir)
        .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
        .as[(Long, String, Long)]
      val q = stream.groupByKey(_._1)
        .transformWithState(new FunnelProcessor, TimeMode.None(), OutputMode.Update())
        .writeStream
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: Dataset[FunnelAgg], _: Long) =>
          upsert(batch.sparkSession, sinkPath, batch.toDF(), Seq("user_id"))
        }
        .start()
      q.awaitTermination()
    }
  }

  /** Stream-stream INNER join with event-time bounds (§2.11 surface the
    * other drains don't touch): views join purchases by the same user
    * within 6 hours. Both sides carry watermarks and the join condition
    * bounds event time, so Spark can evict buffered rows once the
    * watermark passes — the property that keeps two unbounded streams'
    * join state finite. Inner-join matches emit as soon as both sides
    * arrive (no finalization wait), so one AvailableNow drain produces
    * exactly the batch join's answer; each matched pair is emitted once,
    * so the sink is a plain append.
    */
  def streamStreamJoin(spark: SparkSession, sourceDir: String, sinkPath: String,
                       checkpoint: String): Unit = {
    val src = eventsStream(spark, sourceDir)
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("v_event"))
      .withWatermark("v_ts", "1 hour")
    val buys = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_event"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(buys,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") < col("v_ts") + expr("interval 6 hours"))
      .select(col("v_event"), col("p_event"),
        unix_millis(col("v_ts")).as("v_ms"), unix_millis(col("p_ts")).as("p_ms"))
    withStateTunedConf(spark) {
      val q = joined.writeStream
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(sinkPath)
        }
        .start()
      q.awaitTermination()
    }
  }

  /** Streaming deduplication: `dropDuplicates(event_id)` keeps per-key
    * seen-state across micro-batches, so a duplicated feed (re-delivered
    * files, at-least-once upstream) emits each event exactly once — the
    * operator form of the dedup the K-sinks do with anti-joins.
    * Append-mode emissions are on-arrival (first copy wins). Production
    * bounds the seen-state with `dropDuplicatesWithinWatermark`; the
    * drain here proves the semantics.
    */
  def streamDedup(spark: SparkSession, sourceDir: String, sinkPath: String,
                  checkpoint: String): Unit = {
    val src = eventsStream(spark, sourceDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .dropDuplicates("event_id")
    withStateTunedConf(spark) {
      val q = src.writeStream
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(sinkPath)
        }
        .start()
      q.awaitTermination()
    }
  }

  /** streamDedup with BOUNDED state: `dropDuplicatesWithinWatermark` keeps
    * a key's seen-entry only until the watermark passes its event time +
    * delay, then evicts it — the form that holds at 100 TB, where the
    * unbounded-seen-state variant above grows with the key universe
    * forever. The semantic contract weakens correspondingly: a duplicate
    * arriving AFTER its original's state was evicted re-emits, so the
    * operator guarantees exactly-once only for duplicates within the
    * watermark delay of each other — exactly the at-least-once
    * redelivery window upstreams actually exhibit (retries, not
    * month-late replays; those are the K-sinks' anti-join job). The
    * doubled feed arrives inside one AvailableNow batch — within any
    * delay — so the drained sink must still equal plain `events`.
    */
  def streamDedupWithinWatermark(spark: SparkSession, sourceDir: String,
      sinkPath: String, checkpoint: String): Unit = {
    val src = eventsStream(spark, sourceDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
    withStateTunedConf(spark) {
      val q = src.writeStream
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(sinkPath)
        }
        .start()
      q.awaitTermination()
    }
  }

  /** Newest-wins upsert into a bucket-partitioned parquet sink: merge only
    * the buckets the batch's keys live in (partition-pruned read +
    * anti-join + union) and rewrite just those partitions via dynamic
    * partition overwrite — O(updated keys) per call, the parquet
    * approximation of a lakehouse `MERGE WHEN MATCHED`.
    */
  private def upsert(s: SparkSession, sinkPath: String, batch: DataFrame,
                     keys: Seq[String]): Unit = {
    val fresh = batch
      .withColumn("bucket", pmod(hash(keys.map(col): _*), lit(StateBuckets)))
    // AvailableNow runs a final empty batch to finalize the watermark —
    // nothing to merge, skip the write; but an empty FIRST batch still
    // materializes the schema, NON-partitioned (a partitioned write of
    // zero rows emits only _SUCCESS — no schema file — and poisons every
    // later read; see DedupSink.readable)
    if (batch.isEmpty) {
      if (!DedupSink.readable(sinkPath))
        fresh.write.mode("overwrite").parquet(sinkPath)
      return
    }
    val marker = DedupSink.rootParquet(sinkPath)
    val merged =
      if (DedupSink.readable(sinkPath) && !marker) {
        val touched = fresh.select("bucket").distinct()
          .collect().map(_.getInt(0)).toSeq
        val existing = s.read.parquet(sinkPath)
          .filter(col("bucket").isin(touched: _*)) // partition-pruned
        // null-SAFE anti-join: a null key value (nullable event_type, a
        // null window member) must still be replaced by its newer update,
        // not accumulate a duplicate per trigger
        val cond = keys.map(k => existing(k) <=> fresh(k)).reduce(_ && _)
        existing.join(fresh, cond, "left_anti").unionByName(fresh)
      } else fresh // absent sink, or only the empty marker: nothing to keep
    // Cluster on the partition column BEFORE writing: a partitioned write
    // fans each TASK out into one file per bucket it holds, so the
    // state-agg's partitioning (StatePartitions tasks × up to StateBuckets
    // buckets each) would strew ~tasks×buckets tiny files per trigger —
    // measured at ~1000 fs ops/commit (r15), the dominant sink cost on a
    // slow-metadata host and a small-files bomb at any scale. One shuffle
    // of the (tiny, ≤ keys-sized) merged frame lands each touched bucket
    // in exactly one task → exactly one file per touched bucket per
    // commit, which is also the read-side partition-discovery cost story.
    // localCheckpoint breaks the read-from-sink lineage so the overwrite
    // of the same path is legal and replay-safe. The empty marker (a ROOT
    // file) is replaced by a static overwrite — dynamic overwrite would
    // leave it next to the partition dirs, a mixed layout that breaks
    // partition discovery.
    val writer = merged.repartition(col("bucket"))
      .localCheckpoint(true).write.mode("overwrite")
    (if (marker) writer
     else writer.option("partitionOverwriteMode", "dynamic"))
      .partitionBy("bucket")
      .parquet(sinkPath)
    ()
  }

  /** Streaming sessionization via `session_window` (§2.11): 30-minute-gap
    * sessions per user, watermark-bounded state, session end = last event
    * + gap (Spark's definition; the batch oracle mirrors it as
    * max(ts) + 30 min). Session windows MERGE as events arrive, which is
    * why Spark only offers append (finalized-only — trailing sessions
    * never emit) or complete output for them: update cannot retract a
    * subsumed partial. Complete mode + full-sink overwrite is the honest
    * pairing — every trigger rewrites the current session table, and the
    * final state must equal the batch gaps-and-islands answer.
    */
  def sessionCounts(spark: SparkSession, sourceDir: String, sinkPath: String,
                    checkpoint: String): Unit = {
    val stream = eventsStream(spark, sourceDir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("start_ms"),
        unix_millis(col("w.end")).as("end_ms"),
        col("n_events"))
    withStateTunedConf(spark) {
      val q = agg.writeStream
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // complete mode = the whole current session table per trigger
          Watermarks.overwriteParquet(batch.sparkSession, sinkPath, batch)
        }
        .start()
      q.awaitTermination()
    }
  }

  /** Watermarked tumbling-window aggregation (§2.11 / the brief's
    * "watermarks + windowed aggs"): `withWatermark` bounds the window
    * state (late data beyond the delay is dropped and finalized windows
    * are evicted from the store — the property that keeps state finite on
    * an unbounded stream), update-mode emissions upsert into the
    * newest-wins sink keyed by (window, type), so the final sink equals
    * the batch GROUP BY regardless of how many triggers the drain took.
    */
  def windowedCounts(spark: SparkSession, sourceDir: String, sinkPath: String,
                     checkpoint: String): Unit = {
    import graft.functions.Num
    val stream = eventsStream(spark, sourceDir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value"), 6).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
    withStateTunedConf(spark) {
      val q = agg.writeStream
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          upsert(batch.sparkSession, sinkPath, batch, Seq("hour_start", "event_type"))
        }
        .start()
      q.awaitTermination()
    }
  }

  /** Watermarked SLIDING-window aggregation — windowedCounts with overlap:
    * `window(ts, 10 min, 5 min)` assigns each event to window-length/slide
    * = 2 concurrent windows, so the state store holds 2× the tumbling
    * window count per key range (the overlap factor is the state-size
    * knob) and every emission upserts BOTH rows the event touched. The
    * same watermark eviction rule bounds state; the final sink equals the
    * batch hopping-window GROUP BY.
    */
  final case class SessOpen(startMs: Long, lastMs: Long, n: Long)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
                              n_events: Long)

  /** Per-user session assembly with EVENT-TIME TIMERS — the timer half of
    * the transformWithState API (nothing else in the tier uses it): a
    * closed session is emitted either when a later event proves the
    * 30-minute gap (batch-internal split) or when the key's registered
    * timer fires as the WATERMARK passes the open session's timeout — the
    * "emit on silence" pattern (session close-out, SLA breach, abandoned
    * cart) that per-row processing cannot express at all. Exactly one
    * live timer per key (re-armed on every event); expiry emits the open
    * session and clears state, so state size is open-sessions only.
    */
  private class SessionTimeoutProcessor
      extends StatefulProcessor[Long, (Long, Long), SessionOut] {
    @transient private var st: ValueState[SessOpen] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessOpen]("open",
        Encoders.product[SessOpen], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[(Long, Long)],
        tv: TimerValues): Iterator[SessionOut] = {
      // the __flush sentinel key: advances the watermark upstream, but must
      // never open state or a timer (a pre-groupBy filter would be pushed
      // BELOW the EventTimeWatermark node and starve the watermark instead)
      if (uid == -1L) return Iterator.empty
      val ms = rows.map(_._2).toArray.sorted
      if (ms.isEmpty) return Iterator.empty
      var out = List.empty[SessionOut]
      var cur = if (st.exists()) st.get() else null
      ms.foreach { m =>
        if (cur == null) cur = SessOpen(m, m, 1L)
        else if (m - cur.lastMs <= 1800000L)
          cur = SessOpen(cur.startMs, m, cur.n + 1)
        else {
          out ::= SessionOut(uid, cur.startMs, cur.lastMs + 1800000L, cur.n)
          cur = SessOpen(m, m, 1L)
        }
      }
      st.update(cur)
      // exactly one live timer per key: re-arm at the open session's timeout
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(cur.lastMs + 1800000L)
      out.reverse.iterator
    }
    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!st.exists()) return Iterator.empty
      val cur = st.get()
      st.clear()
      Iterator.single(SessionOut(uid, cur.startMs, cur.lastMs + 1800000L, cur.n))
    }
  }

  /** Drive the timer sessionizer: watermarked event-time stream (the
    * `__flush` sentinel rows advance the watermark but never reach the
    * processor), RocksDB state store, update-mode upserts keyed
    * (user_id, start_ms) — a re-fired close-out is idempotent.
    *
    * `maxFilesPerTrigger`: timers fire during a batch against the
    * watermark the PREVIOUS batch set, so the close-out protocol needs a
    * batch succession (corpus → flush → fire). Historically that meant
    * one full streaming query per delivery — three query startups,
    * plannings, and state-store lifecycles per run. Bounding the file
    * source's admission instead lets ONE query walk the staged deliveries
    * oldest-first as separate micro-batches with the IDENTICAL watermark
    * progression (the file source admits files in modification-time
    * order), cutting the machinery cost to one query. Callers staging
    * multiple deliveries must give them strictly increasing mtimes.
    */
  def sessionTimeout(spark: SparkSession, sourceDir: String, sinkPath: String,
                     checkpoint: String,
                     maxFilesPerTrigger: Option[Int] = None): Unit = {
    import spark.implicits._
    withRocksDbState(spark) {
      val srcOpts = maxFilesPerTrigger
        .map(n => Map("maxFilesPerTrigger" -> n.toString)).getOrElse(Map.empty)
      val stream = graft.sources.EventsSource.stream(spark, sourceDir, srcOpts)
        .withWatermark("ts", "1 second")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"))
        .as[(Long, Long)]
      val q = stream.groupByKey(_._1)
        .transformWithState(new SessionTimeoutProcessor,
          TimeMode.EventTime(), OutputMode.Update())
        .writeStream
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: Dataset[SessionOut], _: Long) =>
          upsert(batch.sparkSession, sinkPath, batch.toDF(),
            Seq("user_id", "start_ms"))
        }
        .start()
      q.awaitTermination()
    }
  }

  /** Stream–static enrichment — the most common production streaming
    * join: the event stream enriched against a slowly-changing dimension
    * snapshot (here the customer table) and rolled up by dimension keys.
    * The static side joins BROADCAST per micro-batch — no state store at
    * all for the join (unlike stream-stream joins, which buffer both
    * sides under watermarks); only the small (nation, type) count state
    * persists. On a cluster the dim snapshot re-broadcasts per trigger,
    * which is exactly how you want dimension updates picked up between
    * batches.
    */
  def enrichedCounts(spark: SparkSession, sourceDir: String, dim: DataFrame,
                     sinkPath: String, checkpoint: String): Unit = {
    import graft.functions.Num
    val stream = eventsStream(spark, sourceDir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
    val agg = stream
      .groupBy(col("c_nationkey").as("nation"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value"), 6).as("sum_value"))
    withStateTunedConf(spark) {
      val q = agg.writeStream
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          upsert(batch.sparkSession, sinkPath, batch, Seq("nation", "event_type"))
        }
        .start()
      q.awaitTermination()
    }
  }

  /** Streaming SCD Type-2 dimension MAINTENANCE — the incremental form of
    * ev_scd2_history: each micro-batch folds its (event-time-ordered)
    * change events into the effective-dated dimension table through
    * MergeSink, touching only the affected users' rows. Per batch:
    *  1. read the CURRENT (open) version of each user from the sink;
    *  2. collapse the batch's per-user ordered events against that open
    *     state (a change feed records changes — a batch head equal to the
    *     open state collapses away, exactly like an intra-batch repeat);
    *  3. emit the close-out of the open row (effective_to = first new
    *     change) plus the new versions numbered from open.version+1, the
    *     last one open;
    *  4. MERGE on (user_id, version), recording the streaming batchId as a
    *     commit PROPERTY — atomic with the data (same manifest CAS).
    * Replay safety: MERGE-on-key alone only dedupes identical re-writes,
    * not RE-DERIVED ones — if a batch's merge commits but the job dies
    * before the streaming checkpoint commits, the replayed batch re-reads
    * the already-updated open rows and derives different (wrong) versions.
    * The committed batchId high-water mark closes that window: a replayed
    * batch (id ≤ the sink's recorded mark) is skipped outright, so the
    * apply is exactly-once against sink mutation (StreamScd2Spec drives
    * the replay path directly).
    * Contract: batches must respect event-time order ACROSS batches (the
    * staged replay does; late data needs a watermark-delayed
    * reconciliation MERGE — documented, out of scope here). At the lake
    * the open rows live in their own is_current partition, so step 1 is
    * a pruned read, and the MERGE rewrites only files holding touched
    * users — both MergeSink mechanics this engine already proves.
    */
  def streamScd2(spark: SparkSession, sourceDir: String, sinkPath: String,
                 checkpoint: String): Unit = {
    val q = eventsStream(spark, sourceDir).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyScd2Batch(batch.sparkSession, sinkPath, batch, Some(batchId)); ()
      }
      .start()
    q.awaitTermination()
  }

  private val Scd2BatchProp = "stream.scd2.batchId"

  private[graft] def applyScd2Batch(s: SparkSession, sinkPath: String,
      batch: DataFrame, batchId: Option[Long] = None): Unit = {
    // replayed micro-batch (merge committed, checkpoint didn't): the
    // sink's high-water mark proves this id was already applied — no-op
    val applied = batchId.flatMap(_ =>
      MergeSink.lastProperty(sinkPath, Scd2BatchProp).map(_.toLong))
    if (batchId.exists(id => applied.exists(_ >= id))) return
    import org.apache.spark.sql.expressions.Window
    val seqs = batch
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("arr"))
    val open =
      if (MergeSink.currentVersion(sinkPath).nonEmpty)
        MergeSink.read(s, sinkPath).filter(col("is_current"))
          .select(col("user_id"), col("state").as("open_state"),
            col("effective_from").as("open_from"),
            col("version").as("open_version"))
      else
        seqs.select(col("user_id"), lit(null).cast(StringType).as("open_state"),
          lit(null).cast(TimestampNTZType).as("open_from"),
          lit(null).cast(LongType).as("open_version")).limit(0)
    // changes = batch elements differing from their predecessor; the open
    // state is the head element's predecessor (element_at is 1-based, so
    // element_at(arr, i) with the 0-based transform index IS the previous)
    val withChanges = seqs.join(open, Seq("user_id"), "left")
      .withColumn("changes",
        expr("""filter(
                  transform(arr, (x, i) ->
                    struct(x.ts AS ts, x.event_id AS event_id,
                           x.event_type AS event_type,
                           CASE WHEN i = 0 THEN open_state
                                ELSE element_at(arr, i).event_type END AS prev)),
                  c -> c.prev IS NULL OR c.prev <> c.event_type)"""))
      .filter(size(col("changes")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = withChanges.select(col("user_id"),
      coalesce(col("open_version"), lit(0L)).as("base"),
      posexplode(col("changes")).as(Seq("pos", "c")))
    val wv = Window.partitionBy("user_id").orderBy("pos")
    val newRows = exploded.select(col("user_id"),
      col("c.event_type").as("state"),
      col("c.ts").as("effective_from"),
      lead(col("c.ts"), 1).over(wv).as("effective_to"),
      (col("base") + col("pos") + lit(1)).cast(LongType).as("version"),
      lead(col("c.ts"), 1).over(wv).isNull.as("is_current"))
    val closing = withChanges.filter(col("open_version").isNotNull)
      .select(col("user_id"), col("open_state").as("state"),
        col("open_from").as("effective_from"),
        expr("element_at(changes, 1).ts").as("effective_to"),
        col("open_version").as("version"), lit(false).as("is_current"))
    MergeSink.merge(s, sinkPath, newRows.unionByName(closing),
      key = Seq("user_id", "version"), tiebreak = Seq(col("effective_from")),
      properties = batchId.map(id => Scd2BatchProp -> id.toString).toMap)
    withChanges.unpersist()
    ()
  }

  def slidingCounts(spark: SparkSession, sourceDir: String, sinkPath: String,
                    checkpoint: String): Unit = {
    import graft.functions.Num
    val stream = eventsStream(spark, sourceDir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value"), 6).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
    withStateTunedConf(spark) {
      val q = agg.writeStream
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          upsert(batch.sparkSession, sinkPath, batch, Seq("w_start", "event_type"))
        }
        .start()
      q.awaitTermination()
    }
  }
}
