package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession construction for every entry point (Verify, Bench,
  * Probe, tests). Session-scoped configuration lives HERE, not inside table
  * loaders or queries — a loader that flips session conf mid-query silently
  * changes the semantics of every later read (see ADVICE r1 on
  * `nanosAsLong`).
  *
  * Scale posture: `spark.sql.shuffle.partitions` tracks core count locally;
  * on a real cluster AQE coalesces/splits post-shuffle partitions at runtime,
  * so the static number only seeds the initial plan.
  */
object Sessions {

  /** Default parallelism: env override, else 32 (the driver's local[32]). */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def local(threads: String = cpus, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects natively;
      // read as raw nanos longs (Tables.events truncates to micros).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE on: runtime shuffle coalescing, skew-join splitting, and
      // broadcast demotion — the knobs that make the same plan survive a
      // 1000-executor cluster.
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE re-partition CACHED plans too: iterative algorithms
      // (dd_components' label propagation) persist tiny frames every round,
      // and without this the cache pins them at the static shuffle
      // partition count — 32 near-empty tasks per round of a 47-node graph.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // custom Catalyst expressions (graft_rolling_hash, …)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // Survive host-level stalls: round 4's driver bench died in a
      // heartbeat-timeout cascade ("Cannot receive any reply in 10000 ms",
      // rc=124) when the VM was IO-throttled. A single-JVM local master
      // gains nothing from 10 s liveness detection — widen the windows so
      // a multi-second GC/IO pause degrades throughput instead of killing
      // the executor RPC loop. (heartbeatInterval must stay < network
      // timeout; 60 s vs 600 s.)
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.rpc.askTimeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // WindowExec warns "No Partition Defined for Window" on EVERY
    // unpartitioned window, including the provably-bounded ones this engine
    // deliberately plans (GlobalScalarToWindow's scalar decoration and the
    // |domains|-row mixture windows — all post-aggregate frames). The
    // corpus-sized case is excluded STATICALLY: QuerySmokeSpec's
    // "unpartitioned window (scale guard)" walks every declared query's
    // optimized plan and fails the build if an unpartitioned window's input
    // is not bounded below by an Aggregate/Limit/local relation. With the
    // exact plan-level invariant enforced, the runtime heuristic is noise —
    // silence it so real WARNs stay visible in the bench tail.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    spark
  }
}
