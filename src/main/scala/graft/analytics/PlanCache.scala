package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE memo-and-persist implementation behind every shared cached
  * subplan (shingle tables, semdedup assignments, deviation tables, PQ
  * subvectors, BFS edge tables, …).
  *
  * Why centralized: the per-file TrieMap copies this replaced had two
  * latent faults (r8 advice): (1) an entry keyed only by (session, dir)
  * kept serving a STALE table after the data under `dir` was rewritten
  * within one session — the planted-corpus test pattern; (2) evicted or
  * replaced entries were never `unpersist()`ed, leaking executor cache.
  * This cache keys each entry by a CONTENT FINGERPRINT of the directory
  * (every file's path, length and mtime — the same freshness signal
  * Spark's own FileIndex uses) and unpersists whatever it drops.
  *
  * Scale note: the fingerprint walk is control-plane driver work, O(files)
  * per cache lookup, no data scan. At lake scale the equivalent signal is
  * the table's commit version (MergeSink.versions) — cheaper still.
  *
  * Since r11 this cache is a PROCESS-LOCAL ACCELERATOR, not the system of
  * record: the ANN tier's trained cells, PQ codebooks and code tables are
  * persisted as MergeSink tables (AnnLake) with an incremental
  * assign-and-append path, so a new session probes the lake instead of
  * retraining — the same story as every other corpus-scale artifact.
  */
object PlanCache {

  private final case class Entry(fingerprint: Long, df: DataFrame)

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), Entry]

  /** FNV-style fold of (path, length, mtime) over the directory tree. */
  private def fingerprint(dir: String): Long = {
    def walk(f: java.io.File, acc: Long): Long = {
      val h = acc * 1099511628211L ^ f.getPath.hashCode.toLong
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).foldLeft(h)((a, c) => walk(c, a))
      else h * 1099511628211L ^ (f.length * 31 + f.lastModified)
    }
    walk(new java.io.File(dir), -3750763034362895579L) // FNV-1a 64-bit offset basis
  }

  /** Memoized persisted DataFrame for (session, dir, tag): rebuilt (and the
    * stale copy unpersisted) whenever the files under `dir` change.
    */
  def cached(s: SparkSession, dir: String, tag: String)(build: => DataFrame): DataFrame =
    synchronized {
      // drop entries of stopped sessions (their blocks died with the executor)
      cache.filterInPlace { case ((sess, _, _), _) => !sess.sparkContext.isStopped }
      val key = (s, dir, tag)
      val fp = fingerprint(dir)
      cache.get(key) match {
        case Some(e) if e.fingerprint == fp => e.df
        case stale =>
          stale.foreach(_.df.unpersist())
          val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          cache.put(key, Entry(fp, df))
          df
      }
    }

  private val ckpt =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), Entry]

  /** Memoized EAGERLY-CHECKPOINTED DataFrame for (session, dir, tag) —
    * the [[cached]] contract for shared subplans whose consumers need a
    * PINNED physical layout: a localCheckpoint's LogicalRDD carries the
    * build's partitioning and sort order to every consumer (an
    * InMemoryRelation's can be degraded by AQE re-planning), and the
    * eager materialization runs exactly once — the lazy persist raced
    * concurrent AQE stage futures, which each recomputed the same cache
    * partitions (gr_pagerank, r17: 113 s of duplicated task time on the
    * build run). Same content-fingerprint invalidation as [[cached]];
    * dropped entries free their blocks when the RDD reference is GC'd
    * (ContextCleaner), so no explicit unpersist exists or is needed.
    */
  def checkpointed(s: SparkSession, dir: String, tag: String)(build: => DataFrame): DataFrame =
    synchronized {
      ckpt.filterInPlace { case ((sess, _, _), _) => !sess.sparkContext.isStopped }
      val key = (s, dir, tag)
      val fp = fingerprint(dir)
      ckpt.get(key) match {
        case Some(e) if e.fingerprint == fp => e.df
        case _ =>
          val df = build.localCheckpoint(true)
          ckpt.put(key, Entry(fp, df))
          df
      }
    }

  /** Drop (and unpersist) every entry under `dir` — the test-visible
    * invalidation hook for suites that rewrite a corpus in place.
    */
  def invalidate(dir: String): Unit = synchronized {
    cache.filterInPlace {
      case ((_, d, _), e) if d == dir => e.df.unpersist(); false
      case _ => true
    }
    ckpt.filterInPlace { case ((_, d, _), _) => d != dir }
    ()
  }
}
