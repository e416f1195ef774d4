package graft.analytics

import org.apache.spark.sql.SparkSession
import graft.ingest.MergeSink

/** Version-keyed ensure-memo (r11 verdict ask #1): every `ensure*` used to
  * memoize per (process, dir) alone, so a maintenance commit landing on the
  * sink AFTER the memo warmed (a streaming drain, another session's daily
  * batch) left a warm process holding metadata derived from the OLD table
  * state for its whole lifetime. The staleness signal was always named in
  * prose — "the table's commit version, which the manifest carries already"
  * — this wires it: the memo records the last committed version of every
  * sink table the value spans, revalidates them on EVERY access (O(tables)
  * driver-side manifest listings, no data scan), and when any version
  * advanced re-derives the version-DERIVED state against the same sinks
  * (`refresh`) before handing the value out. PlanCache's invalidation
  * contract, applied to lake artifacts.
  *
  * Reads themselves were never the problem — `MergeSink.read` always serves
  * the latest manifest — the stale state is what ensure* DERIVES at build
  * time (trained-cell counts probes size their fan-out from, construction
  * version ids) and would otherwise freeze until process restart.
  */
private[analytics] final class VersionedMemo[V](
    tables: V => Seq[String],
    refresh: (SparkSession, V) => V) {

  // (value, seen commit versions per table)
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, (V, Map[String, Long])]

  // O(1) files per table (the _last pointer), not an O(commits) LIST —
  // this runs on EVERY memoized access (r12 verdict ask #3)
  private def versionsOf(v: V): Map[String, Long] =
    tables(v).map(p => p -> MergeSink.currentVersion(p).getOrElse(0L)).toMap

  /** Memoized value for `dir`: built on first access, REVALIDATED against
    * the sink tables' current commit versions on every later one. A
    * detected advance re-derives via `refresh` and re-pins; two readers
    * racing the re-pin both derive from committed state, so last-wins is
    * sound for a cache.
    */
  def get(s: SparkSession, dir: String)(build: => V): V = {
    // PIN-BEFORE-DERIVE (r12 advice): the versions pinned as "seen" are
    // always read BEFORE the derive they vouch for, so a commit landing
    // DURING a derive is detected — and re-derived — on the next access:
    // one conservative extra refresh, never a missed one. (Pinning AFTER
    // the derive raced: a commit between the derive's internal reads and
    // the pin was recorded as seen with its state never derived.) The
    // first build cannot pre-read (the sink tables don't exist until
    // `build` runs), so it pre-reads after building and pays one
    // immediate refresh to put the derived state under the discipline.
    val (value, seen) = memo.computeIfAbsent(dir, _ => {
      val built = build
      val pre = versionsOf(built)
      (refresh(s, built), pre)
    })
    val cur = versionsOf(value)
    if (cur == seen) value
    else {
      val fresh = refresh(s, value)
      memo.put(dir, (fresh, cur))
      fresh
    }
  }

  /** The commit versions the memo currently believes (spec observability:
    * AnnLakeSpec pins stale-detect-and-refresh against these).
    */
  def seen(dir: String): Option[Map[String, Long]] =
    Option(memo.get(dir)).map(_._2)
}

private[analytics] object VersionedMemo {
  /** The common case: the memoized value IS the sink path(s) and carries no
    * version-derived metadata. Revalidation then only re-pins the seen
    * versions — live reads already serve new commits — but the memo keeps
    * the uniform contract (and the uniform observability) of the family.
    */
  def paths[V](tables: V => Seq[String]): VersionedMemo[V] =
    new VersionedMemo[V](tables, (_, v) => v)
}
