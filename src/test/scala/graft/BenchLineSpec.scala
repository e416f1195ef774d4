package graft

import org.scalatest.funsuite.AnyFunSuite

/** The recording harness keeps only the LAST 2000 chars of Bench's stdout;
  * if the one-line JSON outgrows that window it is truncated head-first and
  * the round records no numbers at all (BENCH_r02–r04 were all lost exactly
  * this way at 58–82 entries). Bench.fmt caps every per-query value at 3
  * chars (values clamp at 999 s), so the line length is a pure function of
  * the registered headline names — this guard fails the build when a new
  * bench entry would push the worst-case line past the window.
  *
  * Budget model: 2000 chars minus sbt's framing that shares the tail —
  * the `[info] ` prefix on the JSON line (~7 chars) and the trailing
  * `[success] Total time: …` line (~65 chars observed in r02/r03 tails).
  */
class BenchLineSpec extends AnyFunSuite {
  test("headline queries are all registered") {
    val unknown = SparkEntry.benchQueries.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"benchQueries not in SparkEntry.queries: $unknown")
  }

  test("bench aliases map only registered queries, to unique short keys") {
    val unknown = SparkEntry.benchAlias.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"aliases for unknown queries: $unknown")
    // emitted keys must stay collision-free across aliased + plain names
    val emitted = SparkEntry.benchQueries
      .map(n => SparkEntry.benchAlias.getOrElse(n, n))
    assert(emitted.distinct.size == emitted.size, "alias collision in emitted keys")
    // and every alias must actually shorten the line
    SparkEntry.benchAlias.foreach { case (n, a) =>
      assert(a.length < n.length, s"alias '$a' does not shorten '$n'") }
  }

  test("worst-case bench JSON line fits the 2000-char capture tail") {
    val names = SparkEntry.benchQueries
      .map(n => SparkEntry.benchAlias.getOrElse(n, n))
    // worst case: every query at the 3-char clamp, every query ALSO listed
    // in "failed" is impossible (failures leave the map), so model the
    // longer of the two renderings per entry — the map entry. The suspect
    // block is capped at 3 entries; model it at the 3 longest names with
    // the 4-char ratio clamp (99.9).
    val qs = names.map(n => s""""$n":999""").mkString("{", ",", "}")
    val sus = names.sortBy(-_.length).take(3)
      .map(n => s""""$n":99.9""").mkString(""","suspect":{""", ",", "}")
    val line =
      s"""{"metric":"total","value":99999.9,"unit":"sec","queries":$qs$sus,"sf":"sf0.01"}"""
    val sbtFraming = 7 + 70 // "[info] " prefix + "[success] Total time: …" suffix
    assert(line.length + sbtFraming <= 2000,
      s"worst-case bench line is ${line.length}+$sbtFraming chars; the driver " +
        "captures only the last 2000 — shorten names or drop a bench entry")
  }

  test("headline line survives the post-sweep tail (r13 defect #1)") {
    // Bench re-emits the identical headline line as the FINAL stdout write
    // after the full sweep and after spark.stop(), so the only bytes that
    // can follow it are sbt's framing plus at most a couple of stray
    // shutdown lines. Model the worst case: the full-size line, sbt
    // framing, and a 150-char trailing-noise allowance must still fit the
    // 2000-char capture window. (The r13 failure mode was unbounded
    // per-query WARN chatter AFTER the line; the fix is ordering — line
    // last — so the budget only has to absorb bounded shutdown noise.)
    val names = SparkEntry.benchQueries
      .map(n => SparkEntry.benchAlias.getOrElse(n, n))
    val qs = names.map(n => s""""$n":999""").mkString("{", ",", "}")
    val sus = names.sortBy(-_.length).take(3)
      .map(n => s""""$n":99.9""").mkString(""","suspect":{""", ",", "}")
    val line =
      s"""{"metric":"total","value":99999.9,"unit":"sec","queries":$qs$sus,"sf":"sf0.01"}"""
    val sbtFraming = 7 + 70
    val trailingNoiseAllowance = 150
    assert(line.length + sbtFraming + trailingNoiseAllowance <= 2000,
      s"post-sweep tail (line ${line.length} + framing + noise allowance) " +
        "exceeds the 2000-char capture window")
  }

  test("every declared query carries exactly one envelope (headline or sweep)") {
    val declared = SparkEntry.allDefs.map(_.name).toSet
    val headline = SparkEntry.benchQueries.toSet
    // non-headline queries self-adjudicate through the sweep map
    val uncovered = declared -- headline -- BenchEnvelopes.fullSweepSec.keySet
    assert(uncovered.isEmpty, s"declared queries with no sweep envelope: $uncovered")
    // no orphans: a retired/renamed/promoted query must drop its sweep row
    val orphans = BenchEnvelopes.fullSweepSec.keySet -- (declared -- headline)
    assert(orphans.isEmpty, s"sweep envelopes with no matching non-headline query: $orphans")
    // sweep bar: flags a real 4x regression, ignores first-run jitter
    val sus = BenchEnvelopes.sweepSuspects(Seq(
      "tpch_q16_parts_supplier" -> 6.5, // 4.1x the 1.6 envelope -> flag
      "mm_resize" -> 0.9,               // 4.5x but under the +1.5s floor -> quiet
      "never_enveloped_query" -> 99.0)) // unknown -> never flags
    assert(sus.map(_._1) == Seq("tpch_q16_parts_supplier"))
  }

  test("every headline entry carries a committed self-adjudication envelope") {
    val missing = SparkEntry.benchQueries.filterNot(BenchEnvelopes.envelopeSec.contains)
    assert(missing.isEmpty, s"bench entries without an envelope: $missing")
    // and no ORPHAN envelopes: a renamed/retired headline must drop its row,
    // or the map silently stops describing the bench surface
    val orphans = BenchEnvelopes.envelopeSec.keySet -- SparkEntry.benchQueries.toSet
    assert(orphans.isEmpty, s"envelopes without a bench entry: $orphans")
    // and the suspect logic flags a 3x outlier but not jitter on tiny entries
    val sus = BenchEnvelopes.suspects(Seq("dd_exact" -> 0.4, "gr_pagerank" -> 15.3))
    assert(sus.map(_._1) == Seq("gr_pagerank"))
    assert(BenchEnvelopes.suspects(
      (1 to 10).map(i => s"q$i" -> 999.0) ++ Seq("gr_pagerank" -> 15.3)).size <= 3)
  }
}
