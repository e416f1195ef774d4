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

  // worst-case suspect block under the r16 contract: 4 inline confirmed
  // suspects (the longest emitted names) + the overflow count + BOTH host
  // factor fields (batch + streaming)
  private def worstSuspectBlock(names: Seq[String]): String = {
    val sus = names.sortBy(-_.length).take(4)
      .map(n => s""""$n":99.9""").mkString(""","suspect":{""", ",", "}")
    s"""$sus,"suspect_more":99,"hf":4.00,"hf_stream":4.00"""
  }

  test("worst-case bench JSON line fits the 2000-char capture tail") {
    val names = SparkEntry.benchQueries
      .map(n => SparkEntry.benchAlias.getOrElse(n, n))
    // worst case: every query at the 3-char clamp, every query ALSO listed
    // in "failed" is impossible (failures leave the map), so model the
    // longer of the two renderings per entry — the map entry.
    val qs = names.map(n => s""""$n":999""").mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":99999.9,"unit":"sec","queries":$qs${worstSuspectBlock(names)},"sf":"sf0.01"}"""
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
    val line =
      s"""{"metric":"total","value":99999.9,"unit":"sec","queries":$qs${worstSuspectBlock(names)},"sf":"sf0.01"}"""
    val sbtFraming = 7 + 70
    val trailingNoiseAllowance = 150
    assert(line.length + sbtFraming + trailingNoiseAllowance <= 2000,
      s"post-sweep tail (line ${line.length} + framing + noise allowance) " +
        "exceeds the 2000-char capture window")
  }

  test("host factor: median canary ratio, clamped, missing canaries drop out") {
    val env = Map("a" -> 1.0, "b" -> 2.0, "c" -> 1.0, "d" -> 4.0)
    val canaries = Seq("a", "b", "c", "d", "ghost")
    // median of (1.2, 1.5, 1.8) = 1.5 ("d" missing from measured, "ghost"
    // missing from env — both drop out)
    val hf = BenchEnvelopes.hostFactor(
      Seq("a" -> 1.2, "b" -> 3.0, "c" -> 1.8), canaries, env)
    assert(math.abs(hf - 1.5) < 1e-9)
    // a FAST window clamps UP to 1.0 — never lowers the bar under its
    // committed value (that would mask real drift)
    assert(BenchEnvelopes.hostFactor(
      Seq("a" -> 0.3, "b" -> 0.5, "c" -> 0.4), canaries, env) == 1.0)
    // a pathological window clamps at 4.0 — a 10x regression cannot hide
    assert(BenchEnvelopes.hostFactor(
      Seq("a" -> 99.0, "b" -> 99.0, "c" -> 99.0), canaries, env) == 4.0)
    // fewer than 3 surviving canaries → the unscaled bars: a median of one
    // or two ratios is one stall away from the 4.0 clamp (r15 review)
    assert(BenchEnvelopes.hostFactor(Seq("a" -> 99.0, "b" -> 99.0), canaries, env) == 1.0)
    assert(BenchEnvelopes.hostFactor(Nil, canaries, env) == 1.0)
  }

  test("suspect bars scale by the host factor; ratios stay raw") {
    // dd_exact env 0.3: 1.4s is 4.7x — over the unscaled bar (1.3) but
    // under the hf=2 bar (2.6): a slow-window number does not flag
    assert(BenchEnvelopes.suspects(Seq("dd_exact" -> 1.4), hf = 1.0).nonEmpty)
    assert(BenchEnvelopes.suspects(Seq("dd_exact" -> 1.4), hf = 2.0).isEmpty)
    // the reported ratio is measured/envelope, NOT bar-relative
    val Seq((n, r)) = BenchEnvelopes.suspects(Seq("gr_pagerank" -> 15.3), hf = 1.0)
    assert(n == "gr_pagerank" && math.abs(r - 15.3 / 5.1) < 1e-9)
  }

  test("suspects are UNCAPPED (the r14 take(3) cap hid a 4th over-bar entry)") {
    val many = Seq("dd_exact", "gr_pagerank", "k10_merge_upsert", "j1_broadcast_enrich",
      "tx_lang_id").map(_ -> 999.0)
    assert(BenchEnvelopes.suspects(many).size == many.size)
  }

  test("canaries exist in their envelope maps and stay plan-stable entries") {
    val missingH = BenchEnvelopes.headlineCanaries
      .filterNot(BenchEnvelopes.envelopeSec.contains)
    assert(missingH.isEmpty, s"headline canaries without an envelope: $missingH")
    val missingS = BenchEnvelopes.sweepCanaries
      .filterNot(BenchEnvelopes.fullSweepSec.contains)
    assert(missingS.isEmpty, s"sweep canaries without a sweep envelope: $missingS")
    // enough canaries that one odd entry cannot swing the median
    assert(BenchEnvelopes.headlineCanaries.size >= 5)
    assert(BenchEnvelopes.sweepCanaries.size >= 5)
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
    // and the host factor scales the sweep bar too (6.5 < 2.5x the 2x bar)
    assert(BenchEnvelopes.sweepSuspects(
      Seq("tpch_q16_parts_supplier" -> 6.5), hf = 2.5).isEmpty)
  }

  test("streaming host factor: floored at batch, scales only streaming bars") {
    // membership is explicit and total: every declared streaming entry is
    // a declared query, and the canary sets live inside it
    val declared = SparkEntry.allDefs.map(_.name).toSet
    assert((BenchEnvelopes.streamingEntries -- declared).isEmpty)
    assert(BenchEnvelopes.headlineStreamCanaries.forall(BenchEnvelopes.streamingEntries))
    assert(BenchEnvelopes.sweepStreamCanaries.forall(BenchEnvelopes.streamingEntries))
    // canaries carry envelopes in their own maps, and enough of them that
    // the <3-survivor dropout guard has headroom
    assert(BenchEnvelopes.headlineStreamCanaries
      .forall(BenchEnvelopes.envelopeSec.contains))
    assert(BenchEnvelopes.sweepStreamCanaries
      .forall(BenchEnvelopes.fullSweepSec.contains))
    assert(BenchEnvelopes.headlineStreamCanaries.size >= 4)
    assert(BenchEnvelopes.sweepStreamCanaries.size >= 5)
    // floor: a streaming window FASTER than batch hands back the batch
    // factor (never below today's behavior); <3 surviving canaries ditto
    val env = Map("x" -> 1.0, "y" -> 1.0, "z" -> 1.0)
    assert(BenchEnvelopes.hostFactorStream(
      Seq("x" -> 0.5, "y" -> 0.5, "z" -> 0.5), Seq("x", "y", "z"), env, 1.7) == 1.7)
    assert(BenchEnvelopes.hostFactorStream(
      Seq("x" -> 9.0), Seq("x", "y", "z"), env, 1.3) == 1.3)
    // and a 3x streaming window scales streaming bars past batch's reach
    assert(BenchEnvelopes.hostFactorStream(
      Seq("x" -> 3.0, "y" -> 3.1, "z" -> 2.9), Seq("x", "y", "z"), env, 1.2) == 3.0)
    // bar selection: the same measured seconds flag a BATCH entry but not
    // a STREAMING one when only the streaming window is slow —
    // ev_stream_scd2 (env 4.5) at 13.6s is 3.0x: over the hf=1 bar, under
    // the hfStream=1.6 bar; dd_exact (env 0.3) at 1.4s keeps flagging
    val sus = BenchEnvelopes.suspects(
      Seq("ev_stream_scd2" -> 13.6, "dd_exact" -> 1.4), hf = 1.0, hfStream = 1.6)
    assert(sus.map(_._1) == Seq("dd_exact"))
    // sweep analogue: ev_stream_dedup_wm (env 1.4) at 4.5s is 3.2x —
    // exactly the r15 confirmed-suspect shape — cleared by a measured 1.7x
    // streaming window (bar 1.7*2.9=4.9), still flagged under batch-only
    assert(BenchEnvelopes.sweepSuspects(
      Seq("ev_stream_dedup_wm" -> 4.5), hf = 1.0, hfStream = 1.7).isEmpty)
    assert(BenchEnvelopes.sweepSuspects(
      Seq("ev_stream_dedup_wm" -> 4.5), hf = 1.0).nonEmpty)
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
  }
}
