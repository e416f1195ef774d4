package graft

import org.scalatest.funsuite.AnyFunSuite

/** The recording harness keeps only the LAST 2000 chars of Bench's stdout;
  * if the one-line JSON outgrows that window it is truncated head-first and
  * the round records no numbers at all (BENCH_r03 was lost exactly this
  * way). Bench.fmt caps every per-query value at 3 chars below 1000 s, so
  * the line length is a pure function of the registered query names — this
  * guard fails the build when a new query would push the worst-case line
  * past the window (shorten names, or stop before the budget).
  */
class BenchLineSpec extends AnyFunSuite {
  test("worst-case bench JSON line fits the 2000-char capture tail") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val qs = names.map(n => s""""$n":9.9""").mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":999.9,"unit":"sec","queries":$qs,"sf":"sf0.01"}"""
    assert(line.length <= 1985,
      s"worst-case bench line is ${line.length} chars; the driver captures " +
        "only the last 2000 — shorten query names or drop a bench entry")
  }
}
