package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the contract between ScaleUp's per-copy vocabulary suffix and the
  * dedup tier's clean step: the suffix must SURVIVE cleaning as part of
  * each word. The r7 scaling audit caught the violation live — a `~i`
  * suffix was stripped by `graft_shingles` (punctuation → separator),
  * detaching into a shared token interleaved through every copy-i doc and
  * exploding LSH candidates 6000× — so this spec fails CI if either side
  * (the suffix alphabet or the cleaner's keep-set) drifts back into
  * conflict.
  */
class ScaleSuffixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shingles(text: String): Seq[String] =
    spark.range(1)
      .select(call_function("graft_shingles", lit(text)).as("s"))
      .head().getSeq[String](0)

  test("the ScaleUp suffix shape (alnum, no separator) survives graft_shingles") {
    // same transform ScaleUp applies for copy i = 1
    val suffixed = "alpha beta gamma delta".split(" ").map(_ + "x1").mkString(" ")
    assert(shingles(suffixed) ==
      Seq("alphax1 betax1 gammax1", "betax1 gammax1 deltax1"),
      "suffix was split off by the cleaner — per-copy vocabularies are no longer disjoint")
  }

  test("the r7 bug shape: a punctuation suffix detaches into a shared token") {
    // documents what goes WRONG with a non-alnum suffix, so the failure
    // mode stays visible: '~1' cleans to a standalone '1' between words
    val tilde = "alpha beta gamma".split(" ").map(_ + "~1").mkString(" ")
    assert(shingles(tilde).head == "alpha 1 beta",
      "cleaner behavior changed — revisit ScaleUp's suffix contract")
  }

  test("suffixed copies share no shingles with the original") {
    val base = "the quick brown fox jumps over the lazy dog"
    val copy = base.split(" ").map(_ + "x3").mkString(" ")
    assert(shingles(base).toSet.intersect(shingles(copy).toSet).isEmpty)
  }
}
