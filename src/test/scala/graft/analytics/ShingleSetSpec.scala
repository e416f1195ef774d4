package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.{Tables, TestSpark}
import graft.functions.Norm

/** graft_shingles (the compiled one-pass expression) must be extensionally
  * identical to the composed built-in pipeline it replaces —
  * clean → split → 3-shingle → distinct — on the real corpus and on the
  * edge cases (short docs, punctuation runs, repeated shingles, empties).
  */
class ShingleSetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def composed = {
    val words = split(Norm.cleanText(col("text")), " ")
    array_distinct(
      when(size(words) >= 3,
        transform(sequence(lit(1), size(words) - 2),
          i => concat_ws(" ", slice(words, i, lit(3)))))
        .otherwise(array().cast(ArrayType(StringType))))
  }

  test("native expression matches the composed form on the corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
        col("doc_id"),
        call_function("graft_shingles", col("text")).as("fast"),
        composed.as("slow"))
      // null-SAFE inequality: a regression to NULL output must count as a
      // diff, not silently drop out of the filter
      .filter(!(col("fast") <=> col("slow")))
      .count()
    assert(diff == 0)
  }

  test("edge cases: empties, short docs, punctuation, duplicate shingles") {
    import spark.implicits._
    val cases = Seq(
      null,                     // NULL text → [] (both forms), never NULL
      "",                       // empty
      "   ",                    // whitespace only
      "one two",                // < 3 words
      "a b c",                  // exactly one shingle
      "A,  b!!c d",             // punctuation runs + case folding
      "x y z x y z x y z",     // repeated shingles → distinct
      "tab\tand\nnewline sep", // non-space whitespace
      "123 4a5 ... 6",          // digits and symbol runs
      "İstanbul Über Straße café here") // multi-char lowercase expansions (İ → i̇)
    val df = cases.toDF("text")
    val rows = df.select(
      call_function("graft_shingles", col("text")).as("fast"), composed.as("slow"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(!r.isNullAt(0), s"graft_shingles returned NULL for input '$c'")
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"input: '$c'")
    }
  }
}
