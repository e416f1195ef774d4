package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: derive a larger benchmark SF from the driver-generated
  * sf0.1 tables by key-offset replication — N disjoint copies whose
  * foreign keys stay consistent inside each copy. BENCH-ONLY data (the
  * correctness oracle never runs on it): it exists to measure per-query
  * SCALING FACTORS — does each plan's cost grow ~linearly with the
  * data — and is written outside /root/testdata (which is read-only
  * driver ground truth).
  *
  * Replication rules, chosen so 10× data means 10× of the same
  * workload rather than a degenerate one:
  *  - region/nation: bounded dimensions — copied once, NOT scaled
  *    (fixed cardinality, as in TPC-H itself);
  *  - customer/supplier/part/orders/lineitem/events: every entity key
  *    offset by copy·stride — copies are disjoint, joins stay
  *    copy-local, group cardinalities scale linearly;
  *  - documents: each copy's tokens get a per-copy suffix. Replicated
  *    VERBATIM the corpus would hold N exact copies of every doc, so
  *    the near-dup pair count would grow N² at N× data — a data
  *    artifact, not a scaling property. Distinct per-copy vocabulary
  *    keeps the duplicate RATE constant, like a real N× corpus;
  *  - embeddings: vectors rotated by the copy index (norm-preserving,
  *    and a rotated random vector is ~orthogonal to its source) — same
  *    artifact-avoidance as documents, in cosine space.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <copies>
  */
object ScaleUp {

  // far above any sf0.1 key (max observed ~6e6), far below Long overflow
  private val Stride = 1000000000L

  def main(args: Array[String]): Unit = {
    val Array(src, dst, copiesStr) = args
    val copies = copiesStr.toInt
    val spark = graft.Sessions.local(appName = "graft-scaleup")
    spark.sparkContext.setLogLevel("WARN")

    def replicate(table: String, keys: Seq[String])(
        perCopy: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val out = (0 until copies).map { i =>
        val shifted = keys.foldLeft(base)((d, k) =>
          d.withColumn(k, col(k) + lit(i * Stride)))
        perCopy(shifted, i)
      }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"scaled $table -> ${copies}x")
    }
    def id(d: DataFrame, i: Int): DataFrame = d

    for (t <- Seq("region", "nation")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"copied bounded dim $t")
    }
    // c_name keeps its verbatim "Customer#000000123" digits (they encode
    // the ORIGINAL key, not the offset one), so replicated verbatim every
    // (name-prefix, nation) entity-resolution block would hold N exact
    // name copies — candidate pairs grow N² at N× data and lev=0 pairs
    // appear across copies, a data artifact (same disease the documents
    // table avoids with per-copy vocabulary). Rewriting one character of
    // the constant "Customer#" region per copy keeps every copy's
    // intra-copy name structure (blocks, edit distances) exactly intact
    // while making blocks copy-local, like a real N× entity corpus.
    replicate("customer", Seq("c_custkey")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("c_name",
        overlay(col("c_name"), lit(('a' + i - 1).toChar.toString), lit(9)))
    }
    replicate("supplier", Seq("s_suppkey"))(id)
    replicate("part", Seq("p_partkey"))(id)
    replicate("orders", Seq("o_orderkey", "o_custkey"))(id)
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))(id)
    replicate("events", Seq("event_id", "user_id"))(id)
    // ALPHANUMERIC suffix with no separator: the dedup tier's clean step
    // (graft_shingles / Norm.cleanText) drops punctuation, so a "~1"
    // suffix would be split off into a shared standalone token
    // interleaved through every copy-i document ("w1 1 w2 1 …") — which
    // made all of copy i mutually near-similar and exploded LSH candidate
    // counts 6000× in the r7 scaling audit. "x1" survives cleaning as
    // part of the word, so each copy keeps a genuinely disjoint
    // vocabulary with the SAME intra-copy similarity structure.
    replicate("documents", Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text",
        array_join(transform(split(col("text"), " "),
          x => concat(x, lit("x" + i))), " "))
    }
    replicate("embeddings", Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        concat(slice(col("embedding"), lit(i + 1), size(col("embedding")) - i),
          slice(col("embedding"), lit(1), lit(i))))
    }
    spark.stop()
  }
}
