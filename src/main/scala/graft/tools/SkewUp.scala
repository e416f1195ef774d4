package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: derive a SKEWED benchmark replica — ScaleUp's key-offset
  * replication with Zipfian pathologies injected into copies ≥ 1, so the
  * engine's skew defenses (map-side combine on boilerplate gram keys, AQE
  * skew splits, salted top-k, TotalOrder's tie split) are MEASURED, not
  * just contract-pinned (the r10 verdict's ask #6). BENCH-ONLY data.
  *
  * Injected pathologies (copy 0 stays pristine, so the replica holds the
  * uniform workload PLUS the pathological mass):
  *  - documents: every copy-i≥1 doc gets a SHARED 30-token boilerplate
  *    PREFIX (per-copy vocabulary, like ScaleUp's suffixing) — tens of
  *    thousands of documents sharing every prefix window/shingle/gram is
  *    the melting-reducer key class ExactSubstr's partial-agg shape
  *    defends against. Docs with doc_id % 97 == 0 become PURE boilerplate
  *    (one of 50 variants): exact-duplicate groups of ~100 docs each —
  *    hot keys for exact dedup and bounded near-dup cliques for the pair
  *    stages — with identical token counts and quality scores (the
  *    TotalOrder tie-degeneracy mass).
  *  - events: copy-i≥1 user_ids collapse to 20 HOT USERS per copy —
  *    sessionization / per-user windows see Zipf-heavy partitions.
  *  - lineitem: copy-i≥1 rows with an even order key collapse their
  *    l_suppkey onto 5 HOT SUPPLIERS per copy — the skewed fact-dim join.
  *  - everything else: plain ScaleUp replication (embeddings rotated,
  *    dims copied once).
  *
  * Usage: runMain graft.tools.SkewUp <srcSfDir> <dstDir> <copies>
  */
object SkewUp {

  private val Stride = 1000000000L

  def main(args: Array[String]): Unit = {
    val Array(src, dst, copiesStr) = args
    val copies = copiesStr.toInt
    val spark = graft.Sessions.local(appName = "graft-skewup")
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
      println(s"skew-scaled $table -> ${copies}x")
    }
    def id(d: DataFrame, i: Int): DataFrame = d

    for (t <- Seq("region", "nation")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    replicate("customer", Seq("c_custkey")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("c_name",
        overlay(col("c_name"), lit(('a' + i - 1).toChar.toString), lit(9)))
    }
    replicate("supplier", Seq("s_suppkey"))(id)
    replicate("part", Seq("p_partkey"))(id)
    replicate("orders", Seq("o_orderkey", "o_custkey"))(id)
    // hot fact-side join key: half of each skew copy's lineitem rows land
    // on 5 suppliers (keys exist in the replicated supplier table)
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("l_suppkey",
        when(col("l_orderkey") % 2 === 0,
          lit(i * Stride) + (col("l_suppkey") % 5) + 1)
          .otherwise(col("l_suppkey")))
    }
    // hot users: Zipf-heavy sessionization partitions
    replicate("events", Seq("event_id", "user_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("user_id", lit(i * Stride) + (col("user_id") % 20))
    }
    // boilerplate-heavy documents (alphanumeric per-copy vocab, the
    // ScaleUp "x$i" rule, so cleaning keeps copies disjoint)
    replicate("documents", Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else {
        val suffixed = array_join(transform(split(col("text"), " "),
          x => concat(x, lit("x" + i))), " ")
        val boiler = lit((1 to 30).map(w => s"bp${w}c$i").mkString(" "))
        val variant = concat(lit(s"var c$i v"), (col("doc_id") % 50).cast("string"))
        d.withColumn("text",
          when(col("doc_id") % 97 === 0, concat(boiler, lit(" "), variant))
            .otherwise(concat(boiler, lit(" "), suffixed)))
      }
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
