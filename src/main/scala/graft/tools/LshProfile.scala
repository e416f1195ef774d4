package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage profile of the dd_minhash_lsh pipeline at a
  * given SF dir — shingle build, band table, candidate self-join, verify —
  * to localize super-linear scaling (the r7 ScaleUp audit flagged 15× wall
  * at 10× data).
  * Usage: runMain graft.tools.LshProfile <sfDir>
  */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Sessions.local(appName = "graft-lshprofile")
    spark.sparkContext.setLogLevel("ERROR")
  
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.Tables.documents(spark, dir)
    println(s"docs: ${docs.count()}")
    val shingles = docs.select(col("doc_id"),
        call_function("graft_shingles", col("text")).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("shingle build + persist")(shingles.count())
    println(s"  total shingles: ${shingles.select(expr("sum(size(shingles))")).head().getLong(0)}")

    val base = shingles.filter(size(col("shingles")) > 0)
    val K = 9; val R = 3; val Bands = 3; val Mod = 1000000007L
    val hashed = base.select(
      col("doc_id"),
      transform(col("shingles"), sh => call_function("graft_rolling_hash", sh)).as("h1"),
      transform(col("shingles"), sh => call_function("graft_rolling_hash", reverse(sh))).as("h2"))
    val sigCols = (0 until K).map { k =>
      array_min(zip_with(col("h1"), col("h2"),
        (a, b) => (a + lit(k.toLong) * (b * 2 + 1)) % lit(Mod))).as(s"h$k")
    }
    val sigs = hashed.select(col("doc_id") +: sigCols: _*)
    val bandKeys = array((0 until Bands).map { b =>
      concat_ws("|", lit(b.toString), col(s"h${b * R}"), col(s"h${b * R + 1}"), col(s"h${b * R + 2}"))
    }: _*)
    val bands = sigs.select(col("doc_id"), explode(bandKeys).as("band_key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("band table")(println(s"  band rows: ${bands.count()}"))

    val bucketSizes = bands.groupBy("band_key").count()
    timed("bucket histogram") {
      bucketSizes.select(
        count(lit(1)).as("buckets"),
        max("count").as("max_bucket"),
        sum(col("count") * (col("count") - 1) / 2).as("pair_candidates"))
        .show(truncate = false)
    }

    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("candidate self-join")(println(s"  candidate pairs: ${pairs.count()}"))

    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val verified = pairs
      .join(base.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        inter.cast("double") / (size(col("sh_a")) + size(col("sh_b")) - inter))
      .filter(col("jaccard") >= 0.5)
    timed("verify")(println(s"  verified: ${verified.count()}"))
    spark.stop()
  }
}
