package graft.streaming

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Exactly-once semantics of the streaming ingest under the three replay
  * scenarios: same checkpoint (offsets skip), fresh checkpoint (full
  * replay), and incremental new-file arrival.
  */
class EventsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AvailableNow + foreachBatch dedup sink is exactly-once under replay") {
    val base = Files.createTempDirectory("graft-ev-test").toString
    val src = s"$base/src"; new java.io.File(src).mkdirs()
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(src, "events.parquet"))
    val sink = s"$base/sink"

    EventsStream.drain(spark, src, sink, s"$base/ckpt1")
    val n = spark.read.parquet(sink).count()
    assert(n == spark.read.parquet(s"$src/events.parquet").count())

    // same checkpoint: offsets already committed, no new batch
    EventsStream.drain(spark, src, sink, s"$base/ckpt1")
    assert(spark.read.parquet(sink).count() == n)

    // fresh checkpoint: full source replay — sink dedup absorbs it
    EventsStream.drain(spark, src, sink, s"$base/ckpt2")
    assert(spark.read.parquet(sink).count() == n)

    // new file arrives (a copy with the same ids): incremental batch,
    // still absorbed
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(src, "events2.parquet"))
    EventsStream.drain(spark, src, sink, s"$base/ckpt1")
    assert(spark.read.parquet(sink).count() == n)
  }

  test("mapGroupsWithState accumulates across micro-batches in the state store") {
    val base = Files.createTempDirectory("graft-st-test").toString
    val src = s"$base/src"; new java.io.File(src).mkdirs()
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(src, "events.parquet"))
    val sink = s"$base/sink"

    EventsStream.statefulCounts(spark, src, sink, s"$base/ckpt")
    val first = spark.read.parquet(sink).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_events")).toMap
    val total = first.values.sum

    // a second file (same events re-delivered) under the SAME checkpoint:
    // stateful counts are delivery counts, so every user's n doubles —
    // proving state survived the first run in the state store
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(src, "events2.parquet"))
    EventsStream.statefulCounts(spark, src, sink, s"$base/ckpt")
    val second = spark.read.parquet(sink).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_events")).toMap
    assert(second.values.sum == 2 * total)
    assert(first.keySet == second.keySet)
    assert(first.forall { case (u, n) => second(u) == 2 * n })
  }

  test("stateful upsert rewrites only the touched bucket partitions") {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val base = Files.createTempDirectory("graft-st-prune").toString
    val src = s"$base/src"; new java.io.File(src).mkdirs()
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(src, "events.parquet"))
    val sink = s"$base/sink"
    EventsStream.statefulCounts(spark, src, sink, s"$base/ckpt")

    def filesPerBucket: Map[String, Set[String]] =
      new java.io.File(sink).listFiles().filter(_.getName.startsWith("bucket="))
        .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    val before = filesPerBucket
    assert(before.size > 1, "expected a bucket-partitioned sink")

    // deliver ONE user's event; only that user's bucket partition may
    // change. The delta is derived from the staged file itself so its ts
    // ENCODING (ns-long vs µs-timestamp, a property of the testdata
    // generation) always matches the rest of the source dir — a
    // hand-built long row next to µs data would poison the
    // footer-derived stream schema.
    val oneUser = 7L
    val deltaDir = s"$base/delta"
    spark.read.parquet(s"$src/events.parquet").limit(1)
      .withColumn("event_id", lit(999999L))
      .withColumn("user_id", lit(oneUser))
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(deltaDir)
    val part = new java.io.File(deltaDir).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(src, "delta.parquet"))
    EventsStream.statefulCounts(spark, src, sink, s"$base/ckpt")

    val after = filesPerBucket
    val touched = spark.range(1)
      .select(pmod(hash(lit(oneUser)), lit(EventsStream.StateBuckets)))
      .head().getInt(0)
    // preconditions that keep the assertions below from being skippable:
    // the touched bucket pre-exists, and no partition appears or vanishes
    assert(before.contains(s"bucket=$touched"), s"user $oneUser's bucket missing from the sink")
    assert(after.keySet == before.keySet, "partitions appeared or vanished")
    before.foreach { case (bucket, files) =>
      if (bucket == s"bucket=$touched")
        assert(after(bucket) != files, "touched bucket must be rewritten")
      else
        assert(after(bucket) == files, s"untouched $bucket was rewritten")
    }
    // and the merged state is correct for the touched user
    val n = spark.read.parquet(sink).filter(col("user_id") === oneUser)
      .head().getAs[Long]("n_events")
    val expected = spark.read.parquet(s"$src/events.parquet")
      .filter(col("user_id") === oneUser).count() + 1
    assert(n == expected)
  }
}
