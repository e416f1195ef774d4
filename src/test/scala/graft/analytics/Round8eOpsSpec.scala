package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Property pins for the media-dedup / BFS / EWMA batch — brute-force and
  * sequential-fold local recomputes.
  */
class Round8eOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, sf)

  // ---- dd_media_dedup: multiprobe blocking is LOSSLESS at hamming ≤ 1

  test("media dedup equals the brute-force hamming<=1 pair set") {
    import graft.multimodal.Multimodal
    // sf0.01: the real-BMP aHash codes have no hamming<=1 collision in the
    // 167-image sf0.001 corpus (the pin would be vacuous there)
    val sf01 = "/root/testdata/sf0.01"
    val codes = Multimodal.imageHash(
        Multimodal.bmpMedia(spark, graft.Tables.documents(spark, sf01)))
      .collect().map(h => h.media_id -> h.code).sortBy(_._1)
    val expected = (for {
      (ia, ca) <- codes; (ib, cb) <- codes
      if ia < ib && java.lang.Long.bitCount(ca ^ cb) <= 1
    } yield (ia, ib, java.lang.Long.bitCount(ca ^ cb).toLong)).toSet
    assert(expected.nonEmpty, "no hamming<=1 media pairs; pin is vacuous")
    val got = SparkEntry.allDefs.find(_.name == "dd_media_dedup").get
      .fn(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"multiprobe pair set diverges from brute force: got $got want $expected")
  }

  // ---- gr_bfs_distance: hop distances equal a local BFS

  test("bfs distances equal a local breadth-first search") {
    import org.apache.spark.sql.functions._
    val edges = graft.Tables.lineitem(spark, sf)
      .select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    edges.foreach { case (s0, d0) =>
      adj(s0) = d0 :: adj.getOrElse(s0, Nil)
      adj(d0) = s0 :: adj.getOrElse(d0, Nil)
    }
    val dist = scala.collection.mutable.Map.empty[Long, Long]
    var frontier = Seq(3L, 5L, 7L).filter(adj.contains)
    frontier.foreach(dist(_) = 0L)
    for (d <- 1L to 3L) {
      frontier = frontier.flatMap(adj(_)).distinct.filterNot(dist.contains)
      frontier.foreach(dist(_) = d)
    }
    val got = run("gr_bfs_distance").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist.toMap,
      s"BFS diverges from local recompute (sizes ${got.size} vs ${dist.size})")
    assert(got.valuesIterator.max == 3L && got.valuesIterator.min == 0L)
  }

  // ---- ev_ewma_smooth: the fold is exactly the ordered recurrence

  test("ewma equals the ordered sequential recurrence, bit-exact") {
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val expected = evs.groupBy(_._1).map { case (t, rows) =>
      // (getTime, getNanos): ms-truncated time plus the full fractional
      // second — orders µs-precision timestamps exactly as Spark's ts sort
      val ordered = rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).map(_._4)
      t -> (rows.length.toLong,
        ordered.tail.foldLeft(ordered.head)((acc, x) => 0.125 * x + 0.875 * acc))
    }
    val got = run("ev_ewma_smooth").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (t, (n, e)) =>
      assert(got(t)._1 == n && got(t)._2 == e, // == : BIT-exact, not approx
        s"type $t: ewma ${got(t)._2} != local fold $e")
    }
  }
}
