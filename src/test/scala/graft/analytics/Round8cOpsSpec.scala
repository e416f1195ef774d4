package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Property pins for the semantic-dedup / trending / token-budget batch —
  * local recomputes and structural invariants the DuckDB hash compare
  * cannot state.
  */
class Round8cOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, sf)

  // ---- dd_semdedup: verdicts equal a local brute-force recompute

  test("semdedup verdicts match a local recompute of assign + pair + keeper") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = vecs.filter(_._1 < 8)
    val assign = vecs.map { case (id, e) =>
      // max cosine, ties -> lowest cid (strict > keeps the earliest argmax)
      id -> cents.maxBy { case (cid, ce) => (cos(e, ce), -cid.toDouble) }._1
    }.toMap
    val byId = vecs.toMap
    val removed = vecs.flatMap { case (idB, eB) =>
      val hit = vecs.exists { case (idA, eA) =>
        idA < idB && assign(idA) == assign(idB) && cos(eA, eB) >= 0.35
      }
      if (hit) Some(idB) else None
    }.toSet
    assert(removed.nonEmpty, "test corpus has no semantic near-dups; pin is vacuous")
    val out = run("dd_semdedup").collect()
    assert(out.length == vecs.length, "one verdict row per vector")
    out.foreach { r =>
      val (id, cid, kept) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      assert(cid == assign(id), s"vector $id assigned to $cid, expected ${assign(id)}")
      assert(kept == !removed(id), s"vector $id kept=$kept, expected ${!removed(id)}")
    }
    assert(byId.keySet.filter(_ < 8).forall(id => !removed(id)),
      "a centroid seed can never be removed by a lower id outside its own cluster")
  }

  // ---- trending top-k: stream == batch, ranks well-formed, top-1 is the max

  test("trending top-k: batch and stream agree; ranks contiguous, counts sorted") {
    val batch = run("ev_topk_trending").collect().toSet
    val stream = run("ev_stream_topk").collect().toSet
    assert(batch == stream, "streamed counts + read-side rank must equal the batch top-k")
    batch.groupBy(_.getTimestamp(0)).foreach { case (h, rows) =>
      val sorted = rows.toSeq.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)) == (1 to sorted.length), s"$h ranks not contiguous")
      assert(sorted.size <= 3, s"$h returned more than k rows")
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a.getLong(2) >= b.getLong(2), s"$h counts not sorted")
        case _ => ()
      }
    }
    // top-1 per hour must be the true max count over raw events
    import org.apache.spark.sql.functions._
    val truth = graft.Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .count().groupBy("h").agg(max("count").as("m")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    batch.filter(_.getInt(3) == 1).foreach { r =>
      assert(r.getLong(2) == truth(r.getTimestamp(0)),
        s"rank-1 count is not the hour's max: $r")
    }
  }

  // ---- cu_token_budget: kept is exactly the greedy prefix of the quality order

  test("token budget keeps exactly the maximal prefix within budget") {
    val out = run("cu_token_budget").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    // verdicts must be a prefix of the (quality desc, doc_id) order
    val ordered = out.sortBy { case (id, q, _, _, _) => (-q, id) }
    val keptFlags = ordered.map(_._5)
    assert(keptFlags.takeWhile(identity).length == keptFlags.count(identity),
      "kept verdicts are not a prefix of the quality ranking")
    // running totals are consistent and the cut is boundary-exact
    var cum = 0L
    ordered.foreach { case (id, _, toks, cumTokens, kept) =>
      cum += toks
      assert(cum == cumTokens, s"doc $id running total mismatch")
      assert(kept == (cum <= 12000L), s"doc $id verdict disagrees with the budget rule")
    }
    val keptTokens = ordered.filter(_._5).map(_._3).sum
    val firstDropped = ordered.find(!_._5)
    assert(keptTokens <= 12000L)
    firstDropped.foreach { d =>
      assert(keptTokens + d._3 > 12000L,
        "a droppable boundary doc would still have fit: prefix not maximal")
    }
  }
}
