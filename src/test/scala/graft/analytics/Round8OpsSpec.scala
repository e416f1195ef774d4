package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.{SparkEntry, TestSpark}

/** Property pins for the round-8 operator batch — invariants the DuckDB
  * hash compare cannot state (conservation laws, planted-data exactness,
  * structural well-formedness of histories).
  */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.allDefs.find(_.name == name).get.fn(spark, sf)

  // ---- ev_scd2_history: the output must be a well-formed type-2 history

  test("scd2: exactly one open (is_current) version per user") {
    val rows = run("ev_scd2_history").collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, vs) =>
      assert(vs.count(_.getBoolean(5)) == 1, s"user $u open-version count != 1")
    }
  }

  test("scd2: versions are contiguous and ranges tile without gap or overlap") {
    val rows = run("ev_scd2_history").collect()
    rows.groupBy(_.getLong(0)).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getLong(4))
      assert(sorted.map(_.getLong(4)).toSeq == (1L to sorted.length).toSeq,
        s"user $u versions not contiguous")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // a's close-out must be exactly b's effective_from
          assert(a.getTimestamp(3) == b.getTimestamp(2),
            s"user $u: version ${a.getLong(4)} does not close at the next open")
        case _ => ()
      }
      // only the LAST version may be open
      assert(sorted.init.forall(!_.getBoolean(5)) && sorted.last.getBoolean(5))
      // consecutive versions must actually change state (change feed, not heartbeats)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(1) != b.getString(1),
          s"user $u: consecutive versions carry the same state")
        case _ => ()
      }
    }
  }

  // ---- ev_attribution: value conservation against the raw events table

  test("attribution conserves purchase count and value across channels") {
    import org.apache.spark.sql.functions._
    val out = run("ev_attribution").collect()
    val purchases = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)), graft.functions.Num.dsum(col("value"), 6))
      .collect()(0)
    assert(out.map(_.getLong(1)).sum == purchases.getLong(0),
      "attributed purchase count != total purchases")
    assert(math.abs(out.map(_.getDouble(2)).sum - purchases.getDouble(1)) < 1e-6,
      "attributed value != total purchase value")
    val channels = out.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("view", "click", "direct")), channels.toString)
  }

  // ---- ev_sliding_window: the overlap factor is exactly length/slide = 2

  test("sliding window: every event is counted in exactly 2 windows") {
    import org.apache.spark.sql.functions._
    val out = run("ev_sliding_window").collect()
    val nEvents = graft.Tables.events(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == 2 * nEvents,
      "hopping windows must double-count each event (length/slide = 2)")
    out.foreach { r =>
      // every real UTC offset is a multiple of 15 min, so slide alignment
      // is tz-representation-independent at a 5-min slide
      val ms = r.getTimestamp(0).getTime
      assert(math.floorMod(ms, 300000L) == 0, s"window start not slide-aligned: $r")
    }
  }

  // ---- a15_column_stats: internal consistency of the ANALYZE row set

  test("column stats are internally consistent") {
    val out = run("a15_column_stats").collect()
    assert(out.length == 5)
    val n = out.head.getLong(1)
    out.foreach { r =>
      assert(r.getLong(1) == n, "n_rows must be the table cardinality for every column")
      assert(r.getLong(3) <= n - r.getLong(2), s"ndv exceeds non-null count: $r")
      assert(r.getLong(3) >= 1 && r.getDouble(4) <= r.getDouble(5), s"degenerate stats: $r")
    }
  }

  // ---- dd_entity_match: refine step really is edit distance on the names

  test("entity match pairs verify under a local edit-distance recompute") {
    import org.apache.spark.sql.functions._
    val names = graft.Tables.customer(spark, sf)
      .select("c_custkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val out = run("dd_entity_match").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ka, kb, l) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(ka < kb, s"pair not canonicalized: $r")
      assert(lev(names(ka), names(kb)) == l && l <= 2,
        s"edit distance mismatch for $r")
    }
  }

  // ---- cu_ngram_decontaminate: planted-contamination exactness

  test("ngram decontamination flags exactly the planted collision") {
    import spark.implicits._
    val dir = new java.io.File(sys.props("java.io.tmpdir"), "graft_ngram_plant")
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmRf)
      f.delete(); ()
    }
    rmRf(dir); dir.mkdirs()
    val shared = "a b c d e f g h" // one exact 8-gram
    Seq(
      // eval doc (id % 50 == 0, < 1e6)
      (0L, s"$shared tail words here", "en", "src0", 1L),
      // corpus doc embedding the eval 8-gram → the ONE contamination
      (1L, s"prefix $shared suffix", "en", "src1", 1L),
      // corpus doc sharing only a 7-gram prefix of it → must NOT flag
      (2L, "a b c d e f g X y z", "en", "src2", 1L),
      // another eval doc with no collisions anywhere
      (50L, "p q r s t u v w x", "en", "src3", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.allDefs.find(_.name == "cu_ngram_decontaminate").get
      .fn(spark, dir.toString).collect()
    assert(out.toSeq == Seq(Row(0L, 1L, 1L)),
      s"expected exactly eval 0 contaminated by one doc/one gram, got ${out.toSeq}")
    rmRf(dir)
  }
}
