package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Planted-corpus exactness for dd_incr_components: the update set must
  * contain exactly the batch docs plus the corpus docs whose component
  * label changed — covering the label-takeover path (a smaller batch id
  * becomes the component min, so every corpus member remaps) and the
  * no-change paths (untouched corpus components and singletons must NOT
  * be emitted; a batch doc joining without changing the min must not
  * touch the corpus rows).
  */
class IncrComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted corpus: update set is exactly batch rows + changed corpus rows") {
    import spark.implicits._
    val dir = new java.io.File(sys.props("java.io.tmpdir"), "graft_incrcomp_plant")
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmRf)
      f.delete(); ()
    }
    rmRf(dir); dir.mkdirs()
    def text(prefix: String): String = (1 to 12).map(i => s"$prefix$i").mkString(" ")
    val tA = text("alpha"); val tC = text("gamma")
    val docs = Seq(
      // corpus component {1, 2} (identical text => J = 1 pair)
      (1L, tA, "en", "s", 1L), (2L, tA, "en", "s", 1L),
      // untouched corpus singleton
      (6L, text("solo"), "en", "s", 1L),
      // untouched-by-min corpus component {11, 12}
      (11L, tC, "en", "s", 1L), (12L, tC, "en", "s", 1L),
      // batch: 0 and 5 join component {1,2}; 0 TAKES OVER as min label
      (0L, tA, "en", "s", 1L), (5L, tA, "en", "s", 1L),
      // batch singleton
      (10L, text("lone"), "en", "s", 1L),
      // batch doc joining {11,12} WITHOUT changing the min (15 > 11)
      (15L, tC, "en", "s", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.allDefs.find(_.name == "dd_incr_components").get
      .fn(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      // batch verdicts
      0L -> 0L, 5L -> 0L, 10L -> 10L, 15L -> 11L,
      // corpus docs remapped by the takeover — and ONLY those
      1L -> 0L, 2L -> 0L),
      s"update set diverges: $out")
    rmRf(dir)
  }
}
