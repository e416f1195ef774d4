package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Span-level exact dedup (dd_span_dedup): semantics pinned on a planted
  * corpus — global first occurrence survives, intra-doc repeats drop, short
  * tails never participate, a full-width exact copy exits the corpus, and
  * an untouched doc's reassembly fingerprint equals md5(original text).
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 10-word spans; words chosen so no span collides by accident
  private def words(tag: String, n: Int): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  private val boiler = words("b", 10) // the repeated full-width span

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-spandedup").toFile
    d.deleteOnExit()
    val rows = Seq(
      // doc 1: boiler + own content + 3-word tail
      (1L, s"$boiler ${words("one", 10)} tail1 tail2 tail3"),
      // doc 2: boiler again (must drop) + own content
      (2L, s"$boiler ${words("two", 10)}"),
      // doc 3: intra-doc repetition — same span twice + distinct tail
      (3L, s"${words("three", 10)} ${words("three", 10)} t1 t2"),
      // doc 4: exact full-width copy of doc 2 → loses every span
      (4L, s"$boiler ${words("two", 10)}"),
      // doc 5: shares doc 1's short tail verbatim — tails never dedup
      (5L, s"${words("five", 10)} tail1 tail2 tail3"))
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    df.coalesce(1).write.mode("overwrite").parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private lazy val out =
    DedupQueries.spanDedup.fn(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("global first occurrence survives; later cross-doc occurrences drop") {
    // doc 1 keeps all 3 spans (boiler first seen here); doc 2 loses boiler
    assert(out(1L) == ((3L, 3L, md5Hex(s"$boiler ${words("one", 10)} tail1 tail2 tail3"))))
    val (n2, k2, fp2) = out(2L)
    assert(n2 == 2L && k2 == 1L && fp2 == md5Hex(words("two", 10)))
  }

  test("intra-doc repetition of a full-width span drops the second copy") {
    val (n3, k3, fp3) = out(3L)
    assert(n3 == 3L && k3 == 2L &&
      fp3 == md5Hex(s"${words("three", 10)} t1 t2"))
  }

  test("a full-width exact copy of an earlier doc exits the corpus") {
    assert(!out.contains(4L))
  }

  test("short tails are kept even when shared verbatim across docs") {
    val (n5, k5, fp5) = out(5L)
    assert(n5 == 2L && k5 == 2L &&
      fp5 == md5Hex(s"${words("five", 10)} tail1 tail2 tail3"))
  }

  test("result is invariant under input repartitioning (pure function)") {
    // the min-key first-occurrence rule is order-free by construction; a
    // differently-partitioned read must produce identical rows
    val again = DedupQueries.spanDedup.fn(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(again == out)
  }

  test("incremental variant: corpus spans drop, batch-first kept, tails survive") {
    val d = Files.createTempDirectory("graft-incrspan").toFile
    d.deleteOnExit()
    val rows = Seq(
      (1L, s"$boiler ${words("corp", 10)}"), // corpus (id % 5 != 0)
      // batch doc 10: boiler is a corpus span → drops; fresh + tail keep
      (10L, s"$boiler ${words("fresh", 10)} t1 t2"),
      // batch doc 15: repeats doc 10's fresh span → batch-first rule drops it
      (15L, s"${words("fresh", 10)} t3 t4"))
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"${d.getAbsolutePath}/documents.parquet")
    val out = DedupQueries.incrSpan.fn(spark, d.getAbsolutePath)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(!out.contains(1L), "corpus docs are not batch output")
    assert(out(10L) == ((3L, 2L, md5Hex(s"${words("fresh", 10)} t1 t2"))))
    assert(out(15L) == ((2L, 1L, md5Hex("t3 t4"))))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
