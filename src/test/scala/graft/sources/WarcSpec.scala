package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** WARC/WET record-walk proofs (r16, E162): verbatim corpus recovery
  * through real per-record gzip members, warcinfo handling, and the
  * named-failure posture on every structural defect the walk can meet.
  */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("WET shards round-trip the documents table verbatim, warcinfo led and filtered") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val staged = java.nio.file.Files.createTempDirectory("graft_wet_spec").toString
    Warc.writeWetShards(docs, staged, shards = 4)
    val recs = Warc.readRecords(spark, staged)
    // one warcinfo leader per shard, every doc as a conversion record
    assert(recs.filter(col("warc_type") === "warcinfo").count() == 4)
    val got = recs.filter(col("warc_type") === "conversion")
      .select(regexp_extract(col("target_uri"), "doc/(\\d+)$", 1).cast("long"),
        col("payload"))
      .as[(Long, String)].collect().toSet
    val want = docs.as[(Long, String)].collect().toSet
    assert(got == want, "WET round-trip lost or altered records")
    // declared Content-Length is the payload's UTF-8 byte length
    val lens = recs.filter(col("warc_type") === "conversion")
      .select(col("content_length"),
        length(col("payload").cast("binary")).cast("long"))
      .as[(Long, Long)].collect()
    assert(lens.forall { case (a, b) => a == b })
  }

  test("every structural defect rejects with a NAMED error carrying shard + offset") {
    val rec = Warc.recordBytes("conversion", "http://example.com/doc/1",
      "<urn:graft:1>", "hello world".getBytes("UTF-8"))
    def mangle(f: Array[Byte] => Array[Byte]): IllegalArgumentException =
      intercept[IllegalArgumentException] { Warc.walkRecords("s.warc.wet.gz", f(rec.clone())) }
    // wrong magic
    assert(mangle { b => b(0) = 'X'; b }.getMessage.contains("version line"))
    // truncated payload: Content-Length says 11, stream ends early
    assert(mangle(b => java.util.Arrays.copyOf(b, b.length - 8))
      .getMessage.contains("runs past the shard"))
    // missing record separator
    assert(mangle(b => java.util.Arrays.copyOf(b, b.length - 2))
      .getMessage.contains("record separator"))
    // header line without a colon
    val noColon = new String(rec, "UTF-8").replace("WARC-Type:", "WARC-Type ")
      .getBytes("UTF-8")
    assert(intercept[IllegalArgumentException] {
      Warc.walkRecords("s", noColon) }.getMessage.contains("colon"))
    // garbled Content-Length
    val badLen = new String(rec, "UTF-8").replace("Content-Length: 11",
      "Content-Length: 1x").getBytes("UTF-8")
    assert(intercept[IllegalArgumentException] {
      Warc.walkRecords("s", badLen) }.getMessage.contains("Content-Length"))
    // every message names the shard
    assert(mangle { b => b(0) = 'X'; b }.getMessage.contains("s.warc.wet.gz"))
  }

  test("payloads containing CRLF CRLF do not split records (Content-Length framing, not scanning)") {
    val tricky = "a\r\n\r\nb — looks like a separator but is payload"
    val rec = Warc.recordBytes("conversion", "http://example.com/doc/9",
      "<urn:graft:9>", tricky.getBytes("UTF-8"))
    val got = Warc.walkRecords("t", rec)
    assert(got.size == 1 && got.head.payload == tricky)
  }
}
