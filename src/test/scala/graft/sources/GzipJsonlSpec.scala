package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The compressed-text-container proofs (r16, E156): exact corpus
  * recovery through real gzip bytes, shard-level provenance, and the
  * named-failure posture on truncated/corrupted members — plus the
  * multi-member concatenation rule crawl tooling relies on.
  */
class GzipJsonlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def gz(lines: Seq[String]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream
    val out = new java.util.zip.GZIPOutputStream(bo)
    lines.foreach { l => out.write(l.getBytes("UTF-8")); out.write('\n') }
    out.close()
    bo.toByteArray
  }

  test("staged shards recover the documents table EXACTLY (round-trip through real gzip bytes)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "n_chars")
    val staged = java.nio.file.Files.createTempDirectory("graft_gz_spec").toString
    GzipJsonl.writeShards(docs, staged, shards = 8)
    assert(new java.io.File(staged).listFiles().count(_.getName.endsWith(".jsonl.gz")) == 8)
    val back = GzipJsonl.readLines(spark, staged)
      .select(from_json(col("line"),
        "doc_id BIGINT, text STRING, lang STRING, n_chars BIGINT",
        Map.empty[String, String]).as("d"))
      .select("d.*")
    val want = docs.as[(Long, String, String, Long)].collect().toSet
    val got = back.as[(Long, String, String, Long)].collect().toSet
    assert(got == want, "gzip JSONL round-trip lost or altered records")
    // provenance: line_no is dense 0..k-1 within every shard
    val byShard = GzipJsonl.readLines(spark, staged)
      .groupBy("shard").agg(count(lit(1)).as("n"), max("line_no").as("mx"),
        min("line_no").as("mn"))
      .collect()
    byShard.foreach { r =>
      assert(r.getLong(3) == 0L && r.getLong(2) == r.getLong(1) - 1,
        s"line_no not dense in ${r.getString(0)}")
    }
  }

  test("truncated and corrupted members fail LOUDLY with the shard named") {
    val good = gz(Seq("""{"a":1}""", """{"a":2}"""))
    // truncation: cut inside the deflate body
    val cut = java.util.Arrays.copyOf(good, good.length - 6)
    val exCut = intercept[IllegalArgumentException] {
      GzipJsonl.gunzipLines("shard-00.jsonl.gz", cut)
    }
    assert(exCut.getMessage.contains("shard-00"))
    // corruption: flip a byte mid-body — the member CRC32 catches it
    val bad = good.clone()
    bad(good.length / 2) = (bad(good.length / 2) ^ 0x41).toByte
    val exBad = intercept[IllegalArgumentException] {
      GzipJsonl.gunzipLines("shard-01.jsonl.gz", bad)
    }
    assert(exBad.getMessage.contains("corrupt gzip shard shard-01"))
  }

  test("concatenated gzip members decompress as ONE stream (the `cat a.gz b.gz` shape)") {
    val multi = gz(Seq("""{"a":1}""")) ++ gz(Seq("""{"a":2}""", """{"a":3}"""))
    assert(GzipJsonl.gunzipLines("m.jsonl.gz", multi) ==
      Seq("""{"a":1}""", """{"a":2}""", """{"a":3}"""))
  }

  test("empty shards and trailing newlines: zero records, no phantom empties") {
    assert(GzipJsonl.gunzipLines("e.jsonl.gz", gz(Nil)).isEmpty)
    // trailing newline terminates the last record, never opens a new one
    assert(GzipJsonl.gunzipLines("t.jsonl.gz", gz(Seq("""{"a":1}"""))).size == 1)
  }
}
