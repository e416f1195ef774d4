package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WARC/WET crawl-archive record walk (r16, E162 — the E156 stretch): the
  * OTHER container web-scale text arrives in. A WET extract is a WARC
  * file (ISO 28500) of `conversion` records — per record a version line
  * (`WARC/1.0`), CRLF-separated named headers, a blank line, then exactly
  * `Content-Length` payload bytes, closed by two CRLFs — and crawl
  * tooling ships each record as its OWN gzip member, concatenated into
  * `*.warc.wet.gz` shards (the multi-member shape [[GzipJsonl.gunzip]]
  * already decompresses as one stream, per the gzip spec).
  *
  * Scale shape: identical to E156 — the shard is the parallelism unit
  * (gzip is not splittable, and WET members are not independently
  * addressable without an index), per-file task assignment via
  * `binaryFile`, zero shuffle until the caller aggregates.
  *
  * Failure posture: every structural defect — missing version magic, a
  * header line without a colon, missing/garbled Content-Length, a payload
  * running past the shard, a missing record separator — rejects with a
  * NAMED error carrying the shard name and record offset; nothing is
  * silently resynchronized (a walk that hunts for the next plausible
  * magic hides exactly the truncation it should report).
  */
object Warc {

  /** One parsed record: type, target URI, id, declared length, payload
    * (UTF-8 — WET conversion records are text by definition).
    */
  final case class WarcRecord(shard: String, warc_type: String,
      target_uri: String, record_id: String, content_length: Long,
      payload: String)

  private val Crlf = "\r\n".getBytes("US-ASCII")

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length && !(b(i) == Crlf(0) && b(i + 1) == Crlf(1))) i += 1
    require(i + 1 < b.length, "truncated WARC headers (no CRLF)")
    i
  }

  /** Walk one DECOMPRESSED WET/WARC byte stream into its records. */
  private[graft] def walkRecords(shard: String, bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    while (pos < bytes.length) {
      def fail(msg: String): Nothing = throw new IllegalArgumentException(
        s"malformed WARC shard $shard at byte $pos: $msg")
      // version line
      val vEnd = try lineEnd(bytes, pos) catch {
        case e: IllegalArgumentException => fail(e.getMessage)
      }
      val version = new String(bytes, pos, vEnd - pos, "US-ASCII")
      if (!(version == "WARC/1.0" || version == "WARC/1.1"))
        fail(s"expected WARC version line, saw '${version.take(20)}'")
      var p = vEnd + 2
      // named headers until the blank line; names are case-insensitive
      // per the spec — canonicalized to lower here
      var headers = Map.empty[String, String]
      var blank = false
      while (!blank) {
        val e = try lineEnd(bytes, p) catch {
          case ex: IllegalArgumentException => fail(ex.getMessage)
        }
        if (e == p) blank = true
        else {
          val line = new String(bytes, p, e - p, "UTF-8")
          val colon = line.indexOf(':')
          if (colon < 0) fail(s"header line without a colon: '${line.take(40)}'")
          headers += line.substring(0, colon).trim.toLowerCase ->
            line.substring(colon + 1).trim
        }
        p = e + 2
      }
      val len = headers.getOrElse("content-length", fail("missing Content-Length"))
      val n = try java.lang.Long.parseLong(len) catch {
        case _: NumberFormatException => fail(s"bad Content-Length '$len'")
      }
      if (n < 0 || p + n > bytes.length) fail(s"payload of $n bytes runs past the shard")
      val payload = new String(bytes, p, n.toInt, "UTF-8")
      p += n.toInt
      // the spec closes every record block with two CRLFs
      val sep = p + 4 <= bytes.length &&
        bytes(p) == Crlf(0) && bytes(p + 1) == Crlf(1) &&
        bytes(p + 2) == Crlf(0) && bytes(p + 3) == Crlf(1)
      if (!sep) fail("missing record separator (CRLF CRLF) after payload")
      p += 4
      out += WarcRecord(shard,
        headers.getOrElse("warc-type", fail("missing WARC-Type")),
        headers.getOrElse("warc-target-uri", ""),
        headers.getOrElse("warc-record-id", ""),
        n, payload)
      pos = p
    }
    out.result()
  }

  /** Read a directory of `*.warc.wet.gz` shards as parsed records —
    * per-shard gunzip (all members) + record walk in `mapPartitions`.
    */
  def readRecords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.wet.gz")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        walkRecords(shard, GzipJsonl.gunzip(shard, bytes)).iterator
      })
      .toDF()
  }

  /** Serialize one record block (version line, headers, blank line,
    * payload, double-CRLF close) — the fixture/export side.
    */
  private[graft] def recordBytes(warcType: String, targetUri: String,
      recordId: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    if (targetUri.nonEmpty) sb.append(s"WARC-Target-URI: $targetUri\r\n")
    sb.append(s"WARC-Record-ID: $recordId\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream
    out.write(head); out.write(payload); out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  /** Stage (doc_id, text) rows as `shards` WET files under `dir` — each
    * record its OWN gzip member (crawl tooling's shape: members
    * concatenate into one stream and remain individually produced), led
    * by a `warcinfo` member per shard exactly as real WET files are.
    */
  def writeWetShards(df: DataFrame, dir: String, shards: Int): Unit = {
    require(shards >= 1)
    val d = new java.io.File(dir)
    d.mkdirs()
    import df.sparkSession.implicits._
    df.select(col("doc_id"), col("text")).as[(Long, String)]
      .repartition(shards)
      .foreachPartition { (it: Iterator[(Long, String)]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val tmp = new java.io.File(d, f"part-$pid%05d.warc.wet.gz.tmp")
        val fo = new java.io.FileOutputStream(tmp)
        def member(b: Array[Byte]): Unit = {
          val gz = new java.util.zip.GZIPOutputStream(fo)
          gz.write(b); gz.finish()
        }
        try {
          member(recordBytes("warcinfo", "", s"<urn:graft:warcinfo:$pid>",
            "software: graft-wet-export\r\n".getBytes("UTF-8")))
          it.foreach { case (id, text) =>
            member(recordBytes("conversion", s"http://example.com/doc/$id",
              s"<urn:graft:$id>",
              Option(text).getOrElse("").getBytes("UTF-8")))
          }
        } finally fo.close()
        java.nio.file.Files.move(tmp.toPath,
          new java.io.File(d, f"part-$pid%05d.warc.wet.gz").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
  }
}
