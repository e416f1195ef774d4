package graft.analytics

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Oracle coverage for the multimodal plumbing: the `mapPartitions` featurizer
  * runs over real binary columns on the Spark side; the oracle recomputes the
  * same features from the md5 hex string arithmetically. All outputs are
  * exact integers.
  */
object MultimodalQueries {

  private def hexVal(c: String): String = s"(strpos('0123456789abcdef', $c) - 1)"

  val byteHistogram: QueryDef = {
    val histSql = (0 until 16).map { j =>
      val d = java.lang.Integer.toHexString(j)
      s"len(list_filter(range(0, 16), i -> substr(md5(text), i*2+1, 1) = '$d')) AS h$d"
    }.mkString(",\n      |  ")
    QueryDef(
      "mm_byte_histogram",
      s"""SELECT doc_id AS media_id,
         |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  16 AS n_bytes,
         |  ${hexVal("substr(md5(text), 1, 1)")} * 16 + ${hexVal("substr(md5(text), 2, 1)")} AS width,
         |  ${hexVal("substr(md5(text), 3, 1)")} * 16 + ${hexVal("substr(md5(text), 4, 1)")} AS height,
         |  CASE WHEN doc_id % 3 = 2 THEN 4 ELSE 0 END AS n_frames,
         |  $histSql
         |FROM documents""".stripMargin) { (s, dir) =>
      val media = Multimodal.syntheticMedia(s, Tables.documents(s, dir))
      val feats = Multimodal.features(media)
      val histCols = (0 until 16).map(j =>
        col("histogram")(j).as(s"h${java.lang.Integer.toHexString(j)}"))
      feats.toDF().select(
        Seq(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"), col("n_frames")) ++ histCols: _*)
    }
  }

  /** Frame sampling through the mapPartitions demuxer shape: every 2nd
    * 4-byte frame of each video payload. The oracle recomputes the frames
    * as substrings of the md5 hex (frame i = hex chars [8i, 8i+8)).
    */
  val frameSample: QueryDef = QueryDef(
    "mm_frame_sample",
    """SELECT doc_id AS media_id, CAST(i AS INTEGER) AS frame_idx,
      |  substr(md5(text), CAST(i*8+1 AS INTEGER), 8) AS frame_hex
      |FROM documents, unnest([0, 2]) t(i)
      |WHERE doc_id % 3 = 2""".stripMargin) { (s, dir) =>
    val media = Multimodal.syntheticMedia(s, Tables.documents(s, dir))
    Multimodal.sampleFrames(media, frameBytes = 4, step = 2).toDF()
  }

  /** Per-frame audio energy through the one-to-many featurizer shape:
    * the 16-byte payload read as 8 big-endian signed 16-bit PCM samples,
    * framed 4 at a time → 2 frames, each frame's Σ sample² emitted as an
    * exact integer. The oracle recomputes every sample arithmetically
    * from the md5 hex (sample i = signed 16-bit from hex chars
    * [4i, 4i+4)) — byte-exact agreement or nothing.
    */
  val audioEnergy: QueryDef = {
    def sample(i: Int): String = {
      val raw = (0 until 4).map { j =>
        val shift = math.pow(16, 3 - j).toLong
        s"${hexVal(s"substr(md5(text), ${i * 4 + j + 1}, 1)")} * $shift"
      }.mkString(" + ")
      s"(CASE WHEN $raw >= 32768 THEN ($raw) - 65536 ELSE $raw END)"
    }
    def frameEnergySql(f: Int): String =
      (f * 4 until f * 4 + 4).map(i => s"${sample(i)} * ${sample(i)}").mkString(" + ")
    QueryDef(
      "mm_audio_energy",
      s"""SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
         |  CAST(CASE WHEN f = 0 THEN ${frameEnergySql(0)}
         |            ELSE ${frameEnergySql(1)} END AS BIGINT) AS energy
         |FROM documents, unnest([0, 1]) t(f)
         |WHERE doc_id % 3 = 1""".stripMargin) { (s, dir) =>
      val media = Multimodal.syntheticMedia(s, Tables.documents(s, dir))
      Multimodal.frameEnergy(media, samplesPerFrame = 4).toDF()
    }
  }

  /** Perceptual average-hash over image payloads — aHash, the image-dedup
    * bucketing fingerprint. Integer-only (bit = byte·n > Σbytes: no
    * division, no float mean), so the 16-bit code hash-matches the oracle's
    * arithmetic recomputation from the md5 hex bit for bit.
    */
  val avgHash: QueryDef = {
    def byteSql(i: Int): String =
      s"(${hexVal(s"substr(md5(text), ${2 * i + 1}, 1)")} * 16 + ${hexVal(s"substr(md5(text), ${2 * i + 2}, 1)")})"
    QueryDef(
      "mm_avg_hash",
      s"""WITH b AS (
         |  SELECT doc_id, [${(0 until 16).map(byteSql).mkString(", ")}] AS bt
         |  FROM documents WHERE doc_id % 3 = 0),
         |t AS (SELECT doc_id, bt, list_sum(bt) AS total FROM b)
         |SELECT doc_id AS media_id,
         |  CAST(list_sum([CASE WHEN bt[i+1]*16 > total THEN (CAST(1 AS BIGINT) << i)
         |                      ELSE CAST(0 AS BIGINT) END for i in range(0, 16)]) AS BIGINT) AS code,
         |  CAST(len(list_filter(range(0, 16), i -> bt[i+1]*16 > total)) AS INTEGER) AS n_set
         |FROM t""".stripMargin) { (s, dir) =>
      val media = Multimodal.syntheticMedia(s, Tables.documents(s, dir))
      Multimodal.avgHash(media).toDF()
    }
  }

  val defs: Seq[QueryDef] = Seq(byteHistogram, frameSample, audioEnergy, avgHash)
}
