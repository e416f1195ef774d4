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

  /** Media near-dedup by perceptual hash — the image-dedup pipeline's
    * pair stage: aHash codes (mm_avg_hash's integer-exact fingerprint)
    * compared at Hamming distance ≤ 1 via the XOR-multiprobe bucket join
    * (ann_knn_join's blocking, applied to media): each code probes its
    * own bucket plus the 16 one-bit-flip buckets, so every qualifying
    * pair meets in EXACTLY one equi-bucket — Σ bucket² work, never
    * all-pairs, and no pair is found twice (hamming-0 meets at mask 0,
    * hamming-1 at the single differing bit's mask). Output is the
    * verified pair table (id_a, id_b, hamming) — dd_components' label
    * propagation collapses it to duplicate clusters exactly as it does
    * text near-dup pairs.
    *
    * Scale: one shuffle of the (media_id, code) projection on the bucket
    * key — 17 probe rows per media (bits+1, the multiprobe factor); the
    * verify predicate (bit_count of xor ≤ 1) is codegen'd integer ops.
    * A real deployment widens the code (pHash 64-bit) which SHRINKS
    * bucket occupancy; the plan is unchanged.
    */
  val mediaDedup: QueryDef = {
    def byteSql(i: Int): String =
      s"(${hexVal(s"substr(md5(text), ${2 * i + 1}, 1)")} * 16 + ${hexVal(s"substr(md5(text), ${2 * i + 2}, 1)")})"
    val masks = 0L +: (0 until 16).map(1L << _)
    QueryDef(
      "dd_media_dedup",
      s"""WITH b AS (
         |  SELECT doc_id, [${(0 until 16).map(byteSql).mkString(", ")}] AS bt
         |  FROM documents WHERE doc_id % 3 = 0),
         |t AS (SELECT doc_id, bt, list_sum(bt) AS total FROM b),
         |codes AS (
         |  SELECT doc_id AS media_id,
         |    CAST(list_sum([CASE WHEN bt[i+1]*16 > total THEN (CAST(1 AS BIGINT) << i)
         |                        ELSE CAST(0 AS BIGINT) END for i in range(0, 16)]) AS BIGINT) AS code
         |  FROM t),
         |probed AS (
         |  SELECT media_id, code, unnest([xor(code, m) for m in [${masks.mkString(", ")}]]) AS bucket
         |  FROM codes)
         |SELECT a.media_id AS id_a, c.media_id AS id_b,
         |  CAST(bit_count(xor(a.code, c.code)) AS BIGINT) AS hamming
         |FROM probed a JOIN codes c
         |  ON a.bucket = c.code AND a.media_id < c.media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.syntheticMedia(s, Tables.documents(s, dir))
      val codes = Multimodal.avgHash(media).toDF().select("media_id", "code")
      val maskCol = array(masks.map(lit): _*)
      val probed = codes.select(col("media_id"), col("code"),
        explode(transform(maskCol, m => col("code").bitwiseXOR(m))).as("bucket"))
      probed.as("a")
        .join(codes.as("c"),
          col("a.bucket") === col("c.code") && col("a.media_id") < col("c.media_id"))
        .select(col("a.media_id").as("id_a"), col("c.media_id").as("id_b"),
          bit_count(col("a.code").bitwiseXOR(col("c.code"))).cast("long").as("hamming"))
    }
  }

  val defs: Seq[QueryDef] = Seq(byteHistogram, frameSample, audioEnergy, avgHash,
    mediaDedup)
}
