package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, decoded/featurized via
  * `mapPartitions` over a typed Dataset.
  *
  * The DECODER is a deliberate stub — the real jpeg/wav/mp4 libraries are
  * not in this container — but everything Spark-side is real and tested:
  * the schema (binary + struct metadata), the typed Encoder boundary, the
  * per-partition batch shape (decode cost amortizes over an iterator, the
  * same shape a JNI/FFmpeg binding needs), and the partitioning story
  * (records are value-sized; repartition by id keeps binary volume even
  * across tasks). Swapping `StubDecoder` for a real codec changes no
  * plumbing.
  */
object Multimodal {

  /** One media record: opaque bytes + where they came from. */
  final case class MediaRecord(media_id: Long, kind: String, content: Array[Byte])

  /** Extracted features: stub header fields + a 16-bin byte histogram
    * (the real computation a featurizer does, minus the codec).
    */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int,
      histogram: Array[Int])

  /** Deterministic stand-in for the codec: header fields from leading
    * bytes, "frames" sampled every 4 bytes, histogram over high nibbles.
    */
  object StubDecoder {
    def decode(m: MediaRecord): MediaFeatures = {
      val b = m.content
      def u(i: Int): Int = if (i < b.length) b(i) & 0xff else 0
      val hist = new Array[Int](16)
      var i = 0
      while (i < b.length) { hist((b(i) & 0xf0) >>> 4) += 1; i += 1 }
      MediaFeatures(
        media_id = m.media_id, kind = m.kind, n_bytes = b.length,
        width = u(0), height = u(1),
        n_frames = if (m.kind == "video") (b.length + 3) / 4 else 0,
        histogram = hist)
    }
  }

  /** Featurize a media Dataset: per-partition batch decode. */
  def features(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(StubDecoder.decode))
  }

  /** One sampled frame: index within the payload + its bytes as hex. */
  final case class Frame(media_id: Long, frame_idx: Int, frame_hex: String)

  /** Frame sampling: every `step`-th fixed-size frame of each video
    * payload — the one-to-many mapPartitions shape a real demuxer binding
    * needs (iterator of records in, iterator of frames out, decode state
    * amortized per partition; no per-frame task or shuffle).
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int, step: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      val n = (m.content.length + frameBytes - 1) / frameBytes
      Iterator.range(0, n, step).map { i =>
        val from = i * frameBytes
        val until = math.min(from + frameBytes, m.content.length)
        Frame(m.media_id, i,
          m.content.slice(from, until).map("%02x".format(_)).mkString)
      }
    })
  }

  /** One audio frame's energy: frame index + exact sum of squared
    * samples. Integer output — nothing to drift cross-engine.
    */
  final case class FrameEnergy(media_id: Long, frame_idx: Int, energy: Long)

  /** Per-frame audio energy: interpret the payload as big-endian signed
    * 16-bit PCM, frame it `samplesPerFrame` at a time, and emit each
    * frame's Σ sample² — the feature a VAD / loudness filter computes.
    * The sample interpretation is pure byte arithmetic (no codec): a real
    * wav/flac binding swaps the byte source, the framing loop and the
    * one-to-many mapPartitions shape stay. Exact integer energies.
    */
  def frameEnergy(media: Dataset[MediaRecord], samplesPerFrame: Int): Dataset[FrameEnergy] = {
    import media.sparkSession.implicits._
    require(samplesPerFrame > 0)
    media.filter(_.kind == "audio").mapPartitions(_.flatMap { m =>
      val b = m.content
      val nSamples = b.length / 2 // trailing odd byte ignored (incomplete sample)
      val nFrames = (nSamples + samplesPerFrame - 1) / samplesPerFrame
      Iterator.range(0, nFrames).map { f =>
        var e = 0L
        var i = f * samplesPerFrame
        val end = math.min(i + samplesPerFrame, nSamples)
        while (i < end) {
          val v = ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff)
          val s = if (v >= 32768) v - 65536 else v
          e += s.toLong * s
          i += 1
        }
        FrameEnergy(m.media_id, f, e)
      }
    })
  }

  /** Average-hash perceptual fingerprint: code bit i set iff byte i is
    * strictly above the payload mean. */
  final case class AvgHash(media_id: Long, code: Long, n_set: Int)

  /** Perceptual average-hash over image payloads — the dedup fingerprint
    * image pipelines bucket on (aHash; pHash swaps the mean for a DCT and
    * keeps this exact shape). INTEGER-ONLY by construction: the
    * above-mean test is `byte·n > Σbytes` (no division, no float mean),
    * so the 16-bit code is bit-identical everywhere. A real codec decodes
    * and downsamples to the fixed grid first; the thresholding loop and
    * the mapPartitions shape stay.
    */
  def avgHash(media: Dataset[MediaRecord]): Dataset[AvgHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions(_.map { m =>
      val b = m.content.map(_ & 0xff)
      val n = b.length
      var total = 0L
      var i = 0
      while (i < n) { total += b(i); i += 1 }
      var code = 0L
      var nset = 0
      i = 0
      while (i < n && i < 64) {
        if (b(i).toLong * n > total) { code |= (1L << i); nset += 1 }
        i += 1
      }
      AvgHash(m.media_id, code, nset)
    })
  }

  /** A resized "image": target dims + the resampled bytes. */
  final case class Resized(media_id: Long, w: Int, h: Int, pixels: Array[Byte])

  /** Nearest-neighbor resize of the stub image grid (payload bytes in
    * row-major order, source dims from the decoded header, out-of-range
    * reads as 0 — exactly the padding rule StubDecoder uses). Pure byte
    * arithmetic: a real codec swaps the pixel access, the sampling loop
    * and the mapPartitions shape stay.
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[Resized] = {
    import media.sparkSession.implicits._
    require(w > 0 && h > 0)
    media.filter(_.kind == "image").mapPartitions(_.map { m =>
      val f = StubDecoder.decode(m)
      val srcW = math.max(f.width, 1)
      val srcH = math.max(f.height, 1)
      val out = new Array[Byte](w * h)
      var r = 0
      while (r < h) {
        val sr = r * srcH / h
        var c = 0
        while (c < w) {
          val sc = c * srcW / w
          val idx = sr * srcW + sc
          out(r * w + c) = if (idx < m.content.length) m.content(idx) else 0
          c += 1
        }
        r += 1
      }
      Resized(m.media_id, w, h, out)
    })
  }

  /** Build a deterministic synthetic media table from `documents`
    * (content = md5 bytes of the text; kind round-robins by doc_id) —
    * stands in for a real binary column until one exists in the data.
    */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        unhex(md5(col("text"))).as("content"))
      .as[MediaRecord]
  }
}
