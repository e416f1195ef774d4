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
