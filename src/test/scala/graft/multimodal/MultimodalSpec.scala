package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import Multimodal._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("featurizer decodes binary content deterministically per partition") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, "image", Array[Byte](0x10, 0x20, 0x30)),
      MediaRecord(2L, "video", Array[Byte](0x7f, 0x00, 0x11, 0x22, 0x33)),
      MediaRecord(3L, "audio", Array.empty[Byte])).toDS().repartition(3)
    val f = features(media).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).width == 0x10 && f(1L).height == 0x20 && f(1L).n_bytes == 3)
    assert(f(1L).n_frames == 0) // not video
    assert(f(2L).n_frames == 2) // ceil(5/4)
    assert(f(2L).width == 0x7f && f(2L).height == 0)
    assert(f(3L).n_bytes == 0 && f(3L).histogram.sum == 0)
    // histogram counts high nibbles: 0x10,0x20,0x30 -> bins 1,2,3
    assert(f(1L).histogram(1) == 1 && f(1L).histogram(2) == 1 && f(1L).histogram(3) == 1)
  }

  test("average-hash thresholds strictly above the mean, images only") {
    import spark.implicits._
    val media = Seq(
      // bytes 10,10,10,10: mean 10, nothing STRICTLY above -> code 0
      MediaRecord(1L, "image", Array[Byte](10, 10, 10, 10)),
      // bytes 0,0,0,100: only index 3 above mean 25 -> code 8
      MediaRecord(2L, "image", Array[Byte](0, 0, 0, 100)),
      // audio is not hashed
      MediaRecord(3L, "audio", Array[Byte](1, 2, 3))).toDS()
    val h = avgHash(media).collect().map(x => x.media_id -> ((x.code, x.n_set))).toMap
    assert(h(1L) == ((0L, 0)))
    assert(h(2L) == ((8L, 1)))
    assert(!h.contains(3L))
  }

  test("frame sampling emits every step-th fixed-size frame of videos only") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, "video", (0 until 10).map(_.toByte).toArray), // 3 frames of 4
      MediaRecord(2L, "image", Array[Byte](1, 2, 3, 4))).toDS()
    val frames = sampleFrames(media, frameBytes = 4, step = 2).collect()
      .map(f => (f.media_id, f.frame_idx) -> f.frame_hex).toMap
    assert(frames.keySet == Set((1L, 0), (1L, 2))) // idx 1 skipped, image absent
    assert(frames((1L, 0)) == "00010203")
    assert(frames((1L, 2)) == "0809") // short tail frame
  }

  test("nearest-neighbor resize samples the BMP-decoded grid") {
    import spark.implicits._
    // 2x2 source image, row-major top-down [2,2,10,20], through a REAL BMP
    val bmp = Codecs.encodeBmp(Codecs.GrayImage(2, 2, Array(2, 2, 10, 20)))
    val media = Seq(MediaRecord(1L, "image", bmp)).toDS()
    val up = resize(media, 4, 4).head()
    assert(up.w == 4 && up.h == 4 && up.pixels.length == 16)
    // each source pixel expands to a 2x2 block
    assert(up.pixels.toSeq == Seq(
      2, 2, 2, 2,
      2, 2, 2, 2,
      10, 10, 20, 20,
      10, 10, 20, 20))
    val down = resize(media, 1, 1).head()
    assert(down.pixels.toSeq == Seq(2))
  }

  test("imageHash and imageStats recover features from real BMP fixtures") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = bmpMedia(spark, docs)
    val stats = imageStats(media).collect()
    assert(stats.nonEmpty)
    // every fixture's dims follow the generation law, pixels are bytes
    stats.foreach { s =>
      val m = s.media_id / 3
      assert(s.width == Array(3, 5, 8)((m % 3).toInt))
      assert(s.height == 4 + (m % 2).toInt)
      assert(s.n_px == s.width * s.height)
      assert(s.min_px >= 0 && s.max_px <= 255)
    }
    // the hash must agree with thresholding the seed chain directly: the
    // container round-trip (encode -> parse) is lossless
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val hashes = imageHash(media).collect().map(h => h.media_id -> h).toMap
    stats.take(5).foreach { s =>
      val px = Multimodal.md5Chain(texts(s.media_id), s.n_px)
      val n = px.length
      val total = px.map(_.toLong).sum
      val expect = px.zipWithIndex.collect {
        case (v, i) if v.toLong * n > total => 1L << i
      }.sum
      assert(hashes(s.media_id).code == expect)
    }
  }

  test("wavFrameEnergy decodes real WAV containers incl. JUNK chunks") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = wavMedia(spark, docs)
    val energies = wavFrameEnergy(media, samplesPerFrame = 4).collect()
      .groupBy(_.media_id)
    assert(energies.nonEmpty)
    energies.foreach { case (id, frames) =>
      val n = 7 + (id % 6).toInt
      assert(frames.length == (n + 3) / 4) // 7..12 samples -> 2..3 frames
    }
  }

  test("aviFrameSample demuxes real AVI containers frame-exactly") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = aviMedia(spark, docs)
    val frames = aviFrameSample(media, step = 2).collect().groupBy(_.media_id)
    assert(frames.nonEmpty)
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    frames.foreach { case (id, fs) =>
      val m = id / 3
      val wh = Array(3, 5)((m % 2).toInt) * (2 + (m % 2).toInt)
      val nf = 3 + (m % 3).toInt
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until nf by 2).toSeq)
      // decoded gray pixels must BE the seed chain bytes: the container
      // round-trip (encode → demux → row flip) is lossless
      val chain = Multimodal.md5Chain(texts(id), wh * nf)
      fs.foreach { f =>
        val want = chain.slice(wh * f.frame_idx, wh * (f.frame_idx + 1))
        assert(f.frame_hex == want.map("%02x".format(_)).mkString)
        assert(f.sum_px == want.map(_.toLong).sum)
      }
    }
  }

  test("synthetic media round-trips through binary parquet with metadata") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = syntheticMedia(spark, docs)
    val tmp = java.nio.file.Files.createTempDirectory("graft-mm").toString
    media.write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp).as[MediaRecord]
    assert(back.count() == docs.count())
    val sample = back.filter($"media_id" === 0L).head()
    assert(sample.content.length == 16) // md5 = 16 bytes
    assert(Set("image", "audio", "video").contains(sample.kind))
  }
}
