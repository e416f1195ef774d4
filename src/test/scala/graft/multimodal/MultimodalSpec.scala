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

  test("audio fingerprint: container-invariant and volume-invariant (r16, E157)") {
    import spark.implicits._
    val base = Array.tabulate(96)(i => ((i * 2654435761L) % 16384L - 8192L).toInt)
    // container invariance: the same PCM ripped to WAV and to FLAC must
    // fingerprint identically — the code is a property of the AUDIO
    val wav = Codecs.encodeWav(Codecs.PcmClip(8000, base))
    val flac = Codecs.encodeFlac(Codecs.PcmClip(8000, base))
    val media = Seq(MediaRecord(1L, "audio", wav), MediaRecord(2L, "audio", flac),
      MediaRecord(3L, "image", Array[Byte](1, 2, 3))).toDS()
    val h = audioFingerprint(media).collect().map(x => x.media_id -> x).toMap
    assert(!h.contains(3L)) // images are not audio-fingerprinted
    assert(h(1L).code == h(2L).code && h(1L).n_set == h(2L).n_set)
    assert(h(1L).n_set > 0 && h(1L).n_set < 56, "degenerate fingerprint")
    // volume invariance: scaling every sample x2 scales every band energy
    // x4 — delta SIGNS (the bits) are unchanged; raw energies would not be
    val loud = base.map(_ * 2)
    assert(audioFpBits(loud)._1 == audioFpBits(base)._1)
    // and the bits really are energy-ordering statements: reversing the
    // clip reverses the segment energy sequence — a different code (the
    // fingerprint hears structure, not just content)
    assert(audioFpBits(base.reverse)._1 != audioFpBits(base)._1)
  }

  test("audio dedup: bucket join lossless vs brute force; cross-container twins at Hamming 0 (r16, E158)") {
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.analytics.MultimodalQueries.audioDedup.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact brute-force baseline over the same codes: every Hamming ≤ 1
    // pair, found once — the multiprobe bucket join must equal it
    val codes = audioFingerprint(
      audioFpMedia(spark, graft.Tables.documents(spark, dir)))
      .collect().map(x => x.media_id -> x.code).sortBy(_._1)
    val brute = (for {
      (ia, ca) <- codes; (ib, cb) <- codes if ia < ib
      hm = java.lang.Long.bitCount(ca ^ cb) if hm <= 1
    } yield (ia, ib, hm.toLong)).toSet
    assert(pairs == brute, s"bucket join lost/invented pairs: ${pairs.diff(brute)} / ${brute.diff(pairs)}")
    // the by-construction twins (same recording, OTHER container) all meet
    // at Hamming 0 — found through two different entropy layers
    val twins = codes.map(_._1).filter(_ >= 1000000L)
    assert(twins.nonEmpty, "fixture staged no cross-container twins")
    twins.foreach { t =>
      assert(pairs.contains((t - 1000000L, t, 0L)),
        s"twin pair ($t) not found at Hamming 0")
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
