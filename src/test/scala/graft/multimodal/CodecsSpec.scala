package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import Codecs._

/** The codec proofs: exact on-disk layout against the published formats
  * (hand-computed reference bytes, not round-trip-only — a matching
  * encode/decode bug pair cannot hide), plus round-trip properties over
  * arbitrary dims (covering every row-padding residue) and the parser
  * features the fixtures exercise: bottom-up AND top-down BMP rows, RIFF
  * chunk walking with odd-size padding.
  */
class CodecsSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(100)
      .withInitialSeed(Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  // ---- BMP -------------------------------------------------------------

  test("encodeBmp emits the exact BITMAPFILEHEADER/INFOHEADER layout") {
    // 2x2 gray image, top-down pixels [a=10, b=20, c=30, d=40]
    val b = encodeBmp(GrayImage(2, 2, Array(10, 20, 30, 40)))
    // stride = ((2*3)+3)/4*4 = 8; file = 54 + 2*8 = 70
    assert(b.length == 70)
    assert(b(0) == 'B' && b(1) == 'M')
    def le32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    assert(le32(2) == 70)   // bfSize
    assert(le32(10) == 54)  // bfOffBits
    assert(le32(14) == 40)  // biSize
    assert(le32(18) == 2 && le32(22) == 2) // dims, positive height = bottom-up
    assert((b(28) & 0xff) == 24)           // bit depth
    assert(le32(30) == 0)                  // BI_RGB
    // bottom row (c, d) is stored FIRST, BGR triplets + 2 pad bytes
    assert(b.slice(54, 62).toSeq == Seq[Byte](30, 30, 30, 40, 40, 40, 0, 0))
    assert(b.slice(62, 70).toSeq == Seq[Byte](10, 10, 10, 20, 20, 20, 0, 0))
  }

  test("decodeBmp honors top-down rows (negative height) per the spec") {
    val img = GrayImage(3, 2, Array(1, 2, 3, 4, 5, 6))
    val b = encodeBmp(img)
    // rewrite height to -2 (LE i32) and reorder rows to top-down
    val stride = 12
    val flipped = b.clone()
    flipped(22) = (-2 & 0xff).toByte; flipped(23) = 0xff.toByte
    flipped(24) = 0xff.toByte; flipped(25) = 0xff.toByte
    System.arraycopy(b, 54 + stride, flipped, 54, stride)       // top row first
    System.arraycopy(b, 54, flipped, 54 + stride, stride)
    assert(decodeBmp(flipped).pixels.toSeq == img.pixels.toSeq)
  }

  test("BMP round-trip is lossless for every row-padding residue") {
    val gen = for {
      w <- Gen.choose(1, 9) // strides hit all residues of w*3 mod 4
      h <- Gen.choose(1, 7)
      px <- Gen.listOfN(w * h, Gen.choose(0, 255))
    } yield (w, h, px)
    check("bmp-roundtrip", Prop.forAll(gen) { case (w, h, px) =>
      val back = decodeBmp(encodeBmp(GrayImage(w, h, px.toArray)))
      back.width == w && back.height == h && back.pixels.toSeq == px
    })
  }

  test("decodeBmp rejects non-BMP and truncated payloads") {
    intercept[IllegalArgumentException] { decodeBmp(Array.fill[Byte](60)(0)) }
    val good = encodeBmp(GrayImage(4, 4, Array.fill(16)(7)))
    intercept[IllegalArgumentException] { decodeBmp(good.dropRight(5)) }
  }

  // ---- WAV -------------------------------------------------------------

  test("encodeWav emits the exact canonical RIFF/WAVE PCM layout") {
    val b = encodeWav(PcmClip(8000, Array(1, -1)))
    assert(b.length == 48) // 12 RIFF/WAVE + 24 fmt + 8 data hdr + 4 samples
    def tag(off: Int) = new String(b, off, 4, "US-ASCII")
    def le32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    assert(tag(0) == "RIFF" && le32(4) == 40 && tag(8) == "WAVE")
    assert(tag(12) == "fmt " && le32(16) == 16)
    assert(le16(20) == 1 && le16(22) == 1)        // PCM, mono
    assert(le32(24) == 8000 && le32(28) == 16000) // rate, byteRate
    assert(le16(32) == 2 && le16(34) == 16)       // blockAlign, bits
    assert(tag(36) == "data" && le32(40) == 4)
    // signed LITTLE-endian samples: 1 -> 01 00, -1 -> ff ff
    assert(b.slice(44, 48).toSeq == Seq[Byte](1, 0, -1, -1))
  }

  test("decodeWav walks unknown chunks, including odd-size padding") {
    val clip = PcmClip(8000, Array(100, -200, 32767, -32768))
    // JUNK chunk via the encoder
    assert(decodeWav(encodeWav(clip, junkChunk = true)).samples.toSeq ==
      clip.samples.toSeq)
    // hand-spliced ODD-size chunk (3 bytes -> 1 pad byte) before data
    val base = encodeWav(clip)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 36)                             // RIFF..fmt
    out.write("odd!".getBytes("US-ASCII")); out.write(Array[Byte](3, 0, 0, 0))
    out.write(Array[Byte](9, 9, 9, 0))                 // 3 payload + 1 pad
    out.write(base, 36, base.length - 36)              // data chunk
    val spliced = out.toByteArray
    // fix the RIFF size field (+12)
    val newSize = (base.length - 8) + 12
    spliced(4) = (newSize & 0xff).toByte
    spliced(5) = ((newSize >>> 8) & 0xff).toByte
    assert(decodeWav(spliced).samples.toSeq == clip.samples.toSeq)
    assert(decodeWav(spliced).sampleRate == 8000)
  }

  test("WAV round-trip is lossless across the full signed 16-bit range") {
    val gen = for {
      xs <- Gen.listOf(Gen.choose(-32768, 32767))
      junk <- Gen.oneOf(true, false)
    } yield (xs, junk)
    check("wav-roundtrip", Prop.forAll(gen) { case (xs, junk) =>
      val back = decodeWav(encodeWav(PcmClip(44100, xs.toArray), junk))
      back.sampleRate == 44100 && back.samples.toSeq == xs
    })
  }

  test("decodeWav rejects missing magic and missing chunks") {
    intercept[IllegalArgumentException] { decodeWav("RIFFxxxxNOPE".getBytes) }
    val noData = encodeWav(PcmClip(8000, Array(1))).take(36) // fmt only
    intercept[IllegalArgumentException] { decodeWav(noData) }
  }

  // ---- AVI -------------------------------------------------------------

  test("encodeAvi emits the exact RIFF(hdrl, movi, idx1) layout") {
    // 1x1 video, one frame, pixel 9: stride 4, frameBytes 4
    val b = encodeAvi(GrayVideo(1, 1, Array(Array(9))))
    def tag(off: Int) = new String(b, off, 4, "US-ASCII")
    def le32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    assert(b.length == 260)
    assert(tag(0) == "RIFF" && le32(4) == 252 && tag(8) == "AVI ")
    assert(tag(12) == "LIST" && le32(16) == 192 && tag(20) == "hdrl")
    assert(tag(24) == "avih" && le32(28) == 56)
    assert(le32(32) == 40000)            // µs per frame (25 fps)
    assert(le32(44) == 0x10)             // AVIF_HASINDEX
    assert(le32(48) == 1 && le32(56) == 1) // totalFrames, streams
    assert(le32(64) == 1 && le32(68) == 1) // dwWidth, dwHeight
    assert(tag(88) == "LIST" && le32(92) == 116 && tag(96) == "strl")
    assert(tag(100) == "strh" && le32(104) == 56)
    assert(tag(108) == "vids" && tag(112) == "DIB ")
    assert(le32(128) == 1 && le32(132) == 25) // dwScale/dwRate
    assert(le32(140) == 1)                    // dwLength (frames)
    assert(tag(164) == "strf" && le32(168) == 40)
    assert(le32(172) == 40 && le32(176) == 1 && le32(180) == 1) // BIH dims
    assert(le16(186) == 24 && le32(188) == 0) // bitCount, BI_RGB
    assert(tag(212) == "LIST" && le32(216) == 16 && tag(220) == "movi")
    assert(tag(224) == "00db" && le32(228) == 4)
    // BGR triplet of gray 9 + 1 stride pad byte
    assert(b.slice(232, 236).toSeq == Seq[Byte](9, 9, 9, 0))
    assert(tag(236) == "idx1" && le32(240) == 16)
    assert(tag(244) == "00db" && le32(248) == 0x10) // AVIIF_KEYFRAME
    assert(le32(252) == 4 && le32(256) == 4)        // offset from 'movi', length
  }

  test("decodeAvi walks JUNK + idx1 and flips bottom-up frame rows") {
    // 1x2 frames: top-down pixels [5, 200] must come back in that order
    // even though the DIB rows are stored bottom-up
    val v = GrayVideo(1, 2, Array(Array(5, 200), Array(7, 9)))
    for (junk <- Seq(false, true)) {
      val back = decodeAvi(encodeAvi(v, junkChunk = junk))
      assert(back.width == 1 && back.height == 2)
      assert(back.frames.map(_.toSeq).toSeq == v.frames.map(_.toSeq).toSeq)
    }
  }

  test("decodeAvi honors top-down frames (negative strf height) per the spec") {
    val v = GrayVideo(1, 2, Array(Array(5, 200)))
    val b = encodeAvi(v)
    // strf height i32 sits at 180 in the no-junk layout; rows are 4-byte
    // strides inside the single 00db chunk at 232
    val flipped = b.clone()
    flipped(180) = (-2 & 0xff).toByte; flipped(181) = 0xff.toByte
    flipped(182) = 0xff.toByte; flipped(183) = 0xff.toByte
    System.arraycopy(b, 236, flipped, 232, 4) // top row first now
    System.arraycopy(b, 232, flipped, 236, 4)
    assert(decodeAvi(flipped).frames.head.toSeq == Seq(5, 200))
  }

  test("AVI round-trip is lossless over dims, paddings and frame counts") {
    val gen = for {
      w <- Gen.choose(1, 6) // strides hit all residues of w*3 mod 4
      h <- Gen.choose(1, 4)
      n <- Gen.choose(1, 5)
      junk <- Gen.oneOf(true, false)
      px <- Gen.listOfN(w * h * n, Gen.choose(0, 255))
    } yield (w, h, n, junk, px)
    check("avi-roundtrip", Prop.forAll(gen) { case (w, h, n, junk, px) =>
      val frames = px.toArray.grouped(w * h).toArray
      val back = decodeAvi(encodeAvi(GrayVideo(w, h, frames), junk))
      back.width == w && back.height == h &&
        back.frames.map(_.toSeq).toSeq == frames.map(_.toSeq).toSeq
    })
  }

  test("decodeAvi rejects bad magic, truncation and header/frame-count drift") {
    intercept[IllegalArgumentException] { decodeAvi(Array.fill[Byte](60)(0)) }
    val good = encodeAvi(GrayVideo(2, 2, Array(Array(1, 2, 3, 4))))
    intercept[IllegalArgumentException] { decodeAvi(good.dropRight(5)) }
    // avih claims 2 frames, movi carries 1 → parsers must cross-check
    val drift = good.clone(); drift(48) = 2
    intercept[IllegalArgumentException] { decodeAvi(drift) }
  }

  // ---- MJPEG AVI (r15: compressed video by composition) -------------------

  private def flatFrame(bw: Int, bh: Int, blocks: Array[Int]): Array[Int] = {
    val w = bw * 8
    Array.tabulate(w * bh * 8)(i => blocks((i / w / 8) * bw + (i % w / 8)))
  }

  test("encodeAviMjpeg emits MJPG handler/compression and JPEG '00dc' chunks") {
    val frames = Array(
      encodeJpeg(GrayImage(8, 8, Array.fill(64)(77))),
      encodeJpeg(GrayImage(8, 8, Array.fill(64)(200))))
    val b = encodeAviMjpeg(8, 8, frames)
    def i32At(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    assert(new String(b, 0, 4, "US-ASCII") == "RIFF")
    // strh handler fourcc is 'MJPG' (hdrl layout fixed: RIFF 12 + LIST
    // hdrl 12 + avih 64 + LIST strl 12 = strh tag at 100, payload at 108)
    val strh = 108
    assert(new String(b, strh, 4, "US-ASCII") == "vids")
    assert(new String(b, strh + 4, 4, "US-ASCII") == "MJPG")
    // strf biCompression (offset 16 into the BITMAPINFOHEADER) is 'MJPG'
    val strf = strh + 56 + 8
    assert(new String(b, strf + 16, 4, "US-ASCII") == "MJPG")
    // each frame chunk is a complete JPEG: '00dc' header + SOI marker
    val body = new String(b.map(x => (x & 0xff).toChar))
    val first = body.indexOf("00dc")
    assert(first > 0 && (b(first + 8) & 0xff) == 0xff && (b(first + 9) & 0xff) == 0xd8)
  }

  test("MJPEG AVI round-trip is exact for block-flat frames (dims, counts, odd-size pads)") {
    val gen = for {
      bw <- Gen.choose(1, 3)
      bh <- Gen.choose(1, 2)
      n <- Gen.choose(1, 4)
      junk <- Gen.oneOf(true, false)
      blocks <- Gen.listOfN(n * bw * bh, Gen.choose(0, 255))
    } yield (bw, bh, n, junk, blocks.toArray)
    check("mjpeg-roundtrip", Prop.forAll(gen) { case (bw, bh, n, junk, blocks) =>
      val frames = Array.tabulate(n)(f => flatFrame(bw, bh,
        java.util.Arrays.copyOfRange(blocks, f * bw * bh, (f + 1) * bw * bh)))
      val jpegs = frames.map(px => encodeJpeg(GrayImage(bw * 8, bh * 8, px)))
      val back = decodeAviMjpeg(encodeAviMjpeg(bw * 8, bh * 8, jpegs, junk))
      back.width == bw * 8 && back.height == bh * 8 &&
        back.frames.map(_.toSeq).toSeq == frames.map(_.toSeq).toSeq
    })
  }

  test("decodeAviMjpeg rejects DIB containers, dim drift and frame-count drift") {
    // an uncompressed-DIB AVI is not MJPEG: biCompression gate
    val dib = encodeAvi(GrayVideo(2, 2, Array(Array(1, 2, 3, 4))))
    intercept[IllegalArgumentException] { decodeAviMjpeg(dib) }
    // and the MJPEG container refuses the DIB decoder symmetrically
    val jf = Array(encodeJpeg(GrayImage(8, 8, Array.fill(64)(128))))
    val good = encodeAviMjpeg(8, 8, jf)
    intercept[IllegalArgumentException] { decodeAvi(good) }
    // a frame whose decoded dims disagree with the container geometry
    val lied = encodeAviMjpeg(16, 8, jf)
    intercept[IllegalArgumentException] { decodeAviMjpeg(lied) }
    // avih frame-count drift cross-checks like the DIB path
    val drift = good.clone(); drift(48) = 2
    intercept[IllegalArgumentException] { decodeAviMjpeg(drift) }
    // truncation reaching INTO the frame chunk (past the 24-byte idx1
    // tail, which is walk-over territory a trailing cut legally removes)
    intercept[IllegalArgumentException] { decodeAviMjpeg(good.dropRight(30)) }
  }

  // ---- PNG ---------------------------------------------------------------

  test("encodePng emits the exact signature/IHDR layout (big-endian)") {
    val b = encodePng(GrayImage(2, 3, Array(10, 20, 30, 40, 50, 60)))
    assert((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
    assert(b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)
    def be32(off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    assert(be32(8) == 13) // IHDR length
    assert(new String(b, 12, 4, "US-ASCII") == "IHDR")
    assert(be32(16) == 2 && be32(20) == 3) // width, height — BIG-endian
    assert(b(24) == 8 && b(25) == 0)       // bit depth 8, grayscale
    assert(b(26) == 0 && b(27) == 0 && b(28) == 0) // methods
    assert(new String(b, b.length - 8, 4, "US-ASCII") == "IEND")
  }

  test("PNG round-trip is lossless over dims that exercise every filter and multi-IDAT") {
    val gen = for {
      w <- Gen.choose(1, 11)
      h <- Gen.choose(1, 9) // h ≥ 5 cycles through all five filter types
      px <- Gen.listOfN(w * h, Gen.choose(0, 255))
    } yield (w, h, px.toArray)
    check("png round-trip", Prop.forAll(gen) { case (w, h, px) =>
      val img = decodePng(encodePng(GrayImage(w, h, px)))
      img.width == w && img.height == h && img.pixels.sameElements(px)
    })
  }

  test("PNG and BMP round-trips agree through the dispatching decoder") {
    val px = Array.tabulate(8 * 5)(i => (i * 37 + 11) % 256)
    val viaPng = decodeImage(encodePng(GrayImage(8, 5, px)))
    val viaBmp = decodeImage(encodeBmp(GrayImage(8, 5, px)))
    assert(viaPng.pixels.sameElements(viaBmp.pixels))
    assert(viaPng.width == viaBmp.width && viaPng.height == viaBmp.height)
  }

  test("the zlib stream really splits across IDAT chunks and concatenates back") {
    val px = Array.tabulate(11 * 7)(i => (i * 73) % 256)
    val b = encodePng(GrayImage(11, 7, px), idatChunk = 5)
    val idats = Iterator.iterate(8) { off =>
      off + 12 + (((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff))
    }.takeWhile(_ < b.length - 4)
      .count(off => new String(b, off + 4, 4, "US-ASCII") == "IDAT")
    assert(idats > 3, s"expected a split zlib stream, got $idats IDAT chunk(s)")
    assert(decodePng(b).pixels.sameElements(px))
  }

  test("decodePng rejects CRC corruption, bad magic and truncation") {
    val good = encodePng(GrayImage(4, 4, Array.tabulate(16)(_ * 16)))
    intercept[IllegalArgumentException] { decodePng(Array.fill[Byte](20)(0)) }
    intercept[IllegalArgumentException] { decodePng(good.dropRight(6)) }
    // flip one pixel byte inside an IDAT payload: the chunk CRC must catch it
    val corrupt = good.clone()
    corrupt(37) = (corrupt(37) ^ 0x5a).toByte
    intercept[IllegalArgumentException] { decodePng(corrupt) }
  }

  test("16-BIT gray PNG round-trips the full 0-65535 range, plain and interlaced (r15)") {
    val gen = for {
      w <- Gen.choose(1, 9)
      h <- Gen.choose(1, 7)
      inter <- Gen.oneOf(true, false)
      px <- Gen.listOfN(w * h, Gen.choose(0, 65535))
    } yield (w, h, inter, px.toArray)
    check("png16 round-trip", Prop.forAll(gen) { case (w, h, inter, px) =>
      val (bw, bh, back) = decodePng16(encodePng16(w, h, px, interlaced = inter))
      bw == w && bh == h && back.sameElements(px)
    })
    // the container really declares bit depth 16 in the IHDR
    val b = encodePng16(2, 2, Array(0, 65535, 256, 255))
    assert(b(24) == 16)
  }

  test("16-bit and 8-bit gray PNG refuse each other's strict decoders (r15)") {
    val deep = encodePng16(3, 3, Array.tabulate(9)(_ * 7000))
    intercept[IllegalArgumentException] { decodePng(deep) }      // 8-bit view
    intercept[IllegalArgumentException] { decodePngRgb(deep) }   // byte planes
    val shallow = encodePng(GrayImage(3, 3, Array.tabulate(9)(_ * 20)))
    intercept[IllegalArgumentException] { decodePng16(shallow) }
  }

  test("decodePng rejects crafted huge-dims IHDR before allocating (r14 advice)") {
    // a VALID-CRC IHDR whose dims would overflow the Int scanline math or
    // demand an allocation the IDAT present cannot possibly inflate to
    // must reject cleanly — never NegativeArraySizeException / OOM
    def withDims(w: Int, h: Int): Array[Byte] = {
      val b = encodePng(GrayImage(4, 4, Array.tabulate(16)(_ * 16))).clone()
      def wbe32(off: Int, v: Int): Unit = {
        b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
        b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
      }
      wbe32(16, w); wbe32(20, h)
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 4 + 13) // chunk type + IHDR payload
      wbe32(29, crc.getValue.toInt)
      b
    }
    // Int overflow territory: (w+1)*h wraps negative without the Long gate
    val e1 = intercept[IllegalArgumentException] { decodePng(withDims(0x40000000, 4)) }
    assert(e1.getMessage.contains("implausible"))
    // Int-representable but far beyond zlib's max expansion of the tiny IDAT
    val e2 = intercept[IllegalArgumentException] { decodePng(withDims(100000, 100)) }
    assert(e2.getMessage.contains("implausible"))
  }

  // ---- FLAC (r14: compressed audio) --------------------------------------

  test("FLAC round-trip is bit-exact across subframe shapes (constant / ramp / noisy / short)") {
    val shapes = Seq(
      Array.fill(16)(1234),                       // CONSTANT subframe
      Array.tabulate(40)(i => -300 + 17 * i),     // linear ramp -> FIXED order >=1
      Array.tabulate(48)(i => ((i * 12347 + 911) % 65536) - 32768), // noisy -> escape path
      Array(7),                                   // single short block
      Array.tabulate(33)(i => if (i % 2 == 0) 32767 else -32768))   // extremes
    for (s <- shapes) {
      val clip = decodeFlac(encodeFlac(Codecs.PcmClip(8000, s)))
      assert(clip.sampleRate == 8000)
      assert(clip.samples.sameElements(s), s"FLAC roundtrip lost samples (n=${s.length})")
    }
  }

  test("FLAC multi-frame walk: block size 16 splits a 40-sample clip into 3 frames with a short tail") {
    val s = Array.tabulate(40)(i => (i * 991) % 30000 - 15000)
    val b = encodeFlac(Codecs.PcmClip(8000, s), blockSize = 16)
    // count frame syncs at byte positions (sync is byte-aligned by
    // construction: every frame ends CRC-16-aligned)
    val syncs = b.indices.count(i => i + 1 < b.length &&
      (b(i) & 0xff) == 0xff && (b(i + 1) & 0xfc) == 0xf8)
    assert(syncs == 3, s"expected 3 frames, saw $syncs syncs")
    assert(decodeFlac(b).samples.sameElements(s))
  }

  test("FLAC multi-byte UTF-8 frame numbers: a >128-frame stream round-trips") {
    // 2100 samples at block size 16 -> 132 frames; frames 128+ need the
    // 2-byte UTF-8 coding on the encode side (the decoder always spoke it)
    val s = Array.tabulate(2100)(i => (i * 131) % 40000 - 20000)
    assert(decodeFlac(encodeFlac(Codecs.PcmClip(8000, s))).samples.sameElements(s))
  }

  test("FLAC rejects an implausible STREAMINFO total-samples field cleanly") {
    val s = Array.tabulate(33)(i => (i * 4099) % 20000 - 10000)
    val good = encodeFlac(Codecs.PcmClip(8000, s))
    // STREAMINFO total-samples occupies the low 4 bits of byte 21 plus
    // bytes 22-25 (8 + 13 header/meta bytes in); blast byte 22 high —
    // STREAMINFO has no CRC, so only the plausibility bound can catch it
    // BEFORE a negative/multi-GB allocation
    val bad = good.clone(); bad(22) = 0x7f.toByte
    val ex = intercept[IllegalArgumentException] { decodeFlac(bad) }
    assert(ex.getMessage.contains("total-samples") || ex.getMessage.contains("MD5")
      || ex.getMessage.toLowerCase.contains("crc"))
  }

  test("corrupt FLAC subframe geometry rejects cleanly, never an array overrun (r14 review)") {
    // (a) FIXED order past the block: a 2-sample stream's subframe type
    // byte patched to FIXED-4 keeps a VALID CRC-8 (which covers only the
    // frame header), so only the order<=n guard stands between the
    // decoder and writing warmups past the block buffer
    val good = encodeFlac(Codecs.PcmClip(8000, Array(100, 200)))
    val subframeOff = 4 + 4 + 34 + 7 // magic + meta hdr + STREAMINFO + frame hdr
    val bad = good.clone()
    bad(subframeOff) = ((8 | 4) << 1).toByte
    val ex = intercept[IllegalArgumentException] { decodeFlac(bad) }
    assert(ex.getMessage.contains("FIXED order"), ex.getMessage)
    // (b) partition order that leaves the first partition smaller than
    // the warmup: hand-assemble the frame (blockSize 16, FIXED-4,
    // partition order 3 -> 8 partitions of 2 < order 4) — previously the
    // first count went NEGATIVE and later partitions overran the block
    val out = new java.io.ByteArrayOutputStream
    out.write("fLaC".getBytes("US-ASCII"))
    val info = new FlacBitWriter
    info.put(1, 1); info.put(0, 7); info.put(34, 24)
    info.put(16, 16); info.put(16, 16); info.put(0, 24); info.put(0, 24)
    info.put(8000, 20); info.put(0, 3); info.put(15, 5); info.put(16, 36)
    (0 until 16).foreach(_ => info.put(0, 8)) // MD5 never reached
    out.write(info.toBytes)
    val w = new FlacBitWriter
    w.put(0x3ffe, 14); w.put(0, 1); w.put(0, 1)
    w.put(6, 4); w.put(4, 4); w.put(0, 4); w.put(4, 3); w.put(0, 1)
    w.put(0, 8); w.put(15, 8) // frame 0, blockSize-1
    val head = w.toBytes
    w.put(crc8(head, 0, head.length).toLong, 8)
    w.put(0, 1); w.put(8 | 4, 6); w.put(0, 1) // FIXED order 4
    (0 until 4).foreach(i => w.put(100L + i, 16)) // warmups
    w.put(0, 2); w.put(3, 4) // Rice method, partition order 3
    (0 until 8).foreach(_ => w.put(0, 8)) // junk the walk never reaches
    out.write(w.toBytes)
    out.write(Array[Byte](0, 0)) // CRC-16 slot, never reached
    val ex2 = intercept[IllegalArgumentException] { decodeFlac(out.toByteArray) }
    assert(ex2.getMessage.contains("partition geometry"), ex2.getMessage)
  }

  test("FLAC rejects CRC-8, CRC-16, MD5 and magic corruption") {
    val s = Array.tabulate(33)(i => (i * 4099) % 20000 - 10000)
    val good = encodeFlac(Codecs.PcmClip(8000, s))
    intercept[IllegalArgumentException] { decodeFlac("flaC".getBytes ++ good.drop(4)) }
    intercept[IllegalArgumentException] { decodeFlac(good.dropRight(3)) }
    // STREAMINFO's MD5 field sits at bytes [26, 42): flipping it breaks no
    // frame CRC, so only the decoded-PCM MD5 check can catch it
    val badMd5 = good.clone(); badMd5(30) = (badMd5(30) ^ 0x5a).toByte
    val exMd5 = intercept[IllegalArgumentException] { decodeFlac(badMd5) }
    assert(exMd5.getMessage.contains("MD5"))
    // a flipped byte inside the first frame body trips CRC-8 or CRC-16
    val badFrame = good.clone(); badFrame(50) = (badFrame(50) ^ 0x5a).toByte
    val exFrame = intercept[IllegalArgumentException] { decodeFlac(badFrame) }
    assert(exFrame.getMessage.toLowerCase.contains("crc")
      || exFrame.getMessage.contains("sync") || exFrame.getMessage.contains("FLAC"))
  }

  test("FLAC SEEKTABLE: seek decode equals the full decode's frame, across targets and densities (r15)") {
    val s = Array.tabulate(77)(i => ((i * 2654435761L) % 65536L - 32768L).toInt)
    for (seekEvery <- Seq(1, 2, 3)) {
      val b = encodeFlac(PcmClip(8000, s), seekEvery = seekEvery)
      // the stream still FULL-decodes identically (seektable is walkable)
      assert(decodeFlac(b).samples.sameElements(s))
      for (target <- Seq(0L, 15L, 16L, 40L, 63L, 76L)) {
        val (first, px) = decodeFlacFrameAt(b, target)
        val k = (target / 16).toInt
        assert(first == 16L * k, s"seekEvery=$seekEvery target=$target")
        assert(px.sameElements(s.slice(16 * k, math.min(16 * k + 16, s.length))))
      }
    }
    // no seektable: degrades to sequential-from-start, same answer
    val plain = encodeFlac(PcmClip(8000, s))
    val (f2, px2) = decodeFlacFrameAt(plain, 40L)
    assert(f2 == 32L && px2.sameElements(s.slice(32, 48)))
    // out-of-range targets reject
    intercept[IllegalArgumentException] { decodeFlacFrameAt(plain, 77L) }
    intercept[IllegalArgumentException] { decodeFlacFrameAt(plain, -1L) }
  }

  test("FLAC seek decode really skips the frames before the seekpoint (corrupt-early-frame proof)") {
    val s = Array.tabulate(64)(i => ((i * 40503L) % 65536L - 32768L).toInt)
    val b = encodeFlac(PcmClip(8000, s), seekEvery = 1)
    // find the SECOND frame's offset from the seektable itself: corrupt a
    // byte inside frame 0's payload (after frame 1's header bytes begin is
    // too late; pick a byte strictly between frame 0's header and frame
    // 1's start). Frames start after the metadata: locate frame 1 via the
    // stream's own seektable by decoding its point table — simplest robust
    // route: corrupt the byte RIGHT BEFORE the last frame's landing area
    // by searching for the second 0xFFF8+ sync word.
    def syncAt(from: Int): Int = {
      var i = from
      while (i + 1 < b.length &&
        !((b(i) & 0xff) == 0xff && (b(i + 1) & 0xf8) == 0xf8)) i += 1
      i
    }
    val f0 = syncAt(42) // first frame sync (past fLaC + STREAMINFO + table)
    val f1 = syncAt(f0 + 2)
    require(f1 + 1 < b.length, "fixture must have a second frame")
    val corrupt = b.clone()
    corrupt(f0 + 6) = (corrupt(f0 + 6) ^ 0x35).toByte // inside frame 0
    // full decode walks frame 0 and rejects (CRC layers)
    intercept[Exception] { decodeFlac(corrupt) }
    // seek decode of a LATER frame lands on its seekpoint and never reads
    // frame 0 — it still succeeds and returns the exact samples
    val (first, px) = decodeFlacFrameAt(corrupt, 48L)
    assert(first == 48L && px.sameElements(s.slice(48, 64)))
    // but seeking INTO the corrupted frame itself rejects loudly
    intercept[Exception] { decodeFlacFrameAt(corrupt, 0L) }
  }

  test("24-BIT FLAC round-trips the full deep range; strict decoders refuse each other (r15)") {
    val shapes = Seq(
      Array.fill(20)(-8388608),                       // CONSTANT at the floor
      Array.tabulate(40)(i => -8000000 + 400000 * i), // ramp into the ceiling
      Array.tabulate(40)(i => ((i * 2654435761L) % 16777216L - 8388608L).toInt))
    shapes.foreach { s =>
      val back = decodeFlac24(encodeFlac24(PcmClip(8000, s)))
      assert(back.sampleRate == 8000 && back.samples.sameElements(s))
    }
    val deep = encodeFlac24(PcmClip(8000, Array.tabulate(20)(_ * 100000 - 1000000)))
    intercept[IllegalArgumentException] { decodeFlac(deep) }
    val shallow = encodeFlac(PcmClip(8000, Array.tabulate(20)(_ * 100 - 1000)))
    intercept[IllegalArgumentException] { decodeFlac24(shallow) }
    // the encoder refuses out-of-depth input outright
    intercept[IllegalArgumentException] { encodeFlac24(PcmClip(8000, Array(1 << 23))) }
  }

  test("24-BIT FLAC round-trip property over arbitrary deep clips (r15)") {
    val gen = for {
      n <- Gen.choose(1, 50)
      px <- Gen.listOfN(n, Gen.choose(-8388608, 8388607))
    } yield px.toArray
    check("flac24 round-trip", Prop.forAll(gen) { s =>
      decodeFlac24(encodeFlac24(PcmClip(8000, s))).samples.sameElements(s)
    })
  }

  test("STEREO FLAC round-trips exactly across channel-correlation regimes (r14: all four assignments)") {
    val n = 48
    val noise = Array.tabulate(n)(i => ((i * 12347 + 911) % 65536) - 32768)
    val smooth = Array.tabulate(n)(i => ((i + 2) * (i + 5)) % 3001 - 1500)
    val cases = Seq(
      (smooth, noise),                                  // uncorrelated -> independent
      (smooth, smooth.clone()),                         // identical -> side = 0
      (smooth, Array.tabulate(n)(i => -smooth(i))),     // anti-phase -> mid ~ 0
      (smooth, Array.tabulate(n)(i => smooth(i) - (i % 7 - 3))), // small side
      (Array(5), Array(-5)))                            // single short block
    for ((l, r) <- cases) {
      val c = decodeFlacStereo(encodeFlacStereo(Codecs.StereoClip(8000, l, r)))
      assert(c.left.sameElements(l) && c.right.sameElements(r),
        "stereo roundtrip lost samples")
    }
  }

  test("STEREO FLAC decorrelation really engages: correlated channels pick a side assignment and compress") {
    // identical channels: the side subframe is CONSTANT 0, so ANY side
    // assignment beats two independent copies — assert through the only
    // spec-level observable, the encoded size
    val n = 64
    val smooth = Array.tabulate(n)(i => ((i + 2) * (i + 5)) % 3001 - 1500)
    val noise = Array.tabulate(n)(i => ((i * 30011 + 17) % 65536) - 32768)
    val corr = encodeFlacStereo(Codecs.StereoClip(8000, noise, noise.clone())).length
    val indep = encodeFlacStereo(Codecs.StereoClip(8000, noise,
      noise.reverse)).length
    assert(corr < indep - n, // the whole second channel collapses to ~constant subframes
      s"correlated stereo ($corr B) did not compress vs uncorrelated ($indep B)")
    // and a mixed clip still roundtrips when every frame picks differently
    val l = smooth ++ noise
    val r = smooth.map(v => v - 1) ++ noise.reverse
    val c = decodeFlacStereo(encodeFlacStereo(Codecs.StereoClip(8000, l, r)))
    assert(c.left.sameElements(l) && c.right.sameElements(r))
  }

  test("LPC subframes win on resonant signals and round-trip bit-exact") {
    // a FAST sinusoid (w = 1 rad/sample): the FIXED family differentiates,
    // and |1-e^{-jw}|^4 ~ 0.85 leaves order-4 residuals near full scale —
    // while LPC-2 models the resonance (2cos(w)s[i-1] - s[i-2]) down to
    // coefficient-quantization noise. (A SLOW sinusoid is the opposite:
    // the 4th difference nearly vanishes and FIXED-4 rightfully wins.)
    val s = Array.tabulate(200)(i => math.round(12000 * math.sin(i * 1.0)).toInt)
    val blk = java.util.Arrays.copyOfRange(s, 0, 64)
    val (_, tpe, _) = planSubframe(blk, 16)
    assert((tpe & 0x20) != 0, s"expected an LPC subframe on a sinusoid, got type $tpe")
    assert(decodeFlac(encodeFlac(Codecs.PcmClip(8000, s), blockSize = 64))
      .samples.sameElements(s), "LPC roundtrip lost samples")
  }

  test("STEREO FLAC round-trip property over arbitrary channel pairs") {
    check("stereo flac roundtrip", Prop.forAll(
      Gen.chooseNum(1, 60).flatMap(n => for {
        l <- Gen.listOfN(n, Gen.chooseNum(-32768, 32767))
        r <- Gen.listOfN(n, Gen.chooseNum(-32768, 32767))
      } yield (l.toArray, r.toArray))) { case (l, r) =>
      val c = decodeFlacStereo(encodeFlacStereo(Codecs.StereoClip(8000, l, r)))
      c.left.sameElements(l) && c.right.sameElements(r)
    })
  }

  test("FLAC round-trip property over arbitrary 16-bit clips") {
    check("flac roundtrip", Prop.forAll(
      Gen.chooseNum(1, 80).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-32768, 32767)))) { xs =>
      val s = xs.toArray
      decodeFlac(encodeFlac(Codecs.PcmClip(8000, s))).samples.sameElements(s)
    })
  }

  // ---- color PNG (r14: truecolor + palette) ------------------------------

  test("TRUECOLOR PNG round-trip is lossless over dims that exercise every filter (bpp-3 rule)") {
    for ((w, h) <- Seq((3, 4), (5, 5), (8, 7), (1, 1))) {
      val n = w * h
      val r = Array.tabulate(n)(i => (i * 37 + 11) % 256)
      val g = Array.tabulate(n)(i => (i * 91 + 5) % 256)
      val b = Array.tabulate(n)(i => (i * 53 + 200) % 256)
      val img = decodePngRgb(encodePngRgb(RgbImage(w, h, r, g, b)))
      assert(img.width == w && img.height == h)
      assert(img.r.sameElements(r) && img.g.sameElements(g) && img.b.sameElements(b),
        s"truecolor roundtrip lost pixels at ${w}x$h")
    }
  }

  test("PALETTE PNG round-trip resolves indices through a CRC-guarded PLTE") {
    val w = 6; val h = 5
    val palette = Array(10, 20, 30, 200, 100, 0, 5, 5, 5, 255, 128, 64)
    val idx = Array.tabulate(w * h)(i => (i * 7) % 4)
    val b = encodePngPalette(w, h, idx, palette)
    val img = decodePngRgb(b)
    assert(idx.indices.forall { i =>
      img.r(i) == palette(3 * idx(i)) && img.g(i) == palette(3 * idx(i) + 1) &&
        img.b(i) == palette(3 * idx(i) + 2)
    }, "palette indirection broke")
    // PLTE corruption must be caught by ITS chunk CRC (the PLTE sits right
    // after the 25-byte IHDR chunk: its first color byte is at 8+25+8)
    val corrupt = b.clone()
    corrupt(8 + 25 + 8) = (corrupt(8 + 25 + 8) ^ 0x5a).toByte
    intercept[IllegalArgumentException] { decodePngRgb(corrupt) }
    // an index past the palette is rejected, not silently wrapped
    intercept[IllegalArgumentException] {
      encodePngPalette(2, 1, Array(0, 9), palette)
    }
  }

  test("RGBA and gray-alpha PNG round-trips carry the alpha plane (r14)") {
    val n = 5 * 4
    val r = Array.tabulate(n)(i => (i * 31) % 256)
    val g = Array.tabulate(n)(i => (i * 57 + 3) % 256)
    val b = Array.tabulate(n)(i => (i * 89 + 7) % 256)
    val a = Array.tabulate(n)(i => (i * 13 + 100) % 256)
    val img = decodePngRgba(encodePngRgba(RgbaImage(5, 4, r, g, b, a)))
    assert(img.r.sameElements(r) && img.g.sameElements(g)
      && img.b.sameElements(b) && img.a.sameElements(a))
    val ga = decodePngRgba(encodePngGrayAlpha(5, 4, r, a))
    assert(ga.r.sameElements(r) && ga.g.sameElements(r)
      && ga.b.sameElements(r) && ga.a.sameElements(a),
      "gray+alpha must replicate gray across RGB and keep alpha")
    // alpha-less containers report an opaque plane
    assert(decodePngRgba(encodePng(GrayImage(2, 2, Array(9, 8, 7, 6))))
      .a.forall(_ == 255))
  }

  test("Adam7 INTERLACED round-trips are lossless for every color type and empty-pass dims (r14)") {
    // dims below 8 leave whole passes empty; 9x10 exercises all seven
    for ((w, h) <- Seq((3, 4), (8, 5), (9, 10), (1, 1), (2, 3))) {
      val n = w * h
      val gray = Array.tabulate(n)(i => (i * 37 + 5) % 256)
      assert(decodePng(encodePng(GrayImage(w, h, gray), interlaced = true))
        .pixels.sameElements(gray), s"interlaced gray lost pixels at ${w}x$h")
      val r = Array.tabulate(n)(i => (i * 91) % 256)
      val g = Array.tabulate(n)(i => (i * 53 + 11) % 256)
      val b = Array.tabulate(n)(i => (i * 17 + 200) % 256)
      val img = decodePngRgb(encodePngRgb(RgbImage(w, h, r, g, b), interlaced = true))
      assert(img.r.sameElements(r) && img.g.sameElements(g) && img.b.sameElements(b),
        s"interlaced truecolor lost pixels at ${w}x$h")
      val a = Array.tabulate(n)(i => (i * 7 + 40) % 256)
      val rgba = decodePngRgba(encodePngRgba(RgbaImage(w, h, r, g, b, a), interlaced = true))
      assert(rgba.a.sameElements(a), s"interlaced RGBA lost alpha at ${w}x$h")
      val palette = Array(1, 2, 3, 200, 100, 0, 9, 9, 9)
      val idx = Array.tabulate(n)(i => i % 3)
      val pimg = decodePngRgb(encodePngPalette(w, h, idx, palette, interlaced = true))
      assert(idx.indices.forall(i => pimg.r(i) == palette(3 * idx(i))),
        s"interlaced palette lost indices at ${w}x$h")
    }
    // interlaced + non-interlaced encodings of the same pixels DECODE equal
    // but are different byte streams (the pass reorder is real)
    val px = Array.tabulate(48)(i => (i * 61) % 256)
    val plain = encodePng(GrayImage(8, 6, px))
    val inter = encodePng(GrayImage(8, 6, px), interlaced = true)
    assert(!plain.sameElements(inter))
    assert(decodePng(plain).pixels.sameElements(decodePng(inter).pixels))
  }

  test("color containers refuse the strict-gray decode; gray replicates through the RGB view") {
    val rgb = encodePngRgb(RgbImage(2, 2, Array(1, 2, 3, 4),
      Array(5, 6, 7, 8), Array(9, 10, 11, 12)))
    intercept[IllegalArgumentException] { decodePng(rgb) }
    val px = Array(40, 80, 120, 160)
    val viaRgb = decodePngRgb(encodePng(GrayImage(2, 2, px)))
    assert(viaRgb.r.sameElements(px) && viaRgb.g.sameElements(px)
      && viaRgb.b.sameElements(px))
  }

  // ---- r16 crafted-container hardening ---------------------------------

  test("FLAC: a stale/corrupt SEEKTABLE rejects instead of returning the wrong frame (r16)") {
    // 48 samples, blockSize 16 → frames 0,1,2; a point per frame.
    // Layout: fLaC(4) + STREAMINFO hdr(4)+34 + SEEKTABLE hdr(4) + 18/point
    val s = Array.tabulate(48)(i => ((i * 2654435761L) % 65536L - 32768L).toInt)
    val good = encodeFlac(PcmClip(8000, s), seekEvery = 1)
    val tableAt = 4 + 4 + 34 + 4
    def pointAt(k: Int): Int = tableAt + 18 * k
    // the SEEKTABLE is the one metadata block with NO CRC — both
    // corruptions below leave every other integrity layer green.
    // (a) stale byte offset: point 2 still claims sample 32 but its
    //     offset now targets frame 1 (copied from point 1) — the landing
    //     frame's CRC-8-protected coded number must veto the table
    val stale = good.clone()
    System.arraycopy(good, pointAt(1) + 8, stale, pointAt(2) + 8, 8)
    val exStale = intercept[IllegalArgumentException] { decodeFlacFrameAt(stale, 33L) }
    assert(exStale.getMessage.contains("SEEKTABLE"))
    // (a') unaligned sample number: a point claiming a mid-frame sample
    //     cannot name a frame boundary — named rejection
    val unaligned = good.clone()
    unaligned(pointAt(1) + 7) = 17.toByte
    assert(intercept[IllegalArgumentException] { decodeFlacFrameAt(unaligned, 17L) }
      .getMessage.contains("frame-aligned"))
    // (b) top-bit-set u64 byte offset reads negative in a signed Long:
    //     must reject as out-of-stream, not index the bit reader negative
    val neg = good.clone()
    neg(pointAt(1) + 8) = 0x80.toByte
    val exNeg = intercept[IllegalArgumentException] { decodeFlacFrameAt(neg, 16L) }
    assert(exNeg.getMessage.contains("seekpoint offset"))
  }

  test("FLAC: duplicated frame (valid CRCs, valid MD5) rejects on the frame-number walk (r16)") {
    // two IDENTICAL blocks → frames differ only in their coded frame
    // number (+CRCs). Splicing frame 0's bytes over frame 1's yields a
    // stream where EVERY per-frame CRC passes and the stream MD5 passes
    // (same samples!) — the sequential frame-number check is the only
    // layer that can see the duplication.
    val blk = Array.tabulate(16)(i => ((i * 40503L) % 65536L - 32768L).toInt)
    // seekEvery=1 so frame 1's offset comes from the stream's own
    // SEEKTABLE (deterministic — no sync-word heuristics over payload
    // bytes that could contain a false 0xFFF8 pattern)
    val b = encodeFlac(PcmClip(8000, blk ++ blk), seekEvery = 1)
    val tableAt = 4 + 4 + 34 + 4
    def be64(off: Int): Long = {
      var v = 0L; for (k <- 0 until 8) v = (v << 8) | (b(off + k) & 0xff); v
    }
    val framesAt = tableAt + 2 * 18
    val f0 = framesAt + be64(tableAt + 8).toInt
    val f1 = framesAt + be64(tableAt + 18 + 8).toInt
    val frameLen = f1 - f0
    assert(f1 + frameLen <= b.length, "fixture: identical blocks, equal frame sizes")
    val spliced = b.clone()
    System.arraycopy(b, f0, spliced, f1, frameLen)
    assert(decodeFlac(b).samples.sameElements(blk ++ blk)) // the original is fine
    val ex = intercept[IllegalArgumentException] { decodeFlac(spliced) }
    assert(ex.getMessage.contains("frame number"))
  }

  test("AVI: wrong frame-chunk id for the declared compression rejects with a CONTAINER error (r16)") {
    // '00db' (uncompressed DIB) inside an MJPG-declared stream
    val jp = encodeJpeg(GrayImage(8, 8, Array.fill(64)(99)))
    val mj = encodeAviMjpeg(8, 8, Array(jp))
    def retag(b: Array[Byte], from: String, to: String): Array[Byte] = {
      val out = b.clone()
      var i = 12 // past RIFF header; find the MOVI frame chunk tag
      var done = false
      while (!done && i + 4 <= out.length) {
        if (new String(out, i, 4, "US-ASCII") == from) {
          for (k <- 0 until 4) out(i + k) = to.charAt(k).toByte
          done = true
        } else i += 1
      }
      assert(done, s"fixture: no $from chunk found"); out
    }
    val exDb = intercept[IllegalArgumentException] {
      decodeAviMjpeg(retag(mj, "00dc", "00db")) }
    assert(exDb.getMessage.contains("uncompressed frame chunk"))
    // mirror: '00dc' (compressed) inside a BI_RGB-declared DIB stream
    val dib = encodeAvi(GrayVideo(4, 2, Array(Array.fill(8)(7))))
    val exDc = intercept[IllegalArgumentException] {
      decodeAvi(retag(dib, "00db", "00dc")) }
    assert(exDc.getMessage.contains("compressed frame chunk"))
  }

  test("crafted near-Int.MaxValue dims reject cleanly across BMP/AVI/JPEG (r16 dim-math sweep)") {
    def wle32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    // BMP: dims whose stride·h overflows Int would previously pass the
    // truncation check on garbage and crash in the row walk
    val bmp = encodeBmp(GrayImage(4, 4, Array.fill(16)(7)))
    val hugeBmp = bmp.clone()
    wle32(hugeBmp, 18, 0x20000000); wle32(hugeBmp, 22, 0x20000000)
    val exBmp = intercept[IllegalArgumentException] { decodeBmp(hugeBmp) }
    assert(exBmp.getMessage.contains("truncated BMP"))
    val negOff = bmp.clone(); wle32(negOff, 10, -8)
    assert(intercept[IllegalArgumentException] { decodeBmp(negOff) }
      .getMessage.contains("offset"))
    // AVI strf: same stride·h overflow class inside the container
    val avi = encodeAvi(GrayVideo(4, 2, Array(Array.fill(8)(7))))
    val hugeAvi = avi.clone()
    var i = 12
    var strfAt = -1
    while (strfAt < 0 && i + 4 <= hugeAvi.length) {
      if (new String(hugeAvi, i, 4, "US-ASCII") == "strf") strfAt = i
      i += 1
    }
    assert(strfAt > 0)
    wle32(hugeAvi, strfAt + 8 + 4, 0x30000000)  // biWidth
    wle32(hugeAvi, strfAt + 8 + 8, 1000)        // biHeight
    val exAvi = intercept[IllegalArgumentException] { decodeAvi(hugeAvi) }
    assert(exAvi.getMessage.contains("truncated AVI frame"))
    // JPEG SOF: u16 dims reach 2^32 pixels — past Int-indexable planes —
    // and a junk-payload stream cannot plausibly carry the blocks
    val jp = encodeJpeg(GrayImage(8, 8, Array.fill(64)(50)))
    def sofAt(b: Array[Byte]): Int = {
      var k = 2
      while (!((b(k) & 0xff) == 0xff && (b(k + 1) & 0xff) == 0xc0)) k += 1
      k + 4 // body: past marker + length
    }
    val huge = jp.clone()
    val body = sofAt(huge)
    huge(body + 1) = 0xff.toByte; huge(body + 2) = 0xff.toByte // h = 65535
    huge(body + 3) = 0xff.toByte; huge(body + 4) = 0xff.toByte // w = 65535
    assert(intercept[IllegalArgumentException] { decodeJpeg(huge) }
      .getMessage.contains("implausible JPEG dims"))
    // under Int.MaxValue pixels but implausible for a few-hundred-byte
    // payload: the ≥1-bit-per-block floor rejects it
    val big = jp.clone()
    val body2 = sofAt(big)
    big(body2 + 1) = 0x75.toByte; big(body2 + 2) = 0x30.toByte // h = 30000
    big(body2 + 3) = 0x75.toByte; big(body2 + 4) = 0x30.toByte // w = 30000
    assert(intercept[IllegalArgumentException] { decodeJpeg(big) }
      .getMessage.contains("implausible JPEG dims"))
  }
}
