package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Baseline-sequential JPEG (r11 stretch ask #8): the generated zigzag
  * must BE the published T.81 scan, block-flat content must round-trip
  * bit-exact (the oracle fixtures' contract), arbitrary content within
  * the coefficient-rounding bound, and malformed input must fail loudly.
  */
class JpegSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int) =
    Codecs.GrayImage(w, h, Array.tabulate(w * h)(i => f(i / w, i % w)))

  private def rt(img: Codecs.GrayImage): Codecs.GrayImage =
    Codecs.decodeJpeg(Codecs.encodeJpeg(img))

  test("generated zigzag order matches the published T.81 scan (spot pins)") {
    val z = Codecs.ZigZag
    // first ten entries and the tail of the published table (row*8+col)
    assert(z.take(10).toSeq == Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    assert(z(63) == 63 && z(62) == 62 && z(61) == 55)
    assert(z.toSet == (0 until 64).toSet, "zigzag must be a permutation")
  }

  test("block-flat images round-trip BIT-EXACT through the lossy container") {
    // six blocks with distinct values including both extremes — the DC
    // prediction chain carries nonzero diffs across every block
    val vals = Array(0, 255, 128, 7, 200, 63)
    val img = gray(24, 16)((r, c) => vals((r / 8) * 3 + (c / 8)))
    val out = rt(img)
    assert(out.width == 24 && out.height == 16)
    assert(out.pixels.toSeq == img.pixels.toSeq,
      "flat blocks must decode bit-exact (exact integer DC through q=1)")
  }

  test("arbitrary content round-trips within the coefficient-rounding bound") {
    // deterministic pseudo-random pixels; with all-ones quant the only
    // loss is coefficient rounding (|err per coef| <= 0.5) — the measured
    // worst pixel error on this content is <= 2; pin a conservative 4
    val img = gray(16, 16)((r, c) => (r * 31 + c * 17 + (r * c * 13) % 97) % 256)
    val out = rt(img)
    val worst = img.pixels.zip(out.pixels).map { case (a, b) => math.abs(a - b) }.max
    assert(worst <= 4, s"roundtrip error $worst exceeds the rounding bound")
  }

  test("non-multiple-of-8 dims: edge-replicated padding, exact crop") {
    val flat = gray(10, 6)((_, _) => 99)
    val f = rt(flat)
    assert(f.width == 10 && f.height == 6 && f.pixels.forall(_ == 99))
    val img = gray(13, 9)((r, c) => (r * 29 + c * 41) % 256)
    val out = rt(img)
    assert(out.width == 13 && out.height == 9)
    val worst = img.pixels.zip(out.pixels).map { case (a, b) => math.abs(a - b) }.max
    assert(worst <= 4, s"cropped roundtrip error $worst")
  }

  test("entropy bytes are stuffed: some encoding contains 0xFF 0x00 and still decodes") {
    // scan a handful of deterministic contents for a stuffed pair inside
    // the entropy segment — proves the stuffing path runs, not just exists
    val found = (0 until 8).exists { s =>
      val img = gray(16, 16)((r, c) => (r * 37 + c * 11 + s * 53) % 256)
      val bytes = Codecs.encodeJpeg(img)
      Codecs.decodeJpeg(bytes) // must stay decodable
      bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0x00)
    }
    assert(found, "no encoding produced a stuffed 0xFF — the stuffing path is untested")
  }

  test("restart intervals: DRI + cycling RSTn round-trip, DC prediction resets per segment") {
    // 6 MCUs at interval 2 → RST0 after MCU 2, RST1 after MCU 4 (never
    // after the last); distinct block values make each segment's DC
    // prediction reset observable (a decoder that fails to reset prevDc
    // mis-decodes every block after the first marker)
    val vals = Array(0, 255, 128, 7, 200, 63)
    val img = gray(24, 16)((r, c) => vals((r / 8) * 3 + (c / 8)))
    val bytes = Codecs.encodeJpeg(img, restartInterval = 2)
    def count(m: Int) = bytes.sliding(2).count(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(count(0xdd) >= 1, "DRI segment missing")
    assert(count(0xd0) == 1 && count(0xd1) == 1 && count(0xd2) == 0,
      "RST markers must cycle and never trail the last MCU")
    val out = Codecs.decodeJpeg(bytes)
    assert(out.pixels.toSeq == img.pixels.toSeq,
      "restart-segmented flat blocks must stay bit-exact")
    // arbitrary content at interval 1 (a marker before every MCU but the first)
    val img2 = gray(16, 16)((r, c) => (r * 31 + c * 17 + (r * c * 13) % 97) % 256)
    val out2 = Codecs.decodeJpeg(Codecs.encodeJpeg(img2, restartInterval = 1))
    val worst = img2.pixels.zip(out2.pixels).map { case (a, b) => math.abs(a - b) }.max
    assert(worst <= 4, s"restart roundtrip error $worst")
  }

  test("a wrong restart index fails loudly (resynchronization is checked, not skipped)") {
    val img = gray(24, 8)((_, c) => c * 10)
    val bytes = Codecs.encodeJpeg(img, restartInterval = 1)
    // corrupt the FIRST restart marker's index (RST0 -> RST5)
    val i = bytes.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd0)
    assert(i > 0, "no RST0 found to corrupt")
    val bad = bytes.clone(); bad(i + 1) = 0xd5.toByte
    intercept[IllegalArgumentException](Codecs.decodeJpeg(bad))
  }

  test("malformed input fails loudly") {
    intercept[IllegalArgumentException](Codecs.decodeJpeg(Array[Byte](1, 2, 3)))
    val good = Codecs.encodeJpeg(gray(8, 8)((_, _) => 50))
    intercept[Exception](Codecs.decodeJpeg(good.take(good.length / 2)))
  }

  test("decodeImage dispatches on the JPEG magic") {
    val img = gray(8, 8)((r, c) => (r * 8 + c) / 8 * 32)
    val viaDispatch = Codecs.decodeImage(Codecs.encodeJpeg(img))
    assert(viaDispatch.width == 8 && viaDispatch.height == 8)
  }

  test("0xFF fill bytes before a header marker are skipped, not read as lengths (r12 advice)") {
    // T.81 B.1.1.2: any marker may be preceded by fill 0xFF bytes. Inject
    // fill between SOI and the first marker segment: the stream stays
    // conforming and must still decode to the same image.
    val img = gray(8, 8)((r, c) => ((r / 2) * 2 + (c / 4)) * 20)
    val bytes = Codecs.encodeJpeg(img)
    val padded = bytes.take(2) ++ Array.fill(3)(0xff.toByte) ++ bytes.drop(2)
    val out = Codecs.decodeJpeg(padded)
    assert(out.pixels.toSeq == Codecs.decodeJpeg(bytes).pixels.toSeq)
  }

  test("length-less standalone markers in headers fail with a NAMED error, not a garbage walk") {
    val bytes = Codecs.encodeJpeg(gray(8, 8)((_, _) => 77))
    def inject(m: Int): Array[Byte] =
      bytes.take(2) ++ Array(0xff.toByte, m.toByte) ++ bytes.drop(2)
    // TEM (0x01) and a stray RST0 (0xD0) carry no length field
    for (m <- Seq(0x01, 0xd0)) {
      val e = intercept[IllegalArgumentException](Codecs.decodeJpeg(inject(m)))
      assert(e.getMessage.contains("standalone marker"), s"0x$m%02x: ${e.getMessage}")
    }
    // a stray EOI before any scan names the real problem too
    val e2 = intercept[IllegalArgumentException](Codecs.decodeJpeg(inject(0xd9)))
    assert(e2.getMessage.contains("EOI before SOS"))
  }
}
