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

  // ---- COLOR 4:2:0 (r13, E134) -------------------------------------------

  /** Planar fixture: block-flat planes (luma bw×bh blocks of 16×16-MCU
    * geometry, chroma at quarter res), values chosen per block.
    */
  private def ycc(mw: Int, mh: Int)(yv: Int => Int, cbv: Int => Int,
      crv: Int => Int): Codecs.YccImage = {
    val w = 16 * mw; val h = 16 * mh; val cw = 8 * mw; val ch = 8 * mh
    Codecs.YccImage(w, h,
      Array.tabulate(w * h)(i => yv((i / w / 8) * (2 * mw) + (i % w / 8))),
      Array.tabulate(cw * ch)(i => cbv((i / cw / 8) * mw + (i % cw / 8))),
      Array.tabulate(cw * ch)(i => crv((i / cw / 8) * mw + (i % cw / 8))))
  }

  test("COLOR: block-flat planes round-trip BIT-EXACT through the interleaved 4:2:0 container") {
    val img = ycc(2, 3)(b => (b * 17 + 3) % 256, b => (b * 31 + 80) % 256,
      b => (b * 53 + 11) % 256)
    val out = Codecs.decodeJpegYcc(Codecs.encodeJpegYcc(img))
    assert(out.width == img.width && out.height == img.height)
    assert(out.y.toSeq == img.y.toSeq, "luma plane drifted")
    assert(out.cb.toSeq == img.cb.toSeq, "Cb plane drifted")
    assert(out.cr.toSeq == img.cr.toSeq, "Cr plane drifted")
  }

  test("COLOR: arbitrary planes round-trip within the coefficient-rounding bound") {
    val rnd = new scala.util.Random(7L)
    val w = 32; val h = 16
    val img = Codecs.YccImage(w, h,
      Array.fill(w * h)(rnd.nextInt(256)),
      Array.fill((w / 2) * (h / 2))(rnd.nextInt(256)),
      Array.fill((w / 2) * (h / 2))(rnd.nextInt(256)))
    val out = Codecs.decodeJpegYcc(Codecs.encodeJpegYcc(img))
    def maxErr(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.max
    assert(maxErr(out.y, img.y) <= 4 && maxErr(out.cb, img.cb) <= 4 &&
      maxErr(out.cr, img.cr) <= 4)
  }

  test("COLOR: restart intervals reset ALL THREE DC predictors; wrong index fails loudly") {
    val img = ycc(2, 2)(b => 10 + b * 16, b => 200 - b * 15, b => 60 + b * 9)
    val bytes = Codecs.encodeJpegYcc(img, restartInterval = 1)
    assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0
      && (p(1) & 0xff) <= 0xd7), "no RSTn emitted at interval 1")
    val out = Codecs.decodeJpegYcc(bytes)
    assert(out.y.toSeq == img.y.toSeq && out.cb.toSeq == img.cb.toSeq &&
      out.cr.toSeq == img.cr.toSeq)
    // corrupt the first restart marker's index: resync must be CHECKED
    val i = bytes.indices.dropWhile(j => j < 2 || !(
      (bytes(j) & 0xff) == 0xff && (bytes(j + 1) & 0xff) >= 0xd0 &&
        (bytes(j + 1) & 0xff) <= 0xd7)).head
    val bad = bytes.clone()
    bad(i + 1) = (0xd0 | (((bad(i + 1) & 0x07) + 3) % 8)).toByte
    intercept[IllegalArgumentException](Codecs.decodeJpegYcc(bad))
  }

  test("COLOR: non-multiple-of-16 dims pad by edge replication and crop exactly") {
    val w = 20; val h = 12 // 2×1 MCUs, right/bottom partial
    val img = Codecs.YccImage(w, h,
      Array.tabulate(w * h)(i => (i * 7) % 256 / 16 * 16),
      Array.tabulate(10 * 6)(i => 90), Array.tabulate(10 * 6)(i => 160))
    val out = Codecs.decodeJpegYcc(Codecs.encodeJpegYcc(img))
    assert(out.width == w && out.height == h && out.cb.length == 10 * 6)
    assert(out.cb.toSeq == img.cb.toSeq && out.cr.toSeq == img.cr.toSeq)
    val maxErr = out.y.zip(img.y).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 4, s"partial-MCU luma drifted by $maxErr")
  }

  test("COLOR: rgb→ycc420→rgb is bounded-lossy; the codec in between is exact") {
    val rnd = new scala.util.Random(13L)
    val w = 16; val h = 16
    // smooth-ish content (chroma subsampling on noise is unboundedly lossy
    // by design; the bound claim is for the conversion+rounding path)
    val r = Array.tabulate(w * h)(i => 40 + (i / w) * 8)
    val g = Array.tabulate(w * h)(i => 200 - (i % w) * 6)
    val b = Array.tabulate(w * h)(i => 30 + ((i / w) + (i % w)) * 4)
    val planes = Codecs.rgbToYcc420(w, h, r, g, b)
    val rt = Codecs.decodeJpegYcc(Codecs.encodeJpegYcc(planes))
    val (r2, g2, b2) = Codecs.yccToRgb(rt)
    def maxErr(a: Array[Int], c: Array[Int]): Int =
      a.zip(c).map { case (x, y) => math.abs(x - y) }.max
    val e = Seq(maxErr(r, r2), maxErr(g, g2), maxErr(b, b2)).max
    assert(e <= 24, s"RGB round-trip error $e exceeds the smooth-content bound")
    assert(rnd.nextInt(2) >= 0) // keep rnd referenced (seed documents intent)
  }

  test("COLOR: component-shape dispatch fails loudly both ways") {
    val gray8 = Codecs.encodeJpeg(gray(8, 8)((_, _) => 90))
    val color = Codecs.encodeJpegYcc(ycc(1, 1)(_ => 50, _ => 128, _ => 128))
    val e1 = intercept[IllegalArgumentException](Codecs.decodeJpegYcc(gray8))
    assert(e1.getMessage.contains("3-component"))
    val e2 = intercept[IllegalArgumentException](Codecs.decodeJpeg(color))
    assert(e2.getMessage.contains("grayscale expected"))
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

  // ---- 4:4:4 (r15: the unsubsampled-chroma corner) -------------------------

  private def ycc444(w: Int, h: Int)(f: (Int, Int, Int) => Int) =
    Codecs.Ycc444Image(w, h,
      Array.tabulate(w * h)(i => f(0, i / w, i % w)),
      Array.tabulate(w * h)(i => f(1, i / w, i % w)),
      Array.tabulate(w * h)(i => f(2, i / w, i % w)))

  test("444: block-flat planes round-trip BIT-EXACT; full-resolution chroma is real") {
    // per-plane 8x8-flat blocks with DIFFERENT values per plane: any
    // cross-plane interleave slip or hidden chroma subsample mismatches
    val img = ycc444(24, 16)((c, r, col) => 20 + 40 * c + 16 * (r / 8) + 4 * (col / 8))
    val back = Codecs.decodeJpegYcc444(Codecs.encodeJpegYcc444(img))
    assert(back.width == 24 && back.height == 16)
    assert(back.y.sameElements(img.y) && back.cb.sameElements(img.cb)
      && back.cr.sameElements(img.cr))
    // chroma really is full resolution: a 4:2:0 roundtrip of the same
    // content stores quarter-res chroma (different plane sizes)
    assert(back.cb.length == 24 * 16)
  }

  test("444: arbitrary planes round-trip within the coefficient-rounding bound") {
    val img = ycc444(13, 11)((c, r, col) => (r * 31 + col * 17 + c * 71) % 256)
    val back = Codecs.decodeJpegYcc444(Codecs.encodeJpegYcc444(img))
    for ((a, b) <- Seq((img.y, back.y), (img.cb, back.cb), (img.cr, back.cr)))
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) <= 2) }
  }

  test("444: restart intervals reset all three predictors; sampling dispatch fails loudly both ways") {
    val img = ycc444(32, 8)((c, r, col) => 10 + 50 * c + 5 * (col / 8))
    val withRst = Codecs.encodeJpegYcc444(img, restartInterval = 2)
    assert(withRst.containsSlice(Array(0xff.toByte, 0xd0.toByte)))
    val back = Codecs.decodeJpegYcc444(withRst)
    assert(back.y.sameElements(img.y) && back.cr.sameElements(img.cr))
    // a 4:4:4 stream through the 4:2:0 decoder (and vice versa) names it
    val e1 = intercept[IllegalArgumentException](
      Codecs.decodeJpegYcc(Codecs.encodeJpegYcc444(img)))
    assert(e1.getMessage.contains("4:2:0"))
    val ycc420 = Codecs.YccImage(16, 16, Array.fill(256)(99),
      Array.fill(64)(12), Array.fill(64)(200))
    val e2 = intercept[IllegalArgumentException](
      Codecs.decodeJpegYcc444(Codecs.encodeJpegYcc(ycc420)))
    assert(e2.getMessage.contains("4:4:4"))
  }

  private def ycc422(w: Int, h: Int)(f: (Int, Int, Int) => Int): Codecs.Ycc422Image = {
    val cw = (w + 1) / 2
    Codecs.Ycc422Image(w, h,
      Array.tabulate(w * h)(i => f(0, i / w, i % w)),
      Array.tabulate(cw * h)(i => f(1, i / cw, i % cw)),
      Array.tabulate(cw * h)(i => f(2, i / cw, i % cw)))
  }

  test("422: block-flat planes round-trip BIT-EXACT; chroma is half-width, full-height (r16)") {
    val img = ycc422(32, 16)((c, r, col) => 20 + 40 * c + 16 * (r / 8) + 4 * (col / 8))
    val back = Codecs.decodeJpegYcc422(Codecs.encodeJpegYcc422(img))
    assert(back.width == 32 && back.height == 16)
    assert(back.y.sameElements(img.y) && back.cb.sameElements(img.cb)
      && back.cr.sameElements(img.cr))
    // the sampling really is 4:2:2: chroma planes carry half the luma
    // columns at EVERY row (vs 4:2:0's quarter, 4:4:4's full)
    assert(back.cb.length == 16 * 16)
  }

  test("422: arbitrary planes round-trip within the coefficient-rounding bound (r16)") {
    val img = ycc422(13, 11)((c, r, col) => (r * 29 + col * 19 + c * 67) % 256)
    val back = Codecs.decodeJpegYcc422(Codecs.encodeJpegYcc422(img))
    for ((a, b) <- Seq((img.y, back.y), (img.cb, back.cb), (img.cr, back.cr)))
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) <= 2) }
  }

  test("422: restart predictor resets; the THREE samplings refuse each other by name (r16)") {
    val img = ycc422(48, 8)((c, r, col) => 10 + 50 * c + 5 * (col / 8))
    val withRst = Codecs.encodeJpegYcc422(img, restartInterval = 2)
    assert(withRst.containsSlice(Array(0xff.toByte, 0xd0.toByte)))
    val back = Codecs.decodeJpegYcc422(withRst)
    assert(back.y.sameElements(img.y) && back.cr.sameElements(img.cr))
    val b422 = Codecs.encodeJpegYcc422(img)
    assert(intercept[IllegalArgumentException](Codecs.decodeJpegYcc(b422))
      .getMessage.contains("4:2:0"))
    assert(intercept[IllegalArgumentException](Codecs.decodeJpegYcc444(b422))
      .getMessage.contains("4:4:4"))
    val ycc420 = Codecs.YccImage(16, 16, Array.fill(256)(99),
      Array.fill(64)(12), Array.fill(64)(200))
    assert(intercept[IllegalArgumentException](
      Codecs.decodeJpegYcc422(Codecs.encodeJpegYcc(ycc420)))
      .getMessage.contains("4:2:2"))
    val f444 = Codecs.Ycc444Image(8, 8, Array.fill(64)(1), Array.fill(64)(2),
      Array.fill(64)(3))
    assert(intercept[IllegalArgumentException](
      Codecs.decodeJpegYcc422(Codecs.encodeJpegYcc444(f444)))
      .getMessage.contains("4:2:2"))
  }
}
