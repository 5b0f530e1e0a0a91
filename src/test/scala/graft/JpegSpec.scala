package graft

import graft.engine.Jpeg
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Baseline JPEG codec verification, three independent ways:
  *
  *  1. SPEC-SIDE fixtures — a hand-rolled assembler in this file using the
  *     T.81 Annex-K VARYING-LENGTH DC Huffman table (production's encoder
  *     uses uniform-length codes, so a shared misunderstanding between
  *     [[Jpeg.syntheticJpeg]] and [[Jpeg.jpegImage]] cannot cancel out
  *     here), DC-only blocks whose IDCT output is exactly flat — expected
  *     pixels computed by arithmetic, not by either codec.
  *  2. JDK ImageIO cross-fuzz in BOTH directions with a small tolerance
  *     (the JPEG spec bounds decoder accuracy, T.83 — IDCT rounding
  *     differs legally between implementations; chroma-subsampled cases
  *     use gray-valued content so upsampling-filter choice cancels).
  *  3. Loud-failure probes for every unsupported-mode branch.
  */
class JpegSpec extends AnyFunSuite with Matchers {

  // ---- spec-side assembler (independent of the production encoder) ----

  private class Bw {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var n = 0
    def put(code: Int, len: Int): Unit = (len - 1 to 0 by -1).foreach { i =>
      acc = (acc << 1) | ((code >> i) & 1); n += 1
      if (n == 8) { out.write(acc); if (acc == 0xff) out.write(0); acc = 0; n = 0 }
    }
    def flush(): Unit = if (n > 0) {
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(acc); if (acc == 0xff) out.write(0); acc = 0; n = 0
    }
  }

  /** Canonical codes from a BITS/HUFFVAL pair (T.81 C.2, re-derived here
    * independently): value → (code, length). */
  private def canonical(bits: Seq[Int], vals: Seq[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) { m += vals(k) -> ((code, l)); code += 1; k += 1 }
      code <<= 1
    }
    m.result()
  }

  // T.81 Annex K.3.1 typical DC luminance table: varying code lengths 2–9
  private val DcBits = Seq(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = 0 to 11
  private val DcCode = canonical(DcBits, DcVals)
  // minimal AC table: the single EOB symbol at code length 1
  private val AcBits = Seq(1) ++ Seq.fill(15)(0)
  private val AcVals = Seq(0x00)

  private def cat(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def putDc(bw: Bw, diff: Int): Unit = {
    val s = cat(diff)
    val (c, l) = DcCode(s)
    bw.put(c, l)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
  }
  private def putEob(bw: Bw): Unit = bw.put(0, 1)

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int,
                  body: Seq[Int]): Unit = {
    out.write(0xff); out.write(marker)
    out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
    body.foreach(b => out.write(b & 0xff))
  }
  private def dqt(id: Int, q: Int): Seq[Int] = id +: Seq.fill(64)(q)
  private def dht: Seq[Int] =
    Seq(0x00) ++ DcBits ++ DcVals ++ Seq(0x10) ++ AcBits ++ AcVals

  /** Grayscale DC-only JPEG: `dc(i)` is block i's quantized DC coefficient
    * (raster order), all AC zero; every block decodes to the flat value
    * round(dc·q00/8)+128. */
  private def grayDcOnly(wb: Int, hb: Int, q00: Int, dc: Seq[Int],
                         restartEvery: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xdb, dqt(0, q00))
    seg(out, 0xc0, Seq(8, (8 * hb) >> 8, (8 * hb) & 0xff,
      (8 * wb) >> 8, (8 * wb) & 0xff, 1, 1, 0x11, 0))
    seg(out, 0xc4, dht)
    if (restartEvery > 0) seg(out, 0xdd, Seq(restartEvery >> 8, restartEvery & 0xff))
    seg(out, 0xda, Seq(1, 1, 0x00, 0, 63, 0))
    val bw = new Bw
    var pred = 0
    var rst = 0
    dc.zipWithIndex.foreach { case (v, i) =>
      if (restartEvery > 0 && i > 0 && i % restartEvery == 0) {
        bw.flush()
        bw.out.write(0xff); bw.out.write(0xd0 + rst)
        rst = (rst + 1) & 7
        pred = 0
      }
      putDc(bw, v - pred); pred = v
      putEob(bw)
    }
    bw.flush()
    out.write(bw.out.toByteArray)
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  private def flat(dc: Int, q: Int): Int = {
    val v = math.round(dc * q / 8.0).toInt + 128
    math.max(0, math.min(255, v))
  }

  // ---- 1. spec-side exact-pixel fixtures ----

  test("jpegImage: DC-only grayscale blocks decode to exactly flat values " +
    "through the varying-length Annex-K Huffman table") {
    // 3×2 blocks (24×16), dc·q00 a multiple of 8 so expectation is exact
    val dc = Seq(0, 8, -8, 40, -64, 127)
    val img = Jpeg.jpegImage(grayDcOnly(3, 2, 16, dc))
    (img.width, img.height, img.channels) shouldBe ((24, 16, 1))
    for (by <- 0 until 2; bx <- 0 until 3) {
      val want = flat(dc(by * 3 + bx), 16)
      for (y <- 0 until 8; x <- 0 until 8)
        withClue(s"block ($bx,$by) pixel ($x,$y): ") {
          (img.pixels((by * 8 + y) * 24 + bx * 8 + x) & 0xff) shouldBe want
        }
    }
  }

  test("jpegImage: restart markers reset the DC predictor and realign the " +
    "bit stream; an out-of-order RST fails loudly") {
    val dc = Seq(24, 32, -16, 8, 56, -40)
    val withRst = grayDcOnly(3, 2, 8, dc, restartEvery = 2)
    val img = Jpeg.jpegImage(withRst)
    for (i <- dc.indices) {
      val (bx, by) = (i % 3, i / 3)
      (img.pixels(by * 8 * 24 + bx * 8) & 0xff) shouldBe flat(dc(i), 8)
    }
    // corrupt the first RST marker's index (FFD0 → FFD3): must throw
    val bytes = withRst.clone()
    val rstPos = bytes.indices.find(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xd0).get
    bytes(rstPos + 1) = 0xd3.toByte
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(bytes)
    }.getMessage should include("RST")
  }

  test("jpegImage: 4:2:0 color with flat DC-only planes — exact quadrant " +
    "luma and exact color conversion (upsampling geometry pinned)") {
    // 16×16: four Y blocks (quadrant values), one Cb and one Cr block
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xdb, dqt(0, 8) ++ dqt(1, 8))
    seg(out, 0xc0, Seq(8, 0, 16, 0, 16, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(out, 0xc4, dht)
    seg(out, 0xda, Seq(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val bw = new Bw
    val yDc = Seq(-48, 16, 64, 96) // quadrants TL TR BL BR
    var pred = 0
    yDc.foreach { v => putDc(bw, v - pred); pred = v; putEob(bw) }
    putDc(bw, -32); putEob(bw) // Cb: flat 128 + (-32*8/8) = 96
    putDc(bw, 24); putEob(bw)  // Cr: flat 128 + 24 = 152
    bw.flush()
    out.write(bw.out.toByteArray)
    out.write(0xff); out.write(0xd9)
    val img = Jpeg.jpegImage(out.toByteArray)
    (img.width, img.height, img.channels) shouldBe ((16, 16, 3))
    def expectRgb(lum: Int): (Int, Int, Int) = {
      val b1 = 96 - 128; val r1 = 152 - 128
      def c8(v: Long) = math.max(0, math.min(255, v)).toInt
      (c8(math.round(lum + 1.402 * r1)),
        c8(math.round(lum - 0.344136 * b1 - 0.714136 * r1)),
        c8(math.round(lum + 1.772 * b1)))
    }
    for (y <- 0 until 16; x <- 0 until 16) {
      val lum = flat(yDc((y / 8) * 2 + x / 8), 8)
      val (r, g, b) = expectRgb(lum)
      val o = (y * 16 + x) * 3
      withClue(s"($x,$y): ") {
        ((img.pixels(o) & 0xff, img.pixels(o + 1) & 0xff,
          img.pixels(o + 2) & 0xff)) shouldBe ((r, g, b))
      }
    }
  }

  test("jpegImage: 4:2:2 color (2x1 sampling — two Y blocks beside one " +
    "chroma block per MCU) pins the horizontal-only upsampling geometry") {
    // 16×8: MCU is 16×8 — Y blocks left/right, one Cb and one Cr block
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xdb, dqt(0, 8) ++ dqt(1, 8))
    seg(out, 0xc0, Seq(8, 0, 8, 0, 16, 3,
      1, 0x21, 0, 2, 0x11, 1, 3, 0x11, 1)) // Y 2x1, Cb/Cr 1x1
    seg(out, 0xc4, dht)
    seg(out, 0xda, Seq(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val bw = new Bw
    val yDc = Seq(-64, 80) // left half, right half
    var pred = 0
    yDc.foreach { v => putDc(bw, v - pred); pred = v; putEob(bw) }
    putDc(bw, 16); putEob(bw)  // Cb flat 128+16 = 144
    putDc(bw, -40); putEob(bw) // Cr flat 128-40 = 88
    bw.flush()
    out.write(bw.out.toByteArray)
    out.write(0xff); out.write(0xd9)
    val img = Jpeg.jpegImage(out.toByteArray)
    (img.width, img.height, img.channels) shouldBe ((16, 8, 3))
    def c8(v: Long) = math.max(0, math.min(255, v)).toInt
    for (y <- 0 until 8; x <- 0 until 16) {
      val lum = flat(yDc(x / 8), 8)
      val b1 = 144 - 128; val r1 = 88 - 128
      val o = (y * 16 + x) * 3
      withClue(s"($x,$y): ") {
        ((img.pixels(o) & 0xff, img.pixels(o + 1) & 0xff,
          img.pixels(o + 2) & 0xff)) shouldBe ((
          c8(math.round(lum + 1.402 * r1)),
          c8(math.round(lum - 0.344136 * b1 - 0.714136 * r1)),
          c8(math.round(lum + 1.772 * b1))))
      }
    }
  }

  test("jpegImage hardening (review findings): fill bytes before RSTn " +
    "accepted; over-subscribed DHT, ZRL overflow, and empty DRI all loud") {
    // (a) T.81 B.1.1.2: fill bytes are legal before ANY marker, restart
    // markers included — inserting one must not change the decode
    val dc = Seq(24, 32, -16, 8)
    val withRst = grayDcOnly(2, 2, 8, dc, restartEvery = 2)
    val rstPos = withRst.indices.find(i =>
      (withRst(i) & 0xff) == 0xff && (withRst(i + 1) & 0xff) == 0xd0).get
    val padded = withRst.take(rstPos) ++ Array(0xff.toByte) ++
      withRst.drop(rstPos)
    Jpeg.jpegImage(padded).pixels.toSeq shouldBe
      Jpeg.jpegImage(withRst).pixels.toSeq
    // (b) three codes of length 1 cannot exist — must fail at table build,
    // not decode garbage through a structurally invalid table
    val badDht = new java.io.ByteArrayOutputStream()
    badDht.write(0xff); badDht.write(0xd8)
    seg(badDht, 0xdb, dqt(0, 8))
    seg(badDht, 0xc4, Seq(0x00) ++ (Seq(3) ++ Seq.fill(15)(0)) ++ Seq(0, 1, 2))
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(badDht.toByteArray ++
        Array(0xff, 0xd9).map(_.toByte))
    }.getMessage should include("over-subscribed")
    // (c) ZRL runs past coefficient 63: AC table with EOB + ZRL at 2 bits,
    // then DC + four ZRLs (k: 1→17→33→49→65) — must throw, mirroring the
    // literal-coefficient branch's bounds check
    val zrl = new java.io.ByteArrayOutputStream()
    zrl.write(0xff); zrl.write(0xd8)
    seg(zrl, 0xdb, dqt(0, 8))
    seg(zrl, 0xc0, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    seg(zrl, 0xc4, Seq(0x00) ++ DcBits ++ DcVals ++
      Seq(0x10) ++ (Seq(0, 2) ++ Seq.fill(14)(0)) ++ Seq(0x00, 0xf0))
    seg(zrl, 0xda, Seq(1, 1, 0x00, 0, 63, 0))
    val bw = new Bw
    val (c0, l0) = DcCode(0)
    bw.put(c0, l0)                       // DC diff 0
    (1 to 4).foreach(_ => bw.put(1, 2))  // ZRL ×4 → k = 65
    bw.flush()
    zrl.write(bw.out.toByteArray)
    zrl.write(0xff); zrl.write(0xd9)
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(zrl.toByteArray)
    }.getMessage should include("ZRL past end of block")
    // (d) DRI with an empty body must fail AT the DRI, not misread the
    // next marker's bytes as the restart interval
    val good = grayDcOnly(1, 1, 8, Seq(8))
    val sosPos = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda).get
    val emptyDri = good.take(sosPos) ++
      Array(0xff, 0xdd, 0x00, 0x02).map(_.toByte) ++ good.drop(sosPos)
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(emptyDri)
    }.getMessage should include("truncated DRI")
  }

  // ---- 2. ImageIO cross-fuzz ----

  private def imageIoRead(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    img should not be null
    img
  }

  test("syntheticJpeg fuzz vs ImageIO: grayscale decodes within IDCT " +
    "rounding tolerance at odd sizes (edge-replicated partial blocks)") {
    for (seed <- 1L to 10L) {
      val w = 7 + (seed % 11).toInt
      val h = 9 + (seed % 7).toInt
      val payload = Jpeg.syntheticJpeg(seed, w, h, channels = 1)
      val ours = Jpeg.jpegImage(payload)
      val ref = imageIoRead(payload)
      (ref.getWidth, ref.getHeight) shouldBe ((w, h))
      val px = new Array[Int](1)
      for (y <- 0 until h; x <- 0 until w) {
        ref.getRaster.getPixel(x, y, px)
        withClue(s"seed=$seed ($x,$y): ") {
          math.abs((ours.pixels(y * w + x) & 0xff) - px(0)) should be <= 2
        }
      }
    }
  }

  test("syntheticJpeg fuzz vs ImageIO: color 4:4:4 and 4:2:0 (gray-valued " +
    "content so upsampling-filter choice cancels) within tolerance; " +
    "restart-marker stream decodes identically to the plain stream") {
    for (seed <- 1L to 6L; subsample <- Seq(false, true)) {
      val w = 10 + (seed % 5).toInt
      val h = 8 + (seed % 6).toInt
      // gray-valued RGB: Cb=Cr=0 exactly, so chroma planes are flat and
      // every legal upsampling filter agrees
      val px = Array.tabulate(w * h * 3) { i =>
        val p = i / 3
        (((seed * 31 + p * 197) >>> 3) & 0xff).toInt
      }
      val payload = Jpeg.encode(px, w, h, 3, subsample, 0)
      val ours = Jpeg.jpegImage(payload)
      val ref = imageIoRead(payload)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = ref.getRGB(x, y)
        val o = (y * w + x) * 3
        withClue(s"seed=$seed sub=$subsample ($x,$y): ") {
          math.abs((ours.pixels(o) & 0xff) - ((rgb >> 16) & 0xff)) should be <= 2
          math.abs((ours.pixels(o + 1) & 0xff) - ((rgb >> 8) & 0xff)) should be <= 2
          math.abs((ours.pixels(o + 2) & 0xff) - (rgb & 0xff)) should be <= 2
        }
      }
    }
    // restart markers are lossless bookkeeping: same coefficients, same
    // pixels — bit-exact against the no-restart encoding of the same content
    val a = Jpeg.jpegImage(Jpeg.syntheticJpeg(42L, 24, 16, 3, subsample = true,
      restartEvery = 2))
    val b = Jpeg.jpegImage(Jpeg.syntheticJpeg(42L, 24, 16, 3, subsample = true))
    a.pixels.toSeq shouldBe b.pixels.toSeq
  }

  test("jpegImage fuzz: ImageIO-WRITTEN grayscale JPEGs (standard " +
    "varying-length tables, writer-chosen quant) decode within tolerance " +
    "of ImageIO's own reading") {
    import java.awt.image.BufferedImage
    for (seed <- 1L to 8L) {
      val w = 6 + (seed % 13).toInt
      val h = 5 + (seed % 9).toInt
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setPixel(x, y,
          Array((((seed + x * 31 + y * 17) * 0x9e3779b9L >>> 16) & 0xff).toInt))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out) shouldBe true
      val payload = out.toByteArray
      val ours = Jpeg.jpegImage(payload)
      (ours.width, ours.height, ours.channels) shouldBe ((w, h, 1))
      val ref = imageIoRead(payload)
      val px = new Array[Int](1)
      for (y <- 0 until h; x <- 0 until w) {
        ref.getRaster.getPixel(x, y, px)
        withClue(s"seed=$seed ($x,$y): ") {
          math.abs((ours.pixels(y * w + x) & 0xff) - px(0)) should be <= 2
        }
      }
    }
  }

  test("jpegImage fuzz: ImageIO-written gray-valued COLOR JPEG (writer's " +
    "own subsampling choice) decodes within tolerance") {
    import java.awt.image.BufferedImage
    val (w, h) = (19, 13)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (((x * 41 + y * 23) * 0x9e3779b9L >>> 12) & 0xff).toInt
      img.getRaster.setPixel(x, y, Array(v, v, v))
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out) shouldBe true
    val ours = Jpeg.jpegImage(out.toByteArray)
    (ours.width, ours.height, ours.channels) shouldBe ((w, h, 3))
    val ref = imageIoRead(out.toByteArray)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      withClue(s"($x,$y): ") {
        math.abs((ours.pixels(o) & 0xff) - ((rgb >> 16) & 0xff)) should be <= 3
        math.abs((ours.pixels(o + 1) & 0xff) - ((rgb >> 8) & 0xff)) should be <= 3
        math.abs((ours.pixels(o + 2) & 0xff) - (rgb & 0xff)) should be <= 3
      }
    }
  }

  // ---- 3. loud failures ----

  test("jpegImage loud failures: extended-sequential SOF, 16-bit DQT, " +
    "truncation, garbage, EOI-first, marker in entropy data") {
    val good = grayDcOnly(2, 1, 16, Seq(8, -8))
    // SOF0 → SOF1 (extended sequential — outside the supported set; SOF2
    // progressive DECODES since r11, so it is no longer the refusal probe)
    val ext = good.clone()
    val sofPos = ext.indices.find(i =>
      (ext(i) & 0xff) == 0xff && (ext(i + 1) & 0xff) == 0xc0).get
    ext(sofPos + 1) = 0xc1.toByte
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(ext)
    }.getMessage should include("SOF")
    // a BASELINE stream whose scan header claims progressive spectral
    // selection is self-contradictory — loud
    intercept[IllegalArgumentException] {
      val bad = good.clone()
      val sosPos = bad.indices.find(i =>
        (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xda).get
      bad(sosPos + 7) = 5.toByte // Ss = 5 in a SOF0 stream
      Jpeg.jpegImage(bad)
    }.getMessage should include("baseline")
    // 16-bit quantization table (Pq=1)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xdb, Seq(0x10) ++ Seq.fill(128)(0x01))
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(out.toByteArray ++ good.drop(2))
    }.getMessage should include("16-bit")
    // truncated entropy stream
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(good.dropRight(6))
    }
    // not a JPEG at all
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage("definitely not a jpeg".getBytes)
    }.getMessage should include("not a JPEG")
    // EOI straight after SOI
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte))
    }
    Jpeg.isJpeg(good) shouldBe true
    Jpeg.isJpeg("BM      ".getBytes) shouldBe false
  }

  // ---- 4. progressive (SOF2) ----

  /** Spec-side PROGRESSIVE assembler (independent of the production
    * encoder): grayscale DC-only blocks shipped through the full
    * successive-approximation scan script — DC first at Al=1, DC
    * refinement, AC first over [1,63] as one EOB run, AC refinement
    * (EOB-run only; zero history ⇒ no correction bits). Expected pixels
    * stay the exact flat() arithmetic. AC table: EOB0 and EOB1 at 2 bits. */
  private def progGrayDcOnly(wb: Int, hb: Int, q00: Int,
                             dc: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xdb, dqt(0, q00))
    seg(out, 0xc2, Seq(8, (8 * hb) >> 8, (8 * hb) & 0xff,
      (8 * wb) >> 8, (8 * wb) & 0xff, 1, 1, 0x11, 0))
    seg(out, 0xc4, Seq(0x00) ++ DcBits ++ DcVals ++
      Seq(0x10) ++ (Seq(0, 2) ++ Seq.fill(14)(0)) ++ Seq(0x00, 0x10))
    // scan 1: DC first, Al=1 — codes dc >> 1 cumulatively
    seg(out, 0xda, Seq(1, 1, 0x00, 0, 0, 0x01))
    val bw1 = new Bw
    var pred = 0
    dc.foreach { v => putDc(bw1, (v >> 1) - pred); pred = v >> 1 }
    bw1.flush()
    out.write(bw1.out.toByteArray)
    // scan 2: DC refinement, Ah=1 Al=0 — one raw bit (bit 0 of dc) per block
    seg(out, 0xda, Seq(1, 1, 0x00, 0, 0, 0x10))
    val bw2 = new Bw
    dc.foreach(v => bw2.put(v & 1, 1))
    bw2.flush()
    out.write(bw2.out.toByteArray)
    // scan 3: AC first [1,63] — every band zero: one EOBn covering all
    // blocks (emitted as chained EOB1/EOB0 runs for > 2 blocks)
    seg(out, 0xda, Seq(1, 1, 0x00, 1, 63, 0x00))
    val bw3 = new Bw
    var left = dc.length
    while (left > 0) {
      if (left >= 2) { bw3.put(1, 2); bw3.put(0, 1); left -= 2 } // EOB1+0bit
      else { bw3.put(0, 2); left -= 1 }                          // EOB0
    }
    bw3.flush()
    out.write(bw3.out.toByteArray)
    // scan 4: AC refinement [1,63], Ah=1 Al=0 — zero history: EOB runs
    // only, no correction bits
    seg(out, 0xda, Seq(1, 1, 0x00, 1, 63, 0x10))
    val bw4 = new Bw
    left = dc.length
    while (left > 0) {
      if (left >= 2) { bw4.put(1, 2); bw4.put(0, 1); left -= 2 }
      else { bw4.put(0, 2); left -= 1 }
    }
    bw4.flush()
    out.write(bw4.out.toByteArray)
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  test("jpegImage progressive: hand-rolled successive-approximation scan " +
    "script (DC first Al=1 → DC refine → AC-first EOB runs → AC refine) " +
    "reconstructs the exact flat pixels, odd and even, positive and " +
    "negative DC") {
    // 9: needs the refine bit set; -6: arithmetic >> then refine bit 0;
    // 127/-128: category extremes through the point transform
    val dc = Seq(9, -6, 127, 0, -128, 33)
    val img = Jpeg.jpegImage(progGrayDcOnly(3, 2, 16, dc))
    (img.width, img.height, img.channels) shouldBe ((24, 16, 1))
    for (by <- 0 until 2; bx <- 0 until 3) {
      val want = flat(dc(by * 3 + bx), 16)
      for (y <- 0 until 8; x <- 0 until 8)
        withClue(s"block ($bx,$by) pixel ($x,$y): ") {
          (img.pixels((by * 8 + y) * 24 + bx * 8 + x) & 0xff) shouldBe want
        }
    }
  }

  test("encodeProgressive parity: the progressive container holds the SAME " +
    "quantized coefficients as the baseline one, so decode must be " +
    "bit-identical — gray, color, 4:2:0, odd sizes, band splits") {
    for (seed <- 1L to 6L) {
      val w = 9 + (seed % 8).toInt
      val h = 7 + (seed % 9).toInt
      val gray = Jpeg.jpegImage(Jpeg.syntheticProgressiveJpeg(seed, w, h, 1))
      val gBase = Jpeg.jpegImage(Jpeg.syntheticJpeg(seed, w, h, 1))
      (gray.width, gray.height, gray.channels) shouldBe
        ((gBase.width, gBase.height, gBase.channels))
      gray.pixels.toSeq shouldBe gBase.pixels.toSeq
      for (sub <- Seq(false, true)) {
        val prog = Jpeg.jpegImage(
          Jpeg.syntheticProgressiveJpeg(seed, w, h, 3, subsample = sub))
        val base = Jpeg.jpegImage(
          Jpeg.syntheticJpeg(seed, w, h, 3, subsample = sub))
        withClue(s"seed=$seed sub=$sub: ") {
          prog.pixels.toSeq shouldBe base.pixels.toSeq
        }
      }
    }
    // a different band tiling is pure re-grouping of the same coefficients
    val px = Array.tabulate(20 * 12 * 3)(i => (i * 37 + 11) % 256)
    val a = Jpeg.jpegImage(Jpeg.encodeProgressive(px, 20, 12, 3, false,
      bands = Seq((1, 1), (2, 9), (10, 63))))
    val b = Jpeg.jpegImage(Jpeg.encode(px, 20, 12, 3, false, 0))
    a.pixels.toSeq shouldBe b.pixels.toSeq
  }

  test("jpegImage fuzz: ImageIO-WRITTEN PROGRESSIVE JPEGs (the standard " +
    "libjpeg successive-approximation scan script with real AC content) " +
    "decode within tolerance of ImageIO's own reading") {
    import java.awt.image.BufferedImage
    import javax.imageio.{ImageIO, ImageWriteParam}
    def writeProgressive(img: BufferedImage): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
      val out = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      out.toByteArray
    }
    // grayscale
    for (seed <- 1L to 6L) {
      val w = 6 + (seed % 13).toInt
      val h = 5 + (seed % 9).toInt
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setPixel(x, y,
          Array((((seed + x * 31 + y * 17) * 0x9e3779b9L >>> 16) & 0xff).toInt))
      val payload = writeProgressive(img)
      // confirm the fixture really is progressive (SOF2 present)
      payload.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2) shouldBe true
      val ours = Jpeg.jpegImage(payload)
      (ours.width, ours.height, ours.channels) shouldBe ((w, h, 1))
      val ref = imageIoRead(payload)
      val px = new Array[Int](1)
      for (y <- 0 until h; x <- 0 until w) {
        ref.getRaster.getPixel(x, y, px)
        withClue(s"seed=$seed ($x,$y): ") {
          math.abs((ours.pixels(y * w + x) & 0xff) - px(0)) should be <= 2
        }
      }
    }
    // gray-valued color (writer-chosen subsampling cancels on flat chroma)
    val (w, h) = (19, 13)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (((x * 41 + y * 23) * 0x9e3779b9L >>> 12) & 0xff).toInt
      img.getRaster.setPixel(x, y, Array(v, v, v))
    }
    val payload = writeProgressive(img)
    val ours = Jpeg.jpegImage(payload)
    (ours.width, ours.height, ours.channels) shouldBe ((w, h, 3))
    val ref = imageIoRead(payload)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      withClue(s"($x,$y): ") {
        math.abs((ours.pixels(o) & 0xff) - ((rgb >> 16) & 0xff)) should be <= 3
        math.abs((ours.pixels(o + 1) & 0xff) - ((rgb >> 8) & 0xff)) should be <= 3
        math.abs((ours.pixels(o + 2) & 0xff) - (rgb & 0xff)) should be <= 3
      }
    }
  }

  test("encodeProgressive fuzz vs ImageIO: our SOF2 streams decode in " +
    "ImageIO within IDCT tolerance (the other direction)") {
    for (seed <- 1L to 5L) {
      val w = 7 + (seed % 11).toInt
      val h = 9 + (seed % 7).toInt
      val payload = Jpeg.syntheticProgressiveJpeg(seed, w, h, channels = 1)
      val ours = Jpeg.jpegImage(payload)
      val ref = imageIoRead(payload)
      (ref.getWidth, ref.getHeight) shouldBe ((w, h))
      val px = new Array[Int](1)
      for (y <- 0 until h; x <- 0 until w) {
        ref.getRaster.getPixel(x, y, px)
        withClue(s"seed=$seed ($x,$y): ") {
          math.abs((ours.pixels(y * w + x) & 0xff) - px(0)) should be <= 2
        }
      }
    }
  }

  test("progressive loud failures + decode cap: interleaved AC scan, bad " +
    "Ah/Al, DC scan with Se>0, arithmetic SOF, truncated SOF header, " +
    "maxPixels bomb guard") {
    val good = progGrayDcOnly(2, 1, 16, Seq(8, -8))
    def patchSos(n: Int, b: Seq[(Int, Int)]): Array[Byte] = {
      // patch offsets within the n-th SOS segment (0-based, offset from FF)
      val p = good.clone()
      val positions = p.indices.filter(i =>
        (p(i) & 0xff) == 0xff && (p(i + 1) & 0xff) == 0xda)
      b.foreach { case (off, v) => p(positions(n) + off) = v.toByte }
      p
    }
    // AC scan (scan 3: Ss=1) claiming Se < Ss
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(patchSos(2, Seq((8, 0)))) // Se byte → 0 while Ss=1
    }.getMessage should include("band")
    // DC scan with Se > 0
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(patchSos(0, Seq((8, 7)))) // scan 1 Se → 7
    }.getMessage should include("Se=0")
    // refinement jumping two bits (Ah must be Al+1)
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(patchSos(1, Seq((9, 0x20)))) // AhAl → 2,0
    }.getMessage should include("successive approximation")
    // arithmetic-coded progressive (SOF10) refuses
    val arith = good.clone()
    val sofPos = arith.indices.find(i =>
      (arith(i) & 0xff) == 0xff && (arith(i + 1) & 0xff) == 0xc2).get
    arith(sofPos + 1) = 0xca.toByte
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(arith)
    }.getMessage should include("SOF")
    // truncated SOF header: segment length 5 cannot hold the 6 fixed
    // bytes — must fail at the bound check, before any field read
    // (ADVICE r10; the DRI-fix twin)
    val shortSof = new java.io.ByteArrayOutputStream()
    shortSof.write(0xff); shortSof.write(0xd8)
    shortSof.write(0xff); shortSof.write(0xc0)
    shortSof.write(0x00); shortSof.write(0x05)
    shortSof.write(Array[Byte](8, 0, 8))
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(shortSof.toByteArray ++ Array(0xff, 0xd9).map(_.toByte))
    }.getMessage should include("truncated SOF")
    // decompression-bomb guard: a ~20-byte header demanding 40000×40000
    // fails the cap BEFORE allocating planes/coefficients
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write(0xff); bomb.write(0xd8)
    seg(bomb, 0xc0, Seq(8, 40000 >> 8, 40000 & 0xff, 40000 >> 8,
      40000 & 0xff, 1, 1, 0x11, 0))
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(bomb.toByteArray ++ Array(0xff, 0xd9).map(_.toByte))
    }.getMessage should include("decode cap")
    // the cap is the caller's knob: a perfectly valid 16×8 image refuses
    // under a 100-pixel cap — and decodes under the default
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(good, maxPixels = 100L)
    }.getMessage should include("decode cap")
    Jpeg.jpegImage(good).width shouldBe 16
  }

  test("progressive AC refinement: a ZRL overrunning the band end fails " +
    "loudly instead of desyncing (ADVICE r11)") {
    // one grayscale block; scan script: DC first → AC first [1,10] at Al=1
    // all-zero (EOB0) → AC refinement [1,10] whose first symbol is ZRL —
    // 16 zero-history slots cannot fit a 10-coefficient band, the exact
    // overrun acFirst already rejects on its side
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xdb, dqt(0, 16))
    seg(out, 0xc2, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    seg(out, 0xc4, Seq(0x00) ++ DcBits ++ DcVals ++
      Seq(0x10) ++ (Seq(0, 2) ++ Seq.fill(14)(0)) ++ Seq(0x00, 0xf0))
    // scan 1: DC first, Al=0
    seg(out, 0xda, Seq(1, 1, 0x00, 0, 0, 0x00))
    val bw1 = new Bw; putDc(bw1, 8); bw1.flush()
    out.write(bw1.out.toByteArray)
    // scan 2: AC first [1,10], Al=1 — all zero: one EOB0 (code 00)
    seg(out, 0xda, Seq(1, 1, 0x00, 1, 10, 0x01))
    val bw2 = new Bw; bw2.put(0, 2); bw2.flush()
    out.write(bw2.out.toByteArray)
    // scan 3: AC refinement [1,10], Ah=1 Al=0 — ZRL (code 01) overruns
    seg(out, 0xda, Seq(1, 1, 0x00, 1, 10, 0x10))
    val bw3 = new Bw; bw3.put(1, 2); bw3.flush()
    out.write(bw3.out.toByteArray)
    out.write(0xff); out.write(0xd9)
    intercept[IllegalArgumentException] {
      Jpeg.jpegImage(out.toByteArray)
    }.getMessage should include("ZRL past end of band")
  }

  test("features + dispatcher: JPEG payloads route through the sniffing " +
    "media decoder; resize refuses the decode-only container loudly") {
    val payload = Jpeg.syntheticJpeg(3L, 8, 8, channels = 1)
    val f = graft.engine.Multimodal.Decoders.media("image", payload)
    f(0) shouldBe 8.0
    f(1) shouldBe 8.0
    f(2) shouldBe 1.0
    f.length shouldBe 4
    // feature mean matches a direct decode
    val img = Jpeg.jpegImage(payload)
    val mean = BigDecimal(img.pixels.map(_ & 0xff).sum / 64.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    f(3) shouldBe mean
    intercept[IllegalArgumentException] {
      graft.engine.Multimodal.Decoders.resizeImage(payload, 4, 4)
    }.getMessage should include("decode-only")
  }
}
