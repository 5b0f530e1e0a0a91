package graft

/** Spec-side media container assemblers, INDEPENDENT of the production
  * generators in `Multimodal.Decoders`: fixtures built here encode the
  * test author's reading of the public specs (RFC 2083 / W3C PNG, RIFF
  * WAVE), so a shared misunderstanding between a production encoder and
  * its exact-inverse decoder cannot cancel out in round-trip tests. */
object MediaTestFixtures {

  /** Assemble a PNG from already-filtered scanline bytes (verbatim). */
  def pngOf(w: Int, h: Int, bitDepth: Int, colorType: Int,
            interlace: Int, filtered: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered); defl.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) buf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    pngOfRawIdat(w, h, bitDepth, colorType, interlace, buf.toByteArray)
  }

  /** Assemble a PNG around an ARBITRARY IDAT byte stream (valid chunk
    * framing and CRCs, but the zlib payload goes in verbatim) — for
    * corrupt-compressed-stream fixtures the deflating [[pngOf]] can't
    * produce. */
  def pngOfRawIdat(w: Int, h: Int, bitDepth: Int, colorType: Int,
                   interlace: Int, idat: Array[Byte]): Array[Byte] = {
    def be(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def chunk(typ: String, body: Array[Byte]) = {
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      be(body.length) ++ tb ++ body ++ be(crc.getValue.toInt)
    }
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", be(w) ++ be(h) ++
        Array[Byte](bitDepth.toByte, colorType.toByte, 0, 0,
          interlace.toByte)) ++
      chunk("IDAT", idat) ++ chunk("IEND", Array.empty[Byte])
  }

  /** Reference scanline FILTERING (the encoder direction of RFC 2083 §6,
    * written from the spec text): raw(x) = recon(x) − predictor(a, b, c)
    * mod 256, with a = left, b = up, c = up-left at distance `channels`.
    * Row y gets filter type `filters(y)`. */
  def filterScanlines(w: Int, h: Int, channels: Int, pixels: Array[Byte],
                      filters: Array[Int]): Array[Byte] = {
    require(pixels.length == w * h * channels && filters.length == h)
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val f = filters(y)
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val cur = pixels(y * stride + x) & 0xff
        val a = if (x >= channels) pixels(y * stride + x - channels) & 0xff
                else 0
        val b = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val c = if (y > 0 && x >= channels)
          pixels((y - 1) * stride + x - channels) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          case other => throw new IllegalArgumentException(
            s"bad filter $other")
        }
        raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
      }
    }
    raw
  }

  /** PNG color type for a channel count (RFC 2083 §4.1.1). */
  def colorTypeOf(channels: Int): Int = channels match {
    case 1 => 0
    case 2 => 4
    case 3 => 2
    case 4 => 6
  }

  /** Assemble a 24-bit uncompressed BMP from top-down RGB pixel triples
    * (pixels(y*w + x) = (r, g, b) with y=0 the TOP row): written from the
    * format spec — bottom-up row order, BGR byte order, rows padded to
    * 4-byte boundaries, 54-byte headers. */
  def bmpOf(w: Int, h: Int, pixels: Array[(Int, Int, Int)]): Array[Byte] = {
    require(pixels.length == w * h)
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    val rowSize = ((24 * w + 31) / 32) * 4
    val px = new Array[Byte](rowSize * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixels(y * w + x)
      val off = (h - 1 - y) * rowSize + 3 * x // bottom-up storage
      px(off) = b.toByte; px(off + 1) = g.toByte; px(off + 2) = r.toByte
    }
    "BM".getBytes("US-ASCII") ++ le32(54 + px.length) ++ le32(0) ++
      le32(54) ++ le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(px.length) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0) ++ px
  }

  /** Reference GIF-flavor LZW compressor (CompuServe GIF87a spec, written
    * independently of the production generator): variable-width LSB-first
    * codes starting at minCode+1 bits, CLEAR emitted first, dictionary
    * capped at 4096 with the width bump when entry (1 << codeSize) is
    * added. */
  def lzwEncode(idx: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val bytes = Array.newBuilder[Byte]
    var cur = 0L
    var curBits = 0
    var codeSize = minCode + 1
    def put(code: Int): Unit = {
      cur |= code.toLong << curBits
      curBits += codeSize
      while (curBits >= 8) {
        bytes += (cur & 0xff).toByte
        cur >>= 8
        curBits -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap[Vector[Int], Int]()
    var dictSize = end + 1
    def codeOf(w: Vector[Int]): Int =
      if (w.length == 1) w.head else dict(w)
    put(clear)
    var w = Vector.empty[Int]
    for (k <- idx) {
      val wk = w :+ k
      if (w.isEmpty || wk.length == 1 || dict.contains(wk)) w = wk
      else {
        put(codeOf(w))
        if (dictSize < 4096) {
          // the encoder's dictionary runs ONE entry ahead of the decoder's
          // (it adds on every emission, the decoder only from the second
          // code), so the width bump must fire on the PRE-add size — the
          // decoder's post-add size at the same code position
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
          dict(wk) = dictSize
          dictSize += 1
        }
        w = Vector(k)
      }
    }
    if (w.nonEmpty) put(codeOf(w))
    put(end)
    if (curBits > 0) bytes += (cur & 0xff).toByte
    bytes.result()
  }

  /** Assemble a GIF87a from a global color table and per-frame pixel-index
    * arrays (row-major, w·h each), compressing with [[lzwEncode]]. The
    * palette length must be a power of two in [2, 256]. */
  def gifOf(w: Int, h: Int, palette: Array[(Int, Int, Int)],
            frames: Seq[Array[Int]]): Array[Byte] = {
    require(palette.length >= 2 && palette.length <= 256 &&
      (palette.length & (palette.length - 1)) == 0)
    require(frames.nonEmpty && frames.forall(_.length == w * h))
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    val bits = Integer.numberOfTrailingZeros(palette.length) // log2(entries)
    val minCode = math.max(2, bits)
    val out = Array.newBuilder[Byte]
    out ++= "GIF87a".getBytes("US-ASCII")
    out ++= le16(w) ++= le16(h)
    out += (0x80 | ((bits - 1) << 4) | (bits - 1)).toByte // GCT present
    out += 0; out += 0 // background index, aspect
    palette.foreach { case (r, g, b) =>
      out += r.toByte; out += g.toByte; out += b.toByte
    }
    frames.foreach { f =>
      out += 0x2c.toByte
      out ++= le16(0) ++= le16(0) ++= le16(w) ++= le16(h)
      out += 0 // no local table, not interlaced
      out += minCode.toByte
      lzwEncode(f, minCode).grouped(255).foreach { blk =>
        out += blk.length.toByte
        out ++= blk
      }
      out += 0 // sub-block terminator
    }
    out += 0x3b.toByte
    out.result()
  }

  /** Assemble a 16-bit PCM WAV from hand-chosen interleaved samples. */
  def wavOf(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    val data = samples.flatMap(s => le16(s.toInt & 0xffff))
    val fmt = le16(1) ++ le16(channels) ++ le32(rate) ++
      le32(rate * channels * 2) ++ le16(channels * 2) ++ le16(16)
    "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + fmt.length + 8 +
      data.length) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(fmt.length) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }
}
