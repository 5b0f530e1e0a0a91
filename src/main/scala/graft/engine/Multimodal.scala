package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, decoded/featurized per partition.
  *
  * The decode itself is a CLEARLY-MARKED DETERMINISTIC STUB (no media libs in
  * this container — builder prompt): real deployments swap [[decodeStub]] for
  * an actual image/audio decoder. Everything around it is real and load-
  * bearing: the schema, the typed Dataset boundary, `mapPartitions` batching
  * (one decoder init per partition, not per row — the same shape a JNI/FFI
  * decoder needs), and the partition-size story (payloads stream through one
  * partition at a time; nothing collects to the driver).
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           feature: Array[Double])

  /** Attach an opaque binary payload + media-kind metadata. Testdata stand-in:
    * utf-8 bytes of document text, kind cycling by id — the real pipeline
    * reads payload bytes from object storage. */
  def asMedia(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (id % 3 + 1).cast("int")).as("kind"),
      text.cast("binary").as("payload"))

  /** Decoder contract: (media kind, raw payload bytes) → feature vector.
    * Implementations must be serializable (they ship to executors) and
    * cheap to call per row — per-task init belongs in [[extractFeatures]]'s
    * mapPartitions body. */
  type Decoder = (String, Array[Byte]) => Array[Double]

  /** STUB — deterministic fake decoder: normalized 8-bin byte histogram.
    * The DEFAULT `decode` argument of [[extractFeatures]], not the
    * architecture: production swaps in a real `Decoder` (e.g. JPEG → pixels
    * → embedding) with the same signature and batch shape. Kept as the
    * default because this container ships no media libs. */
  private[engine] def decodeStub(kind: String, payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % 8) += 1.0
      i += 1
    }
    val n = math.max(payload.length, 1).toDouble
    hist.map(h => BigDecimal(h / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** Decode + featurize, one partition at a time. `mapPartitions` (not `map`)
    * so a real decoder initializes once per task. The decode step is
    * pluggable: pass any serializable [[Decoder]]; the stub is only the
    * default. */
  def extractFeatures(media: DataFrame,
                      decode: Decoder = decodeStub _): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real pipelines: per-task decoder/session init goes here, once
      it.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          decode(r.kind, r.payload))
      }
    }.toDF()
  }

  /** REAL decoders for two simple container formats, dependency-free (pure
    * JVM byte parsing — no media libs needed): 24-bit uncompressed BMP and
    * 16-bit PCM WAV. These prove [[extractFeatures]] end-to-end on actual
    * pixel/sample data; production swaps in richer codecs with the same
    * [[Decoder]] signature. Malformed payloads fail loudly
    * (IllegalArgumentException) rather than degrade silently. */
  object Decoders {

    private def u16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def i32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    /** 24-bit uncompressed bottom-up BMP → [width, height, meanR, meanG,
      * meanB] (means over all pixels, 0-255, rounded to 6 dp). Rows are
      * padded to 4-byte boundaries per the format. */
    def bmp24(payload: Array[Byte]): Array[Double] = {
      require(payload.length >= 54 &&
        payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
        "not a BMP payload")
      val pixelOff = i32(payload, 10)
      val width = i32(payload, 18)
      val height = i32(payload, 22)
      val bpp = u16(payload, 28)
      val compression = i32(payload, 30)
      require(bpp == 24 && compression == 0,
        s"only 24-bit uncompressed BMP supported (bpp=$bpp comp=$compression)")
      require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
      val rowSize = ((24L * width + 31) / 32) * 4
      // Long arithmetic: a corrupt header with huge dims must fail THIS
      // check, not wrap through Int and pass it (fail-loudly contract)
      require(pixelOff >= 0 &&
        payload.length >= pixelOff + rowSize * height, "truncated pixels")
      var (sumB, sumG, sumR) = (0.0, 0.0, 0.0)
      var y = 0
      while (y < height) {
        var x = 0
        var p = pixelOff + y * rowSize.toInt
        while (x < width) {
          sumB += (payload(p) & 0xff)
          sumG += (payload(p + 1) & 0xff)
          sumR += (payload(p + 2) & 0xff)
          x += 1; p += 3
        }
        y += 1
      }
      val n = width.toDouble * height
      Array(width.toDouble, height.toDouble,
        round6(sumR / n), round6(sumG / n), round6(sumB / n))
    }

    /** 16-bit PCM WAV (RIFF/WAVE, fmt + data chunks) → [sampleRate,
      * channels, nSamples, rms] with samples normalized to [-1, 1) and rms
      * rounded to 6 dp. Unknown chunks are skipped per the RIFF contract
      * (chunk sizes pad to even offsets). */
    def wavPcm16(payload: Array[Byte]): Array[Double] = {
      require(payload.length >= 44 &&
        new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
        new String(payload, 8, 4, "US-ASCII") == "WAVE", "not a WAV payload")
      var off = 12
      var sampleRate = -1; var channels = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      while (off + 8 <= payload.length && (sampleRate < 0 || dataOff < 0)) {
        val id = new String(payload, off, 4, "US-ASCII")
        val size = i32(payload, off + 4)
        // Long arithmetic: size near Int.MaxValue must fail here, not wrap
        require(size >= 0 && off + 8L + size <= payload.length,
          s"bad RIFF chunk $id size=$size")
        id match {
          case "fmt " =>
            require(u16(payload, off + 8) == 1, "only PCM WAV supported")
            channels = u16(payload, off + 10)
            sampleRate = i32(payload, off + 12)
            bits = u16(payload, off + 22)
            require(bits == 16, s"only 16-bit PCM supported (bits=$bits)")
          case "data" => dataOff = off + 8; dataLen = size
          case _ => ()
        }
        off += 8 + size + (size & 1) // chunks pad to even offsets
      }
      require(sampleRate > 0 && dataOff >= 0, "missing fmt/data chunk")
      val nSamples = dataLen / 2
      var sumSq = 0.0
      var i = 0
      while (i < nSamples) {
        val s = (u16(payload, dataOff + 2 * i).toShort / 32768.0)
        sumSq += s * s
        i += 1
      }
      val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
      Array(sampleRate.toDouble, channels.toDouble, nSamples.toDouble,
        round6(rms))
    }

    /** Kind-dispatching media decoder over the real format parsers: BMP for
      * images, WAV for audio; video payloads fall back to the byte-histogram
      * fingerprint (no dependency-free video container is worth hand-rolling
      * — frame sampling is [[sampleFrames]]'s job). Any OTHER kind fails
      * loudly: a typo'd kind silently getting histogram "features" is
      * exactly the degradation this decoder's contract forbids. */
    val media: Decoder = {
      case ("image", bytes) => bmp24(bytes)
      case ("audio", bytes) => wavPcm16(bytes)
      case ("video", bytes) => decodeStub("video", bytes)
      case (kind, _) => throw new IllegalArgumentException(
        s"unknown media kind '$kind' (expected image/audio/video)")
    }

    private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
    private def le32(v: Int): Array[Byte] =
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

    /** Deterministic 2×2 24-bit BMP with pixels derived from `seed` — a
      * VALID payload generator so the image path (resize → decode) can run
      * end-to-end on real pixel data against tables that carry no actual
      * image bytes. Pure function of the seed: same payload everywhere. */
    def syntheticBmp(seed: Long): Array[Byte] = {
      val px = Array.tabulate(12)(i =>
        (java.lang.Long.rotateLeft(seed * 0x9e3779b97f4a7c15L, i) & 0xff).toByte)
      "BM".getBytes("US-ASCII") ++ le32(70) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
        le32(16) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
        px.slice(0, 6) ++ Array[Byte](0, 0) ++ // bottom row + pad
        px.slice(6, 12) ++ Array[Byte](0, 0)   // top row + pad
    }

    /** REAL nearest-neighbor resize of a 24-bit uncompressed BMP to
      * newW × newH — source pixel for output (x, y) is
      * (x·srcW/newW, y·srcH/newH), the standard NN mapping. Emits a VALID
      * BMP payload (54-byte headers, rows padded to 4 bytes), so the result
      * feeds straight back into [[bmp24]] or another resize — payload
      * transforms compose. Same loud-failure contract as the decoders. */
    def resizeBmp24(payload: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
      require(newW > 0 && newH > 0, s"bad target dimensions ${newW}x$newH")
      require(payload.length >= 54 &&
        payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
        "not a BMP payload")
      val pixelOff = i32(payload, 10)
      val srcW = i32(payload, 18)
      val srcH = i32(payload, 22)
      val bpp = u16(payload, 28)
      val compression = i32(payload, 30)
      require(bpp == 24 && compression == 0,
        s"only 24-bit uncompressed BMP supported (bpp=$bpp comp=$compression)")
      require(srcW > 0 && srcH > 0, s"bad dimensions ${srcW}x$srcH")
      val srcRow = (((24L * srcW + 31) / 32) * 4).toInt
      require(pixelOff >= 0 &&
        payload.length >= pixelOff + ((24L * srcW + 31) / 32) * 4 * srcH,
        "truncated pixels")
      val dstRowL = ((24L * newW + 31) / 32) * 4
      require(54 + dstRowL * newH <= Int.MaxValue,
        s"target too large: ${newW}x$newH")
      val dstRow = dstRowL.toInt
      val out = new Array[Byte](54 + dstRow * newH)
      // file header + 40-byte DIB header
      System.arraycopy("BM".getBytes("US-ASCII"), 0, out, 0, 2)
      System.arraycopy(le32(out.length), 0, out, 2, 4)
      System.arraycopy(le32(54), 0, out, 10, 4)
      System.arraycopy(le32(40), 0, out, 14, 4)
      System.arraycopy(le32(newW), 0, out, 18, 4)
      System.arraycopy(le32(newH), 0, out, 22, 4)
      System.arraycopy(le16(1), 0, out, 26, 2)
      System.arraycopy(le16(24), 0, out, 28, 2)
      System.arraycopy(le32(dstRow * newH), 0, out, 34, 4)
      var y = 0
      while (y < newH) {
        val sy = (y.toLong * srcH / newH).toInt
        var x = 0
        while (x < newW) {
          val sx = (x.toLong * srcW / newW).toInt
          val sp = pixelOff + sy * srcRow + sx * 3
          val dp = 54 + y * dstRow + x * 3
          out(dp) = payload(sp)
          out(dp + 1) = payload(sp + 1)
          out(dp + 2) = payload(sp + 2)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Payload-to-payload transform stage: resize image payloads to w × h
    * (other kinds pass through untouched) — the pre-featurize normalization
    * step of an image pipeline, with the same `mapPartitions` batch shape as
    * [[extractFeatures]] so a real resampler initializes once per task.
    * Output schema == input schema, so stages chain:
    * `extractFeatures(resizeImages(media, 64, 64))`. */
  def resizeImages(media: DataFrame, w: Int, h: Int,
                   resize: (Array[Byte], Int, Int) => Array[Byte] =
                     Decoders.resizeBmp24): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        if (r.kind == "image") MediaRecord(r.media_id, r.kind,
          resize(r.payload, w, h))
        else r
      }
    }.toDF()
  }

  /** Frame/segment sampling stub: deterministic every-nth-byte "frames" of a
    * payload — the unpivot-like row multiplier a video pipeline needs (one
    * row per sampled frame), with real Spark semantics. */
  def sampleFrames(media: DataFrame, everyN: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      r.payload.indices.by(everyN).map { off =>
        (r.media_id, r.kind, off.toLong, r.payload(off) & 0xff)
      }
    }.toDF("media_id", "kind", "frame_offset", "frame_value")
  }
}
