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
