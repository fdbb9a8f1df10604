package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extract as per-partition batch functions.
  *
  * The decode is REAL for the formats a pure-JVM parse covers completely —
  * PPM P6 and BMP 24bpp via [[ImageCodec]] (width/height/channel means
  * from actual pixels, resize = actual nearest-neighbor rescale +
  * re-encode). Payloads the codec does not recognize (this corpus's text
  * payloads, or any compressed format that would need an external library
  * this offline container cannot ship) fall back to [[FallbackDecoder]]'s
  * deterministic byte-derived features, flagged `decoded = false` — the
  * pipeline shape and output schema are identical either way, so swapping
  * in a JPEG codec later changes [[ImageCodec]], not the pipeline.
  *
  * Scale notes: payloads never pass through a shuffle here (decode is a pure
  * map stage); with real media, pair this with
  * `spark.sql.files.maxPartitionBytes` sizing so one partition's payload
  * batch fits executor memory, and keep features (small) separate from
  * payloads (large) so downstream joins/aggs never drag the binary column —
  * Catalyst's column pruning does this automatically once features are
  * projected out.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                           width: Int, height: Int, checksum: Long,
                           decoded: Boolean,
                           mean_r: Long, mean_g: Long, mean_b: Long)

  /** Deterministic byte-derived features for payloads [[ImageCodec]] cannot
    * parse — keeps non-image payloads flowing through the same pipeline
    * with a stable (width, height, checksum) instead of an error path.
    */
  object FallbackDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Long) = {
      val w = if (payload.isEmpty) 0 else 16 + (payload(0) & 0x3f)
      val h = if (payload.length < 2) 0 else 16 + (payload(1) & 0x3f)
      (w, h, ImageCodec.checksum(payload))
    }
  }

  /** Wrap documents as a multimodal table: text bytes stand in for an
    * encoded payload; metadata is a typed struct column.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text")).cast(LongType).as("n_bytes")).as("meta"))

  /** Partition-parallel decode: binary payload → features, batch shape
    * preserved (one iterator pass per partition, no per-row task overhead).
    * Image payloads (PPM/BMP) produce real width/height, a checksum over
    * the DECODED RGB pixels, and integer channel means (×1000, floored);
    * everything else takes the fallback path with `decoded = false`.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"),
        col("meta.mime").as("mime"), col("meta.n_bytes").as("n_bytes"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          ImageCodec.decode(r.payload) match {
            case Some(img) =>
              val (mr, mg, mb) = ImageCodec.channelMeansMilli(img)
              MediaFeatures(r.doc_id, r.mime, r.n_bytes,
                img.width, img.height, ImageCodec.checksum(img.rgb),
                decoded = true, mr, mg, mb)
            case None =>
              val (w, h, sum) = FallbackDecoder.decode(r.payload)
              MediaFeatures(r.doc_id, r.mime, r.n_bytes, w, h, sum,
                decoded = false, 0L, 0L, 0L)
          }
        }
      }
  }

  case class ResizedMedia(doc_id: Long, target_w: Int, target_h: Int,
                          out_bytes: Long, sample_checksum: Long)

  /** Resize: image payloads are ACTUALLY rescaled — decode, nearest-
    * neighbor to (targetW, targetH), re-encode as PPM P6 — so `out_bytes`
    * is the real encoded length and `sample_checksum` hashes the real
    * output bytes. Non-image payloads keep the deterministic stub
    * derivation (scale-factor size + stride-sampled checksum, the access
    * pattern a sampling rescaler has). Pipeline shape — typed
    * mapPartitions, payload column pruned immediately after — is the
    * production one for both paths.
    */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"),
        col("meta.mime").as("mime"), col("meta.n_bytes").as("n_bytes"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          ImageCodec.decode(r.payload) match {
            case Some(img) =>
              val out = ImageCodec.encodePpm(
                ImageCodec.resizeNearest(img, targetW, targetH))
              ResizedMedia(r.doc_id, targetW, targetH,
                out.length.toLong, ImageCodec.checksum(out))
            case None =>
              val (w, h, _) = FallbackDecoder.decode(r.payload)
              val scale = if (w * h == 0) 0.0
                          else (targetW.toLong * targetH).toDouble / (w.toLong * h)
              val stride = math.max(1, r.payload.length / (targetW * targetH / 64 + 1))
              var sum = 0L
              var i = 0
              while (i < r.payload.length) { sum = sum * 31 + (r.payload(i) & 0xff); i += stride }
              ResizedMedia(r.doc_id, targetW, targetH,
                math.round(r.payload.length * scale), sum)
          }
        }
      }
  }

  /** Frame sampling: treat the payload as fixed-size frames, keep every
    * `stride`-th frame. Defined on the UTF-8 text payload with character
    * frames so the semantics are engine-independent (oracle-checkable via
    * substring arithmetic); a video codec slots into the same exploded
    * (doc_id, frame_idx, frame) shape. Row-generating narrow stage — the
    * Spark plan is a Generate, no shuffle until presentation.
    */
  def sampleFrames(docs: DataFrame, frameChars: Int, stride: Int): DataFrame = {
    val nFrames = greatest(
      ceil(length(col("text")).cast(DoubleType) / frameChars).cast(IntegerType),
      lit(1))
    docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(0), nFrames - 1)).as("frame_idx"))
      .where(pmod(col("frame_idx"), lit(stride)) === 0)
      .select(col("doc_id"), col("frame_idx").cast(LongType).as("frame_idx"),
        col("text").substr(col("frame_idx") * frameChars + 1, lit(frameChars)).as("frame"))
  }
}
