package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extract as per-partition batch functions.
  *
  * The Spark-side shape is the real thing — schema (payload binary + meta
  * struct), partition-parallel decode via `mapPartitions` on a typed Dataset,
  * batch-at-a-time processing — while the codec itself is a STUB (this
  * container has no image/audio libraries): `StubDecoder.decode` produces
  * deterministic fake features from the bytes. Swapping in a real decoder
  * changes one function, not the pipeline.
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
                           width: Int, height: Int, checksum: Long)

  /** STUB decoder — deterministic fake "decode" standing in for an image/
    * audio codec. Real implementation would parse payload headers.
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Long) = {
      val w = if (payload.isEmpty) 0 else 16 + (payload(0) & 0x3f)
      val h = if (payload.length < 2) 0 else 16 + (payload(1) & 0x3f)
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
      (w, h, sum)
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
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"),
        col("meta.mime").as("mime"), col("meta.n_bytes").as("n_bytes"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, sum) = StubDecoder.decode(r.payload)
          MediaFeatures(r.doc_id, r.mime, r.n_bytes, w, h, sum)
        }
      }
  }

  case class ResizedMedia(doc_id: Long, target_w: Int, target_h: Int,
                          out_bytes: Long, sample_checksum: Long)

  /** STUB resize: a real codec would decode, scale to (targetW, targetH) and
    * re-encode; the stub derives the output size from the scale factor and a
    * checksum from stride-sampled input bytes (the access pattern a sampling
    * rescaler has). Pipeline shape — typed mapPartitions, payload column
    * pruned immediately after — is the production one.
    */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"),
        col("meta.mime").as("mime"), col("meta.n_bytes").as("n_bytes"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, _) = StubDecoder.decode(r.payload)
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
