package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column suite (SURVEY §2.11 X5 + binary-payload plumbing). */
object MultimodalQueries {

  val defs: Seq[Q] = Seq(
    Q(
      "x5_json_struct",
      "Parse events.props JSON into a typed struct with from_json + schema " +
        "(the typed-metadata half of the multimodal column pattern).",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_id"),
            from_json(col("props"), StructType(Seq(StructField("k", LongType)))).as("parsed"))
          .select(col("event_id"), col("parsed.k").as("k_val"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  TRY_CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS BIGINT) AS k_val
             |FROM events ORDER BY event_id""".stripMargin)
    ),
    Q(
      "mm_binary_meta",
      "Opaque binary payload + metadata: byte length (UTF-8) and first byte " +
        "of the payload — the schema/partitioning half of the multimodal " +
        "pattern, oracle-checked.",
      (s, d) => {
        Tables.documents(s, d).select(
          col("doc_id"),
          octet_length(col("text")).cast(LongType).as("n_bytes"),
          ascii(substring(col("text"), 1, 1)).cast(LongType).as("first_byte")
        ).orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "mm_decode_features",
      "Binary decode → feature extraction via typed mapPartitions. The " +
        "codec is REAL for PPM/BMP payloads (ImageCodec: header+pixel " +
        "parse, channel means from actual pixels — fixture-verified in " +
        "MultimodalSpec); this corpus's text payloads take the " +
        "deterministic byte-derived fallback, flagged decoded=false. " +
        "Rows-only check; determinism asserted in MultimodalSpec.",
      (s, d) => {
        val media = Multimodal.asMediaTable(Tables.documents(s, d))
        Multimodal.extractFeatures(s, media).toDF().orderBy("doc_id")
      },
      None
    ),
    Q(
      "mm_resize",
      "Resize to 32x32 through the typed mapPartitions pipeline (payload " +
        "pruned right after decode — the binary column never reaches a " +
        "shuffle). Image payloads get a REAL nearest-neighbor rescale + " +
        "PPM re-encode (ImageCodec); text payloads keep the deterministic " +
        "scale-derived stub. Rows-only check; determinism asserted in " +
        "MultimodalSpec.",
      (s, d) => {
        val media = Multimodal.asMediaTable(Tables.documents(s, d))
        Multimodal.resize(s, media, targetW = 32, targetH = 32)
          .toDF().orderBy("doc_id")
      },
      None
    ),
    Q(
      "mm_frame_sample",
      "Frame sampling: 64-char frames, every 4th kept — the exploded " +
        "(doc_id, frame_idx, frame) shape a video frame-sampler produces, " +
        "defined on character frames so DuckDB reproduces it exactly.",
      (s, d) => Multimodal.sampleFrames(Tables.documents(s, d),
          frameChars = 64, stride = 4)
        .orderBy("doc_id", "frame_idx"),
      Some("""SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
             |  substr(text, CAST(f * 64 + 1 AS INT), 64) AS frame
             |FROM (SELECT doc_id, text,
             |        unnest(range(0, greatest(CAST(ceil(len(text) / 64.0) AS BIGINT), 1))) AS f
             |      FROM documents)
             |WHERE f % 4 = 0 ORDER BY doc_id, frame_idx""".stripMargin)
    )
  )
}
