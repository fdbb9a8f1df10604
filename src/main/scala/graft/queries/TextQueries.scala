package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.Tables

/** Text-analysis operators over `documents` (SURVEY §2.11 X4 + the
  * training-data-pipeline text suite: quality scoring, language ID, token
  * counting, fingerprinting). All pure built-in expressions — tokenization is
  * `split`, folds are `aggregate`/`transform` HOFs — so the whole path is
  * codegen'd and embarrassingly parallel: per-document work with zero
  * shuffles except the final aggregations/sorts.
  */
object TextQueries {

  private val toks = split(col("text"), " ")

  val defs: Seq[Q] = Seq(
    Q(
      "x4_token_freq",
      "Tokenize + global token frequencies (explode → groupBy → count). " +
        "Map-side partial aggregation keeps the shuffle at vocabulary size, " +
        "not corpus size.",
      (s, d) => {
        Tables.documents(s, d)
          .select(explode(toks).as("token"))
          .filter(col("token") =!= "")
          .groupBy("token").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("token").asc)
          .limit(50)
          .orderBy(col("cnt").desc, col("token").asc)
      },
      Some("""SELECT token, count(*) AS cnt FROM (
             |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
             |WHERE token <> '' GROUP BY token
             |ORDER BY cnt DESC NULLS LAST, token ASC LIMIT 50""".stripMargin)
    ),
    Q(
      "tq_quality_score",
      "Per-document quality metrics: token count, average token length, " +
        "stopword ratio, unique-token ratio — the standard cheap pre-filter " +
        "stage of a training-data pipeline.",
      (s, d) => {
        val nTok = size(toks)
        Tables.documents(s, d).select(
          col("doc_id"),
          nTok.cast(LongType).as("n_tokens"),
          round(length(regexp_replace(col("text"), " ", "")).cast(DoubleType)
            / nTok.cast(DoubleType), 4).as("avg_token_len"),
          round(size(filter(toks, t => t.isin("a", "the"))).cast(DoubleType)
            / nTok.cast(DoubleType), 4).as("stopword_ratio"),
          round(size(array_distinct(toks)).cast(DoubleType)
            / nTok.cast(DoubleType), 4).as("unique_ratio")
        ).orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |  floor((CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
             |    / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 10000 + 0.5) / 10000 AS avg_token_len,
             |  floor((CAST(len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the'))) AS DOUBLE)
             |    / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 10000 + 0.5) / 10000 AS stopword_ratio,
             |  floor((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             |    / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 10000 + 0.5) / 10000 AS unique_ratio
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "tq_lang_id",
      "Marker-token language heuristic (n-gram-profile LangID lives in " +
        "graft.text.LangId; this is the SQL-expressible marker variant the " +
        "oracle can check) plus agreement with the labeled lang column.",
      (s, d) => {
        val enMarkers = size(filter(toks, t => t.isin("the", "a")))
        Tables.documents(s, d).select(
          col("doc_id"), col("lang"),
          when(enMarkers > 0, "en").otherwise("unk").as("predicted"),
          (when(enMarkers > 0, "en").otherwise("unk") === col("lang")).as("agrees")
        ).orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
             |  CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) > 0
             |       THEN 'en' ELSE 'unk' END AS predicted,
             |  (CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) > 0
             |        THEN 'en' ELSE 'unk' END) = lang AS agrees
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "tq_token_count",
      "Token counting two ways: whitespace split vs a BPE-ish regex token " +
        "class — the divergence between them is itself a quality signal.",
      (s, d) => {
        Tables.documents(s, d).select(
          col("doc_id"),
          size(toks).cast(LongType).as("ws_tokens"),
          regexp_count(col("text"), lit("[a-z0-9]+")).cast(LongType).as("re_tokens")
        ).orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS re_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "tq_fingerprint",
      "Order-sensitive document fingerprint: a rolling polynomial hash over " +
        "the token stream, folded sequentially with `aggregate` (DuckDB " +
        "list_reduce matches the sequence exactly). Integer arithmetic mod " +
        "1e9+7 → engine-independent.",
      (s, d) => {
        val tokenVals = transform(toks,
          t => (ascii(substring(t, 1, 1)) * 7 + length(t)).cast(LongType))
        Tables.documents(s, d).select(
          col("doc_id"),
          aggregate(tokenVals, lit(0L),
            (h, v) => (h * 131 + v) % 1000000007L).as("fingerprint")
        ).orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_transform(string_split(text, ' '),
             |      t -> CAST(ascii(substr(t, 1, 1)) * 7 + length(t) AS BIGINT)),
             |    (h, v) -> (h * 131 + v) % 1000000007) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin)
    )
  )
}
