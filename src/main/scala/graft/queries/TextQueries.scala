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
      "tq_top_word_ratio",
      "Gopher-style repetition filter: the share of a document taken by its " +
        "single most frequent token (docs dominated by one token are " +
        "boilerplate/spam — the classic 'fraction of most common word' " +
        "quality gate). Two hash aggregations with map-side partials — " +
        "shuffle is O(doc × distinct-token), never a window or sort.",
      (s, d) => {
        val cnt = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("tok"))
          .where(col("tok") =!= "")
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        cnt.groupBy("doc_id")
          .agg(max(col("c")).as("top_count"), sum(col("c")).as("n_tokens"))
          .select(col("doc_id"), col("top_count"), col("n_tokens"),
            round(col("top_count").cast(DoubleType)
              / col("n_tokens").cast(DoubleType), 4).as("top_ratio"))
          .orderBy("doc_id")
      },
      Some("""WITH cnt AS (
             |  SELECT doc_id, tok, count(*) AS c FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |    FROM documents) t
             |  WHERE tok <> '' GROUP BY doc_id, tok)
             |SELECT doc_id, max(c) AS top_count,
             |  CAST(sum(c) AS BIGINT) AS n_tokens,
             |  floor((CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE))
             |    * 10000 + 0.5) / 10000 AS top_ratio
             |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "tq_redact_pii",
      "PII redaction pass (C4-style scrub): email and phone patterns masked " +
        "with typed placeholders plus per-doc match counts — a pure " +
        "projection, so the scrub is codegen'd and shuffle-free at any " +
        "corpus size. The synthetic corpus has no natural PII, so " +
        "deterministic contact strings are appended in-query; the gated " +
        "semantics are the regex classes and GLOBAL replacement (DuckDB " +
        "needs the 'g' flag — its default replaces only the first match, " +
        "a classic silent-divergence trap).",
      (s, d) => {
        val withPii = concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast(StringType), 4, "0"))
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\+1-555-[0-9]{4}"
        Tables.documents(s, d).select(
          col("doc_id"),
          size(regexp_extract_all(withPii, lit(emailRe), lit(0)))
            .cast(LongType).as("n_emails"),
          size(regexp_extract_all(withPii, lit(phoneRe), lit(0)))
            .cast(LongType).as("n_phones"),
          regexp_replace(regexp_replace(withPii, emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("redacted"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id,
             |    text || ' contact user' || doc_id || '@example.com or +1-555-'
             |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(t,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
             |  regexp_replace(regexp_replace(t,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS redacted
             |FROM p ORDER BY doc_id""".stripMargin)
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
