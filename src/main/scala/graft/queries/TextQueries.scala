package graft.queries

import org.apache.spark.sql.Column
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

  /** Shared BM25 scorer for tq_bm25 / tq_bm25_topk: per-doc term
    * frequencies + ONE broadcast 1-row corpus-stats aggregate, returning
    * doc_id, dl, tf1-tf3 and the UNROUNDED double score as `raw`. Exposed
    * package-wide so Bm25BoundarySpec can assert the rounding-boundary
    * margin on the raw scores (ADVICE r13: ln() is not correctly-rounded
    * IEEE, so a sub-ulp cross-engine difference at a .00005 boundary could
    * flip the rendered 4-decimal score and with it the top-20 cut; the
    * spec pins that no corpus score sits near a boundary at any SF).
    */
  private[graft] def bm25Scored(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    def tfl(t: String) =
      size(filter(toks, x => x === t)).cast(LongType)
    val base = Tables.documents(s, d).select(
      col("doc_id"),
      size(toks).cast(LongType).as("dl"),
      tfl("spark").as("tf1"), tfl("join").as("tf2"), tfl("the").as("tf3"))
    val stats = base.agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("sumdl"),
      sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
      sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2"),
      sum(when(col("tf3") > 0, 1L).otherwise(0L)).as("df3"))
    def d2(c: Column) = c.cast(DoubleType)
    def part(tfc: Column, dfc: Column) =
      log((d2(col("n") - dfc) + lit(0.5)) / (d2(dfc) + lit(0.5)) + lit(1.0)) *
        (d2(tfc) * lit(2.2) / (d2(tfc) + lit(1.2) *
          (lit(0.25) + lit(0.75) * d2(col("dl")) /
            (d2(col("sumdl")) / d2(col("n"))))))
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"),
        col("tf1"), col("tf2"), col("tf3"),
        (part(col("tf1"), col("df1"))
          + part(col("tf2"), col("df2"))
          + part(col("tf3"), col("df3"))).as("raw"))
  }

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
    ),
    Q(
      "tq_dup_ngram_frac",
      "Gopher-style intra-document repetition gate: per document, the " +
        "fraction of 3-gram instances belonging to a DUPLICATED 3-gram " +
        "(Rae et al. 2021 'duplicate n-gram fraction' family; complements " +
        "tq_top_word_ratio's most-common-word gate). The Spark side is a " +
        "pure zero-shuffle projection over SORTED per-doc gram arrays: " +
        "with e = adjacent-equal pairs and r = runs of length ≥ 2, the " +
        "duplicated-instance count is exactly e + r (a run of k equal " +
        "grams has k-1 adjacent-equal pairs and contributes k = (k-1)+1 " +
        "instances). r19: the r13-era HOF pipeline (shifted-slice zip_with " +
        "grams, comparator array_sort, aggregate fold) is replaced by the " +
        "native DupNgramStats expression — HOFs never enter whole-stage " +
        "codegen and re-evaluate per reference, so the old form paid ~6 " +
        "split(text) evaluations plus an interpreted O(n log n) sort plus " +
        "an interpreted fold per row. The expression tokenizes once " +
        "(byte-scan identical to split-on-space, differentially pinned in " +
        "TextGateExpressionsSpec) and hash-counts gram slices of the " +
        "original text bytes; sum of counts >= 2 is the same e+r " +
        "statistic. The oracle is the independent explode → groupBy(doc, " +
        "gram) → re-aggregate construction, so the differential crosses " +
        "two implementations, not just two engines. At 100 TB the " +
        "projection form shuffles nothing; the explode form would shuffle " +
        "the corpus.",
      (s, d) => {
        import graft.expressions.TextGateExpressions.dupNgramStats
        Tables.documents(s, d)
          .where(size(toks) >= 3)
          // two-stage select: the stats struct is non-cheap and referenced
          // twice downstream, so CollapseProject (SPARK-36718) keeps the
          // boundary and the tokenize-and-count runs ONCE per row
          .select(col("doc_id"), dupNgramStats(col("text")).as("st"))
          .select(
            col("doc_id"),
            col("st").getField("n_grams").as("n_grams"),
            col("st").getField("dup_grams").as("dup_grams"))
          .select(
            col("doc_id"), col("n_grams"), col("dup_grams"),
            round(col("dup_grams").cast(DoubleType)
              / col("n_grams").cast(DoubleType), 4).as("dup_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
             |  WHERE len(string_split(text, ' ')) >= 3
             |), grams AS (
             |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
             |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
             |), counts AS (
             |  SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g
             |), agg AS (
             |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
             |    CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_grams
             |  FROM counts GROUP BY doc_id)
             |SELECT doc_id, n_grams, dup_grams,
             |  floor((CAST(dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE))
             |    * 10000 + 0.5) / 10000 AS dup_frac
             |FROM agg ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "tq_bm25",
      "BM25 ranked retrieval over documents against a fixed query-term set " +
        "{spark, join, the} (k1=1.2, b=0.75) — the lexical-relevance scorer " +
        "a training-data curation pipeline uses to pull topical documents " +
        "from a web corpus. Per-doc term frequencies and lengths are one " +
        "codegen'd projection; the corpus statistics (N, Σdl, per-term df) " +
        "are ONE 1-row aggregate broadcast back over the corpus — two scans " +
        "and zero shuffles of the corpus itself, linear at any size. Every " +
        "input to the score is an exact integer, the expression tree is " +
        "written op-for-op identically on both sides (one division for " +
        "avgdl, left-assoc sums), and ln() is the only non-correctly-" +
        "rounded IEEE op — absorbed by the Canon 4-decimal rounding (the " +
        "three-SF oracle runs pin it on the real corpus).",
      (s, d) =>
        bm25Scored(s, d)
          .select(col("doc_id"), col("dl"),
            col("tf1").as("tf_spark"), col("tf2").as("tf_join"),
            col("tf3").as("tf_the"),
            round(col("raw"), 4).as("bm25"))
          .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS BIGINT) AS tf1,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'join')) AS BIGINT) AS tf2,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'the')) AS BIGINT) AS tf3
             |  FROM documents),
             |st AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
             |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
             |    CAST(sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df3
             |  FROM d)
             |SELECT doc_id, dl, tf1 AS tf_spark, tf2 AS tf_join, tf3 AS tf_the,
             |  floor((
             |    ln((CAST(n - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5) + 1.0) * (CAST(tf1 AS DOUBLE) * 2.2 / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
             |  + ln((CAST(n - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5) + 1.0) * (CAST(tf2 AS DOUBLE) * 2.2 / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
             |  + ln((CAST(n - df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5) + 1.0) * (CAST(tf3 AS DOUBLE) * 2.2 / (CAST(tf3 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
             |  ) * 10000 + 0.5) / 10000 AS bm25
             |FROM d, st ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "tq_bm25_topk",
      "Top-20 documents by the tq_bm25 score — the retrieval form (ORDER BY " +
        "a computed float ranking DESC with a unique-key tiebreak, so the " +
        "cut is deterministic: both engines compare the SAME rounded score, " +
        "and equal scores order by doc_id). At scale this is a top-k over " +
        "the scored projection — Spark's TakeOrderedAndProject, no global " +
        "sort materialization.",
      (s, d) =>
        bm25Scored(s, d)
          .select(col("doc_id"), round(col("raw"), 4).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id").asc)
          .limit(20),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS BIGINT) AS tf1,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'join')) AS BIGINT) AS tf2,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'the')) AS BIGINT) AS tf3
             |  FROM documents),
             |st AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
             |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
             |    CAST(sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df3
             |  FROM d)
             |SELECT doc_id,
             |  floor((
             |    ln((CAST(n - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5) + 1.0) * (CAST(tf1 AS DOUBLE) * 2.2 / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
             |  + ln((CAST(n - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5) + 1.0) * (CAST(tf2 AS DOUBLE) * 2.2 / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
             |  + ln((CAST(n - df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5) + 1.0) * (CAST(tf3 AS DOUBLE) * 2.2 / (CAST(tf3 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
             |  ) * 10000 + 0.5) / 10000 AS bm25
             |FROM d, st ORDER BY bm25 DESC NULLS LAST, doc_id ASC LIMIT 20""".stripMargin)
    ),
    Q(
      "tq_unigram_llk",
      "TQ9: corpus-unigram log-likelihood quality score (the CCNet-style " +
        "LM filter: documents whose tokens are improbable under the " +
        "corpus's own unigram model score high cross-entropy and get " +
        "culled). Determinism shape: ln() is taken ONCE per distinct " +
        "vocabulary count and immediately quantized to exact integer " +
        "micro-nats — floor(ln(cnt)·1e6) AS BIGINT — so every per-document " +
        "accumulation is an INTEGER sum (order-free, engine-identical; the " +
        "x15/x20 rule: never accumulate floats across rows). The final " +
        "per-token average is one correctly-rounded divide of two exact " +
        "integers, bit-identical cross-engine; Tq9BoundarySpec pins that " +
        "no ln(cnt)·1e6 sits within 1e-6 of an integer at any SF, so no " +
        "achievable cross-engine ln() ulp can flip a floor. Scale: two " +
        "token-stream shuffles (vocab build, per-doc aggregate) + one " +
        "vocabulary equality join (AQE-broadcast at tested SFs, shuffled " +
        "hash at web scale) + a 1-row broadcast total — linear, no " +
        "all-pairs, no driver collect.",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("token"))
        val vocab = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
        val vl = vocab.select(col("token"),
          floor(log(col("cnt").cast(DoubleType)) * 1000000).cast(LongType)
            .as("lmicro"))
        val tot = vocab.agg(
          floor(log(sum(col("cnt")).cast(DoubleType)) * 1000000)
            .cast(LongType).as("ltot"))
        tok.join(vl, "token")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("dl"), sum(col("lmicro")).as("lsum"))
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("dl"),
            (col("dl") * col("ltot") - col("lsum")).as("xent_micro"),
            round((col("dl") * col("ltot") - col("lsum")).cast(DoubleType)
              / (col("dl").cast(DoubleType) * lit(1000000.0)), 4).as("xent"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
             |vocab AS (
             |  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
             |vl AS (
             |  SELECT token, CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT) AS lmicro
             |  FROM vocab),
             |tot AS (
             |  SELECT CAST(floor(ln(CAST(sum(cnt) AS DOUBLE)) * 1000000) AS BIGINT) AS ltot
             |  FROM vocab),
             |agg AS (
             |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS dl,
             |    CAST(sum(v.lmicro) AS BIGINT) AS lsum
             |  FROM tok t JOIN vl v USING (token) GROUP BY t.doc_id)
             |SELECT doc_id, dl, CAST(dl * ltot - lsum AS BIGINT) AS xent_micro,
             |  floor((CAST(dl * ltot - lsum AS DOUBLE)
             |    / (CAST(dl AS DOUBLE) * 1000000.0)) * 10000 + 0.5) / 10000 AS xent
             |FROM agg, tot ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "tq_gopher_gates",
      "TQ10: Gopher document-level gates (Rae et al. 2021 'Scaling " +
        "Language Models', table A1): word count in [50, 100000], mean " +
        "word length in [3, 10], symbol-to-word ratio <= 0.1 for '#' and " +
        "for ellipsis EACH (the paper applies the threshold per symbol — " +
        "'either the hash symbol or the ellipsis'; ellipses counted as " +
        "'.'-runs of length >= 3, so '......' is ONE ellipsis), and >= " +
        "80% of words containing an alphabetic character. Every gate " +
        "BOOLEAN is computed by INTEGER cross-multiplication (3n <= chars " +
        "<= 10n, 10*hashes <= words AND 10*ellipses <= words, 5*alpha >= " +
        "4*words) — no float compare can diverge cross-engine; the " +
        "rounded DOUBLE ratios ride beside them for inspection only. " +
        "Zero-shuffle per-document projection; the only exchange is the " +
        "output sort.",
      (s, d) => {
        val nW = size(toks).cast(LongType)
        // total word chars = text minus separators (single-space corpus)
        val chars = length(regexp_replace(col("text"), " ", "")).cast(LongType)
        val hashes = (length(col("text"))
          - length(regexp_replace(col("text"), "#", ""))).cast(LongType)
        val ellipses = regexp_count(col("text"), lit("\\.{3,}")).cast(LongType)
        val alphaW = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast(LongType)
        Tables.documents(s, d).select(
          col("doc_id"), nW.as("n_words"),
          round(chars.cast(DoubleType) / nW.cast(DoubleType), 4).as("mean_word_len"),
          round(hashes.cast(DoubleType) / nW.cast(DoubleType), 4).as("hash_ratio"),
          round(ellipses.cast(DoubleType) / nW.cast(DoubleType), 4).as("ellipsis_ratio"),
          round(alphaW.cast(DoubleType) / nW.cast(DoubleType), 4).as("alpha_frac"),
          (nW >= 50 && nW <= 100000).as("pass_word_count"),
          (chars >= lit(3L) * nW && chars <= lit(10L) * nW).as("pass_mean_len"),
          (lit(10L) * hashes <= nW && lit(10L) * ellipses <= nW).as("pass_symbol"),
          (lit(5L) * alphaW >= lit(4L) * nW).as("pass_alpha"),
          (nW >= 50 && nW <= 100000 &&
            chars >= lit(3L) * nW && chars <= lit(10L) * nW &&
            lit(10L) * hashes <= nW && lit(10L) * ellipses <= nW &&
            lit(5L) * alphaW >= lit(4L) * nW).as("pass_all")
        ).orderBy("doc_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars,
             |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hashes,
             |    CAST(len(regexp_extract_all(text, '\.{3,}')) AS BIGINT) AS ellipses,
             |    CAST(len(list_filter(string_split(text, ' '),
             |      t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS alpha_w
             |  FROM documents)
             |SELECT doc_id, n_words,
             |  floor((CAST(chars AS DOUBLE) / CAST(n_words AS DOUBLE)) * 10000 + 0.5) / 10000 AS mean_word_len,
             |  floor((CAST(hashes AS DOUBLE) / CAST(n_words AS DOUBLE)) * 10000 + 0.5) / 10000 AS hash_ratio,
             |  floor((CAST(ellipses AS DOUBLE) / CAST(n_words AS DOUBLE)) * 10000 + 0.5) / 10000 AS ellipsis_ratio,
             |  floor((CAST(alpha_w AS DOUBLE) / CAST(n_words AS DOUBLE)) * 10000 + 0.5) / 10000 AS alpha_frac,
             |  (n_words >= 50 AND n_words <= 100000) AS pass_word_count,
             |  (chars >= 3 * n_words AND chars <= 10 * n_words) AS pass_mean_len,
             |  (10 * hashes <= n_words AND 10 * ellipses <= n_words) AS pass_symbol,
             |  (5 * alpha_w >= 4 * n_words) AS pass_alpha,
             |  (n_words >= 50 AND n_words <= 100000
             |    AND chars >= 3 * n_words AND chars <= 10 * n_words
             |    AND 10 * hashes <= n_words AND 10 * ellipses <= n_words
             |    AND 5 * alpha_w >= 4 * n_words) AS pass_all
             |FROM m ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "tq_stopword_gate",
      "TQ11: Gopher stopword gate — a document passes when it contains at " +
        "least 2 DISTINCT members of the published 8-stopword list (the, " +
        "be, to, of, and, that, have, with — thresholds kept EXACTLY as " +
        "published, not tuned to the corpus: the synthetic vocabulary " +
        "carries only 'the' from the list, so every document fails the " +
        "gate at every SF while n_stopwords (0/1) and the stopword-token " +
        "fraction vary and carry the oracle comparison). The distinct-" +
        "member count and gate are pure integer/set operations (exact " +
        "cross-engine); only the display fraction rounds. Zero-shuffle " +
        "per-document projection plus the output sort. r19: the three " +
        "independent token statistics (each re-splitting the document — " +
        "the filter() HOF is interpreted and blocks subexpression " +
        "elimination) are now ONE native StopwordStats pass; tokenization " +
        "parity with split-on-space is differentially pinned in " +
        "TextGateExpressionsSpec.",
      (s, d) => {
        import graft.expressions.TextGateExpressions.stopwordStats
        val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
        Tables.documents(s, d)
          .select(col("doc_id"),
            stopwordStats(col("text"), stops).as("st"))
          .select(
            col("doc_id"),
            col("st").getField("n_words").as("n_words"),
            col("st").getField("n_stopwords").as("n_stopwords"),
            round(col("st").getField("stop_tokens").cast(DoubleType)
              / col("st").getField("n_words").cast(DoubleType), 4).as("stop_frac"),
            (col("st").getField("n_stopwords") >= 2).as("pass_stopwords"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             |  CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
             |    ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stopwords,
             |  floor((CAST(len(list_filter(string_split(text, ' '),
             |      t -> t IN ('the','be','to','of','and','that','have','with'))) AS DOUBLE)
             |    / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 10000 + 0.5) / 10000 AS stop_frac,
             |  (len(list_intersect(list_distinct(string_split(text, ' ')),
             |    ['the','be','to','of','and','that','have','with'])) >= 2) AS pass_stopwords
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "x21_gopher_prep",
      "Composed Gopher corpus-prep pipeline: the TQ10 gate conjunction as " +
        "a corpus FILTER (word count, mean word length, symbol ratio, " +
        "alpha fraction — the same integer cross-multiplied forms) -> " +
        "per-language survivor stats (doc count, total words, corpus mean " +
        "word length from exact integer sums). The end-to-end shape of a " +
        "published-gate quality pass over a 100 TB corpus: one codegen'd " +
        "scan-filter (no gate needs a shuffle), one partial+final hash " +
        "aggregate at language cardinality.",
      (s, d) => {
        val nW = size(toks).cast(LongType)
        val chars = length(regexp_replace(col("text"), " ", "")).cast(LongType)
        val hashes = (length(col("text"))
          - length(regexp_replace(col("text"), "#", ""))).cast(LongType)
        val ellipses = regexp_count(col("text"), lit("\\.{3,}")).cast(LongType)
        val alphaW = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast(LongType)
        Tables.documents(s, d)
          .where(nW >= 50 && nW <= 100000 &&
            chars >= lit(3L) * nW && chars <= lit(10L) * nW &&
            lit(10L) * hashes <= nW && lit(10L) * ellipses <= nW &&
            lit(5L) * alphaW >= lit(4L) * nW)
          .select(col("lang"), nW.as("n_words"), chars.as("chars"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_words")).as("total_words"),
            round(sum(col("chars")).cast(DoubleType)
              / sum(col("n_words")).cast(DoubleType), 4).as("mean_word_len"))
          .orderBy("lang")
      },
      Some("""WITH m AS (
             |  SELECT lang,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars,
             |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hashes,
             |    CAST(len(regexp_extract_all(text, '\.{3,}')) AS BIGINT) AS ellipses,
             |    CAST(len(list_filter(string_split(text, ' '),
             |      t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS alpha_w
             |  FROM documents)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(n_words) AS BIGINT) AS total_words,
             |  floor((CAST(sum(chars) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE))
             |    * 10000 + 0.5) / 10000 AS mean_word_len
             |FROM m
             |WHERE n_words >= 50 AND n_words <= 100000
             |  AND chars >= 3 * n_words AND chars <= 10 * n_words
             |  AND 10 * hashes <= n_words AND 10 * ellipses <= n_words
             |  AND 5 * alpha_w >= 4 * n_words
             |GROUP BY lang ORDER BY lang""".stripMargin)
    )
  )
}
