package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.Tables
import graft.dedup.{MinHash, SimHash}

/** Deduplication suite over `documents` (SURVEY §2.11 X1/X2 + the
  * training-data-pipeline dedup set: exact, n-gram Jaccard, MinHash+LSH,
  * SimHash).
  *
  * Scale doctrine: exact all-pairs n-gram Jaccard (dd_ngram_jaccard) is the
  * *verification baseline* — its shingle self-join is only safe at small
  * corpus size. The production path at 100 TB is x2_minhash_lsh: candidate
  * pairs come from an equality join on LSH band signatures, cost
  * O(candidates) not O(n²).
  */
object DedupQueries {

  /** All document pairs with their exact 3-gram Jaccard similarity, via the
    * distinct-shingle self-join. Shingling is one typed pass: the HOF form
    * (transform+element_at over split(text)) re-tokenizes per nested lambda
    * after CollapseProject inlining — measured 14s of wall time at sf0.1.
    * Shared by dd_ngram_jaccard (top-20 pairs) and dd_cluster (edges for
    * connected components).
    */
  // One persisted shingle table per (session, corpus dir), shared by every
  // consumer (the self-join's two sides, the counts, and both
  // dd_ngram_jaccard and dd_cluster) — repeated query builds must reuse the
  // SAME cached blocks, not stack a new persisted copy per invocation.
  // Bounded LRU: corpora beyond the cap unpersist the oldest entry.
  private val shingleCache = new graft.util.PersistedTableCache(maxEntries = 4)

  def ngramJaccardPairs(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // MEMORY_AND_DISK (cache default) so a 100 TB shingle set spills instead
    // of OOMing; ~|docs|·|shingles| rows, far smaller than the candidate
    // join it feeds.
    val sh = shingleCache.getOrElseUpdate(s, d)(Tables.documents(s, d)
      .select(col("doc_id").cast(LongType), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = if (text == null) Array.empty[String] else text.split(" ")
        if (t.length >= 3)
          t.sliding(3).map(_.mkString(" ")).toArray.distinct.map(s => (id, s))
        else Iterator.empty
      }
      .toDF("doc_id", "sh"))
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(cnt.select(col("doc_id"), col("n").as("na")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(cnt.select(col("doc_id"), col("n").as("nb")), col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("doc_a"), col("doc_b"),
        round(col("common").cast(DoubleType)
          / (col("na") + col("nb") - col("common")).cast(DoubleType), 4).as("jaccard"))
  }

  /** DuckDB CTE producing the same (doc_a, doc_b, jaccard) pair table. */
  val jaccardPairsSql: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |         unnest(list_distinct(list_transform(range(0, len(t) - 2),
      |           i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS sh
      |       FROM toks WHERE len(t) >= 3),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |jac AS (SELECT doc_a, doc_b,
      |          floor((CAST(common AS DOUBLE) / (ca.n + cb.n - common)) * 10000 + 0.5) / 10000 AS jaccard
      |        FROM pairs
      |          JOIN cnt ca ON doc_a = ca.doc_id
      |          JOIN cnt cb ON doc_b = cb.doc_id)""".stripMargin

  /** Connected-component labels over the >=0.2-Jaccard graph, shared by
    * dd_cluster and x17_dedup_survivorship — one cached computation per
    * (session, corpus): the label propagation is an eager multi-job loop,
    * and each consumer re-running it doubled the dedup family's cost.
    * Deliberate deviation from the cache's plan-only contract: CC's jobs
    * DO run under the cache lock — serializing concurrent builders of the
    * same labels is exactly the point (two racing CC runs would each pay
    * the full iteration cost).
    */
  private val labelCache = new graft.util.PersistedTableCache(maxEntries = 4)
  def clusterLabels(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    labelCache.getOrElseUpdate(s, "cc:" + d) {
      // size-dispatched: propagation at corpus-test scale, the large-star/
      // small-star rewrite past the edge threshold (adversarial diameters
      // and hub skew at 100 TB) — label-equivalent by property test
      graft.operators.ConnectedComponents.componentsAuto(
        ngramJaccardPairs(s, d).where(col("jaccard") >= 0.2), "doc_a", "doc_b")
    }

  /** Shared continuation: jaccard pairs → transitive closure → per-doc
    * component labels (comp.id, comp.component). One definition so
    * dd_cluster and the survivorship query can never drift.
    */
  val clusterCtesSql: String =
    s"""$jaccardPairsSql,
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM jac WHERE jaccard >= 0.2
       |          UNION SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.2),
       |reach(u, r) AS (SELECT u, u FROM (SELECT DISTINCT u FROM edges)
       |                UNION
       |                SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
       |comp AS (SELECT u AS id, min(r) AS component FROM reach GROUP BY u)""".stripMargin

  val defs: Seq[Q] = Seq(
    Q(
      "x1_exact_dedup",
      "Exact dedup on normalized text (lower/trim/collapse-spaces → " +
        "hash-groupBy). Deterministic survivor = min(doc_id).",
      (s, d) => {
        val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
        Tables.documents(s, d)
          .groupBy(norm.as("norm_text"))
          .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))
          .select(col("canonical_id"), col("n_dups"), col("norm_text"))
          .orderBy("canonical_id")
      },
      Some("""SELECT min(doc_id) AS canonical_id, count(*) AS n_dups,
             |  regexp_replace(trim(lower(text)), ' +', ' ', 'g') AS norm_text
             |FROM documents
             |GROUP BY regexp_replace(trim(lower(text)), ' +', ' ', 'g')
             |ORDER BY canonical_id""".stripMargin)
    ),
    Q(
      "dd_ngram_jaccard",
      "Exact 3-gram Jaccard similarity between document pairs via distinct-" +
        "shingle self-join (the small-corpus baseline LSH is verified " +
        "against). Top-20 pairs by similarity.",
      (s, d) => DedupQueries.ngramJaccardPairs(s, d)
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(20)
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")),
      Some(s"""WITH $jaccardPairsSql
              |SELECT doc_a, doc_b, jaccard FROM jac
              |ORDER BY jaccard DESC NULLS LAST, doc_a, doc_b LIMIT 20""".stripMargin)
    ),
    Q(
      "dd_cluster",
      "Dedup clustering: near-dup pairs (3-gram Jaccard >= 0.2) fed through " +
        "connected components — every document labeled with the min doc_id " +
        "of its cluster (the canonical survivor), singletons labeling " +
        "themselves. Pairs alone under-dedup: A~B and B~C must collapse to " +
        "one cluster even when A!~C. Oracle is a recursive-CTE transitive " +
        "closure over the same pair table.",
      (s, d) => {
        val comp = DedupQueries.clusterLabels(s, d)
        Tables.documents(s, d).select(col("doc_id"))
          .join(comp, col("doc_id") === col("id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("component"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $clusterCtesSql
              |SELECT d.doc_id, coalesce(comp.component, d.doc_id) AS component
              |FROM documents d LEFT JOIN comp ON d.doc_id = comp.id
              |ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "x17_dedup_survivorship",
      "Dedup survivorship: per near-dup cluster keep the BEST document, " +
        "not an arbitrary one — survivor = arg-max over the STRUCT ordering " +
        "(n_tokens, -doc_id): quality first, deterministic low-id " +
        "tie-break, lexicographic over native types so no packed-integer " +
        "overflow at any token count or id range. Composes the clustering " +
        "operator with a20's argmax pattern in ONE hash agg over the " +
        "labeled docs — the 'keep the longest copy' policy a training " +
        "corpus actually wants, vs dd_cluster's min-id canonical label. " +
        "(DuckDB's arg_max can't take a struct key, so the oracle computes " +
        "the same survivor by window rank — same results, different plan.)",
      (s, d) => {
        val comp = DedupQueries.clusterLabels(s, d)
        val nTok = size(split(col("text"), " ")).cast(LongType)
        val labeled = Tables.documents(s, d)
          .select(col("doc_id"), nTok.as("n_tokens"))
          .join(comp, col("doc_id") === col("id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("component"), col("doc_id")).as("component"))
        val ord = struct(col("n_tokens"), (-col("doc_id")).as("neg_id"))
        labeled.groupBy("component")
          .agg(
            max_by(col("doc_id"), ord).as("survivor"),
            max(col("n_tokens")).as("survivor_tokens"),
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"))
          .orderBy("component")
      },
      Some(s"""WITH RECURSIVE $clusterCtesSql,
              |lab AS (SELECT d.doc_id,
              |          CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
              |          coalesce(comp.component, d.doc_id) AS component
              |        FROM documents d LEFT JOIN comp ON d.doc_id = comp.id),
              |best AS (SELECT component, doc_id AS survivor FROM (
              |           SELECT component, doc_id, row_number() OVER (
              |             PARTITION BY component
              |             ORDER BY n_tokens DESC, doc_id ASC) AS rn FROM lab)
              |         WHERE rn = 1)
              |SELECT a.component, b.survivor,
              |  a.survivor_tokens, a.n_docs, a.total_tokens
              |FROM (SELECT component, max(n_tokens) AS survivor_tokens,
              |        count(*) AS n_docs,
              |        CAST(sum(n_tokens) AS BIGINT) AS total_tokens
              |      FROM lab GROUP BY component) a
              |JOIN best b ON a.component = b.component
              |ORDER BY a.component""".stripMargin)
    ),
    Q(
      "x2_minhash_lsh",
      "MinHash(32)+LSH(8 bands) near-dup candidates with exact-Jaccard " +
        "verification on candidates only — the O(candidates) scale path. " +
        "Not SQL-expressible in DuckDB (murmur3 base hash) → rows-only check; " +
        "recall vs the exact baseline is asserted in MinHashSpec.",
      (s, d) => MinHash.nearDuplicates(
        Tables.documents(s, d), "doc_id", "text", threshold = 0.2),
      None
    ),
    Q(
      "dd_cluster_lsh",
      "The 100 TB dedup-clustering path end to end: LSH band candidates -> " +
        "exact-Jaccard verify (>= 0.2) -> connected components -> every doc " +
        "labeled with its cluster's min doc_id. Identical shape to " +
        "dd_cluster but candidate generation is the O(candidates) band " +
        "join, never the all-pairs shingle self-join. Rows-only check " +
        "(murmur-based bands); DedupSpec asserts every LSH cluster refines " +
        "an exact cluster.",
      (s, d) => {
        val edges = MinHash.nearDuplicates(
          Tables.documents(s, d), "doc_id", "text", threshold = 0.2)
        val comp = graft.operators.ConnectedComponents
          .components(edges, "id_a", "id_b")
        Tables.documents(s, d).select(col("doc_id"))
          .join(comp, col("doc_id") === col("id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("component"))
          .orderBy("doc_id")
      },
      None
    ),
    Q(
      "dd_lang_sketch",
      "Per-language corpus MinHash sketch via the SignatureUnion custom " +
        "Aggregator: elementwise-min merge of per-doc signatures == the " +
        "signature of the union of their shingle sets (the MinHash " +
        "mergeability property). Fixed 32-long buffer, associative merge -> " +
        "map-side partial aggregation; the way corpus-level sketches are " +
        "maintained at 100 TB without re-reading documents. Rows-only " +
        "check; the union property and partition-independence are asserted " +
        "in DedupSpec.",
      (s, d) => {
        import s.implicits._
        val sigs = MinHash.signatures(Tables.documents(s, d), "doc_id", "text",
            shingleWidth = 3)
          .map(ds => (ds.doc_id, ds.sig.toSeq))
          .toDF("doc_id", "sig")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        val merged = org.apache.spark.sql.functions.udaf(MinHash.SignatureUnion)
        sigs.join(docs, "doc_id")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), merged(col("sig")).as("corpus_sig"))
          .select(col("lang"), col("n_docs"),
            concat_ws(":", col("corpus_sig")).as("corpus_sig"))
          .orderBy("lang")
      },
      None
    ),
    Q(
      "dd_simhash",
      "64-bit SimHash fingerprint per document via the typed mapPartitions " +
        "path (FNV-1a bit votes — NOT the xxhash64 expression form, whose " +
        "fingerprints differ). Rows-only check; bit semantics asserted in " +
        "SimHashSpec.",
      (s, d) => SimHash.simhashTable(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      None
    )
  )
}
