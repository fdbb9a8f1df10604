package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.Tables
import graft.similarity.Ann

/** Similarity-search suite over `embeddings` (SURVEY §2.11 X3 + ANN tiers).
  * The brute-force and pair queries are exact and DuckDB-checkable (the
  * oracle reproduces the identical sequential IEEE fold via list_reduce);
  * the LSH variant is the scale path with a rows-only check plus a recall
  * assertion in AnnSpec.
  */
object SimilarityQueries {

  // DuckDB fragment: sequential dot product of two 64-dim float lists.
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
  private def duckNorm(a: String): String =
    s"sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q))"

  val defs: Seq[Q] = Seq(
    Q(
      "x3_cosine_topk",
      "Exact cosine top-5 for query vectors (vec_id < 10) against the full " +
        "corpus: broadcast queries, stream the corpus, window top-k per " +
        "query — O(|q|·n), the exact-ANN baseline.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Ann.bruteForceTopK(emb.where(col("vec_id") < 10), emb, k = 5)
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
              |scored AS (
              |  SELECT qid, e.vec_id AS vid,
              |    ${duckDot("qe", "e.embedding")} / (${duckNorm("qe")} * ${duckNorm("e.embedding")}) AS cos
              |  FROM embeddings e, q WHERE e.vec_id <> qid)
              |SELECT qid, vid, floor((cos) * 10000 + 0.5) / 10000 AS cosine, rn FROM (
              |  SELECT qid, vid, cos,
              |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid ASC) AS BIGINT) AS rn
              |  FROM scored) t
              |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)
    ),
    Q(
      "sim_embedding_neardup",
      "Embedding-cosine near-duplicate pairs: top-10 most-similar (a < b) " +
        "pairs — exact all-pairs form, the verification baseline for " +
        "LSH-bucketed dedup.",
      (s, d) => Ann.allPairsTopN(Tables.embeddings(s, d), topN = 10),
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |  floor((${duckDot("a.embedding", "b.embedding")}
              |    / (${duckNorm("a.embedding")} * ${duckNorm("b.embedding")})) * 10000 + 0.5) / 10000 AS cosine
              |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              |ORDER BY cosine DESC NULLS LAST, id_a, id_b LIMIT 10""".stripMargin)
    ),
    Q(
      "sim_ann_ivf",
      "IVF approximate top-5: k-means coarse cells (seeded), margin-" +
        "adaptive probing (4 nearest cells always, margin-qualified extras " +
        "up to 6 — boundary queries buy probes, interior queries don't), " +
        "exact cosine re-rank on candidates — the inverted-file scale path " +
        "beside LSH. Rows-only check (k-means assignment isn't " +
        "DuckDB-reproducible); recall vs brute force asserted in AnnSpec.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val index = graft.similarity.Ivf.build(emb, nCells = 16)
        graft.similarity.Ivf.ivfTopKAdaptive(index, emb.where(col("vec_id") < 10), k = 5)
      },
      None
    ),
    Q(
      "sim_ann_ivf2",
      "IVF approximate top-5 through the TWO-LEVEL index (200 cells > " +
        "flatKMax) and the two-level search path: sqrt(k) top-centroid " +
        "literals per query, broadcast sub-centroid join, nProbe-nearest " +
        "sub-cells, exact cosine re-rank — the literal-bounded search " +
        "shape for SemDeDup-scale cell counts (k ~ 1e5). Rows-only check; " +
        "row-identity with the flat literal path at full top coverage is " +
        "pinned in AnnSpec.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val index = graft.similarity.Ivf.build(emb, nCells = 200)
        graft.similarity.Ivf.ivfTopKTwoLevel(index,
          emb.where(col("vec_id") < 10), k = 5)
      },
      None
    ),
    Q(
      "sim_semantic_dedup",
      "SemDeDup-style semantic deduplication: k-means cells (the IVF coarse " +
        "quantizer) + within-cell min-id survivorship at a cosine " +
        "threshold — the published middle path between exact all-pairs " +
        "(quadratic in n) and hash-based LSH dedup. Pairing cost is " +
        "bounded by cell size; the only shuffle is the cell-id equality " +
        "join. Cell count is derived from the corpus size (constant target " +
        "cell size, the published posture — total pair cost stays linear " +
        "in n). Rows-only check (k-means assignment isn't " +
        "DuckDB-reproducible); verdicts verified against a per-cell local " +
        "recomputation in AnnSpec.",
      (s, d) => graft.similarity.Ivf.semanticDedup(
        Tables.embeddings(s, d), threshold = 0.45),
      None
    ),
    Q(
      "sim_ann_lsh",
      "LSH-bucketed approximate top-5 (random-hyperplane sign buckets, " +
        "query-side multi-probe x7): the 100 TB path — candidates come " +
        "from an equality join on the bucket key. Rows-only check; recall " +
        "vs brute force asserted in AnnSpec.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Ann.lshTopK(emb.where(col("vec_id") < 10), emb, k = 5)
      },
      None
    )
  )
}
