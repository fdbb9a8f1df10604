package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.expressions.VectorExpressions

/** IVF (inverted-file) approximate nearest neighbor: the k-means-cell
  * counterpart to `Ann.lshTopK` — the other standard scale path.
  *
  * Index build: the coarse quantizer is trained with local Lloyd iterations
  * on a bounded, deterministic SAMPLE of the corpus — the standard IVF
  * recipe (FAISS trains coarse centroids on ~10⁵ samples regardless of
  * corpus size): centroid quality needs representative data, not all data.
  * One collect of `sampleSize` rows replaces a multi-job distributed
  * k-means; at 100 TB the sample is the only thing that ever reaches the
  * driver. Every corpus vector is then assigned to its nearest centroid in
  * a single narrow codegen'd pass (the centroids ride as broadcast
  * literals). Search: each query probes its `nProbe` nearest cells only, so
  * the candidate join is an equality on the cell id — O(n/nCells · nProbe)
  * per query at any corpus size, with exact cosine re-ranking.
  */
object Ivf {

  final case class IvfIndex(centroids: Array[Array[Float]], assigned: DataFrame)

  private def distSqLocal(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  /** Deterministic local Lloyd: seeds = evenly spaced sample vectors (the
    * sample is vec_id-ordered, so seeding is content-independent and
    * reproducible); empty cells keep their previous centroid.
    */
  private[similarity] def lloyd(sample: Array[Array[Float]], k: Int,
                                iters: Int): Array[Array[Float]] = {
    val n = sample.length
    val dim = sample.head.length
    val kk = math.min(k, n)
    var centroids = Array.tabulate(kk)(i => sample((i.toLong * n / kk).toInt))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < centroids.length) {
          val dd = distSqLocal(v, centroids(c))
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        counts(best) += 1
        val s = sums(best); var j = 0
        while (j < dim) { s(j) += v(j); j += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
      it += 1
    }
    centroids
  }

  /** Build the coarse index: sample → local k-means → one distributed
    * assignment pass. `assigned` = (vec_id, embedding, cell).
    */
  def build(corpus: DataFrame, nCells: Int = 16, sampleSize: Int = 10000,
            iters: Int = 8): IvfIndex = {
    // Deterministic but content-independent sample: ordering by a hash of
    // vec_id spreads the sample across the whole corpus. A plain
    // orderBy(vec_id).limit is a *prefix* — if vec_id correlates with
    // content (time- or source-ordered corpora, the common case at scale)
    // the centroids would skew to the prefix and cell balance/recall
    // degrade. orderBy+limit compiles to TakeOrderedAndProject (per-
    // partition top-k + driver merge), so no full sort at 100 TB either.
    val sample = corpus.select(col("vec_id"), col("embedding"))
      .where(col("embedding").isNotNull)
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(sampleSize)
      .collect().map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty,
      "Ivf.build: corpus has no non-null embeddings to train the quantizer on")
    val centroids = lloyd(sample, nCells, iters)
    val cell = element_at(probeCells(col("embedding"), centroids, 1), 1)
    IvfIndex(centroids,
      corpus.select(col("vec_id"), col("embedding"), cell.as("cell")))
  }

  /** Squared L2 distance to a literal centroid, via native expressions:
    * |x|² - 2·x·c + |c|² (monotone-equivalent to true distance for ranking).
    */
  private def distSqTo(e: Column, c: Array[Float]): Column = {
    val cLit = typedLit(c.toSeq)
    val cNormSq = c.map(v => v.toDouble * v.toDouble).sum
    VectorExpressions.normF(e) * VectorExpressions.normF(e) -
      lit(2.0) * VectorExpressions.dotF(e, cLit) + lit(cNormSq)
  }

  /** nProbe nearest cells of a vector, as an array column of cell ids. */
  def probeCells(e: Column, centroids: Array[Array[Float]], nProbe: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(distSqTo(e, c).as("d"), lit(i).as("cell"))
    }: _*)
    slice(transform(array_sort(scored), s => s.getField("cell")), 1, nProbe)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * k-means-cluster the embeddings, then dedup WITHIN each cell only —
    * semantically near-identical items land in the same cell, so the
    * quadratic pairing term is bounded by cell size (n/nCells), and the
    * only shuffle is an equality join on the cell id. This is the
    * published middle path between the exact all-pairs baseline
    * (`Ann.allPairsTopN`, quadratic in n) and hash-based LSH dedup
    * (`MinHash`/`dd_simhash`, which need token/bit structure rather than
    * dense embeddings).
    *
    * Verdict per vector, deterministic: DROPPED iff a LOWER-id vector in
    * the same cell has cosine ≥ threshold; `dup_of` = the smallest such
    * id (min-id survivorship, same convention as the exact dedup family).
    * Cosines use the codegen'd native expression.
    */
  def semanticDedup(corpus: DataFrame, nCells: Int = 16,
                    threshold: Double = 0.45,
                    sampleSize: Int = 10000): DataFrame = {
    // the assignment feeds THREE plan positions (both self-join sides and
    // the verdict join) with different projections, so exchange reuse can't
    // dedup them — materialize it once instead of scanning the corpus and
    // re-evaluating nCells distance expressions per reference
    val assigned = build(corpus, nCells, sampleSize).assigned
      .localCheckpoint(true)
    val a = assigned.select(col("cell"), col("vec_id").as("ida"),
      col("embedding").as("ea"))
    val b = assigned.select(col("cell"), col("vec_id").as("idb"),
      col("embedding").as("eb"))
    val cos = VectorExpressions.cosineF(col("ea"), col("eb"))
    val dupOf = a.join(b, Seq("cell"))
      .where(col("ida") < col("idb") && cos >= threshold)
      .groupBy(col("idb").as("vec_id"))
      .agg(min(col("ida")).as("dup_of"))
    assigned.select(col("vec_id"), col("cell"))
      .join(dupOf, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell").cast(LongType).as("cell"),
        col("dup_of").isNull.as("keep"), col("dup_of"))
      .orderBy("vec_id")
  }

  /** Approximate top-k: probe nProbe cells per query, exact cosine rank on
    * the candidates.
    */
  def ivfTopK(index: IvfIndex, queries: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      explode(probeCells(col("embedding"), index.centroids, nProbe)).as("cell"))
    val cos = VectorExpressions.cosineF(col("qe"), col("ve"))
    val w = Window.partitionBy(col("qid")).orderBy(cos.desc, col("vid").asc)
    index.assigned
      .select(col("vec_id").as("vid"), col("embedding").as("ve"), col("cell"))
      .join(broadcast(q), Seq("cell"))
      .where(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), round(cos, 4).as("cosine"),
        row_number().over(w).cast(LongType).as("rn"))
      .where(col("rn") <= k)
      .orderBy("qid", "rn")
  }
}
