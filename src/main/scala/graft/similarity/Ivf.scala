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
  *
  * Driver-cost bound for quantizer training, as a function of cell count k
  * (s = sample size, d = dim, t = Lloyd iterations):
  *   - flat path (k ≤ [[flatKMax]]):      ~ t·s·k·d     flops on the driver
  *   - two-level path (k > [[flatKMax]]): ~ t·s·2·√k·d  flops — the top
  *     level has k₁ = ⌈√k⌉ centroids over the whole sample, and each of the
  *     k₁ sub-problems runs Lloyd with k₂ = ⌈k/k₁⌉ centroids over only its
  *     own slice of the sample (the slices partition the sample, so the
  *     per-level total is s·k₂, not k₁·s·k₂).
  * At SemDeDup scale (k ≈ 10⁵, s = 10⁴, d = 64, t = 8) the flat path is
  * ~5·10¹² driver flops — minutes on one core; the two-level path is
  * ~3·10⁹ — milliseconds. Assignment is distributed in both paths: flat
  * rides k centroid literals through codegen; two-level computes the top
  * cell from k₁ literals, then an equality broadcast-join against the
  * ≤k·d·4-byte sub-centroid table prunes the scan to k₂ candidates per
  * vector, reduced map-side by a partial min aggregate.
  */
object Ivf {

  /** Above this cell count, [[build]] switches from flat local Lloyd +
    * centroid-literal assignment to the two-level quantizer (local literal
    * count and driver training flops both stay bounded).
    */
  val flatKMax = 128

  /** Hard cap on auto-derived cell count: bounds the broadcast sub-centroid
    * table at ~32 MB for d = 64 (k·d·4 bytes). SemDeDup's published
    * web-scale run used ~10⁵ clusters, inside this cap.
    */
  val maxAutoCells: Int = 131072

  /** `centroids(i)` is the centroid of cell i; `assigned` = (vec_id,
    * embedding, cell). `topCentroids` and `cellTop` (global cell id → its
    * top-level cell) are defined iff the index was built by the two-level
    * path.
    */
  final case class IvfIndex(centroids: Array[Array[Float]], assigned: DataFrame,
                            topCentroids: Option[Array[Array[Float]]] = None,
                            cellTop: Option[Array[Int]] = None)

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

  /** Cell count for a corpus of `n` vectors targeting `targetCellSize`
    * vectors per cell. Constant cell size is what makes within-cell
    * quadratic work (SemDeDup pairing, candidate re-ranking) LINEAR in n:
    * total pair cost = k·(n/k)² = n·targetCellSize. This is the published
    * SemDeDup posture — cluster count grows ∝ n (they used ~10⁵ cells at
    * web scale), never a fixed k.
    */
  def autoCells(n: Long, targetCellSize: Int = 1024): Int = {
    require(targetCellSize > 0, s"targetCellSize must be positive: $targetCellSize")
    val k = (n + targetCellSize - 1) / targetCellSize
    math.max(1L, math.min(maxAutoCells.toLong, k)).toInt
  }

  /** Build the coarse index: sample → local k-means → one distributed
    * assignment pass. Dispatches to the two-level quantizer above
    * [[flatKMax]] cells (see the object doc for the driver-cost bound).
    * `assigned` = (vec_id, embedding, cell).
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
    if (nCells <= flatKMax) {
      val centroids = lloyd(sample, nCells, iters)
      val cell = element_at(probeCells(col("embedding"), centroids, 1), 1)
      IvfIndex(centroids,
        corpus.select(col("vec_id"), col("embedding"), cell.as("cell")))
    } else buildTwoLevel(corpus, sample, nCells, iters)
  }

  /** Two-level coarse quantizer for large cell counts. Training: k₁ = ⌈√k⌉
    * top centroids over the whole sample, then per-top-cell Lloyd with
    * k₂ = ⌈k/k₁⌉ sub-centroids over that cell's sample slice — ~2√k·s·d·t
    * driver flops total (object doc). A top cell whose sample slice is
    * empty contributes its own centroid as a single sub-cell, so every
    * possible top assignment has ≥1 sub-cell and the assignment join can
    * never drop a vector. Assignment: the top cell comes from k₁ broadcast
    * literals (codegen'd, narrow); the sub cell from an equality broadcast
    * join against the (top_cell → sub-centroids) table — k₂ candidates per
    * vector, reduced to one row map-side by a partial min-of-struct
    * aggregate before the vec_id shuffle.
    */
  private def buildTwoLevel(corpus: DataFrame, sample: Array[Array[Float]],
                            nCells: Int, iters: Int): IvfIndex = {
    val spark = corpus.sparkSession
    val k1 = math.ceil(math.sqrt(nCells.toDouble)).toInt
    val k2 = math.ceil(nCells.toDouble / k1).toInt
    val top = lloyd(sample, k1, iters)
    // slice the sample by nearest top centroid (ties → lowest index, the
    // same tie-break probeCells' struct sort uses)
    val slices = Array.fill(top.length)(Vector.newBuilder[Array[Float]])
    sample.foreach { v =>
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < top.length) {
        val dd = distSqLocal(v, top(c))
        if (dd < bestD) { bestD = dd; best = c }
        c += 1
      }
      slices(best) += v
    }
    // global cell ids are dense in training order: deterministic, and the
    // centroids array below is indexed by exactly these ids
    val centroidsB = Array.newBuilder[Array[Float]]
    val cellTopB = Array.newBuilder[Int]
    val subRowsB = Seq.newBuilder[(Int, Int, Seq[Float], Double)]
    var nextId = 0
    top.indices.foreach { t =>
      val slice = slices(t).result()
      val subs = if (slice.isEmpty) Array(top(t)) else lloyd(slice.toArray, k2, iters)
      subs.foreach { c =>
        centroidsB += c
        cellTopB += t
        subRowsB += ((t, nextId, c.toSeq, c.map(v => v.toDouble * v.toDouble).sum))
        nextId += 1
      }
    }
    import spark.implicits._
    val subTable = subRowsB.result()
      .toDF("top_cell", "cell", "centroid", "c_norm_sq")
      .withColumn("centroid", col("centroid").cast(ArrayType(FloatType)))
    val e = col("embedding")
    val topCell = element_at(probeCells(e, top, 1), 1)
    // |x|² − 2·x·c + |c|²: same monotone-equivalent form distSqTo uses, so
    // flat and two-level paths rank candidates identically
    val dSq = VectorExpressions.normF(e) * VectorExpressions.normF(e) -
      lit(2.0) * VectorExpressions.dotF(e, col("centroid")) + col("c_norm_sq")
    val assigned = corpus.select(col("vec_id"), e, topCell.as("top_cell"))
      .join(broadcast(subTable), Seq("top_cell"))
      .groupBy(col("vec_id"))
      .agg(first(e).as("embedding"),
        min(struct(dSq.as("d"), col("cell").as("cell"))).getField("cell").as("cell"))
      .select(col("vec_id"), col("embedding"), col("cell"))
    IvfIndex(centroidsB.result(), assigned, Some(top), Some(cellTopB.result()))
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

  /** Margin-adaptive probe set (r15 verdict #6, probe ordering by centroid
    * margin): the `minProbe` nearest cells always, then cells
    * minProbe+1..maxProbe only while their squared distance stays within
    * `(1 + margin)` of the nearest cell's. The margin extension targets
    * Voronoi-BOUNDARY queries — a tiny gap to the runner-up cells means the
    * cell that actually holds the true neighbors is ambiguous, so those
    * queries buy extra probes; deep-interior queries (big gap) stay at
    * minProbe. The minProbe floor is load-bearing: measured on the
    * adversarial uniform-random corpus (IvfTune, r16), a PURE margin gate
    * under-performs fixed probing at equal average budget (margin 0.1 →
    * 2.35 avg probes, recall@5 0.51 vs fixed-3's 0.60) because uniform
    * vectors put no signal in the margin — true neighbors are uncorrelated
    * with cell geometry there, so only raw probe count helps. On clustered
    * corpora (the planted fixture, and real embedding corpora) the margin
    * arm is what catches the boundary queries fixed probing misses. The
    * per-query probe count is data-dependent but the JOIN is still a
    * bucket-id equality after the explode — plan shape and 100 TB posture
    * identical to [[probeCells]].
    *
    * `greatest(bestD, 0)`: dSq is exact squared L2 so mathematically ≥ 0,
    * but the |x|²−2x·c+|c|² float form can read ~−1e-7 when the vector
    * equals a centroid; a negative base would flip the margin inequality
    * and drop even the nearest cells. The index arm keeps them regardless.
    */
  def probeCellsMargin(e: Column, centroids: Array[Array[Float]],
                       minProbe: Int, maxProbe: Int, margin: Double): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(distSqTo(e, c).as("d"), lit(i).as("cell"))
    }: _*)
    val sorted = array_sort(scored)
    val bestD = element_at(sorted, 1).getField("d")
    val kept = filter(sorted, (s, i) =>
      i < minProbe ||
        s.getField("d") <= greatest(bestD, lit(0.0)) * lit(1.0 + margin))
    slice(transform(kept, s => s.getField("cell")), 1, maxProbe)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * k-means-cluster the embeddings, then dedup WITHIN each cell only —
    * semantically near-identical items land in the same cell, so the
    * quadratic pairing term is bounded by cell size, and the only shuffle
    * is an equality join on the cell id. This is the published middle path
    * between the exact all-pairs baseline (`Ann.allPairsTopN`, quadratic
    * in n) and hash-based LSH dedup (`MinHash`/`dd_simhash`, which need
    * token/bit structure rather than dense embeddings).
    *
    * `nCells ≤ 0` (the default) derives the cell count from the corpus
    * size via [[autoCells]] — one extra count() job at build time — so the
    * per-cell pair cost stays ~targetCellSize² regardless of corpus size
    * and total pairing work stays LINEAR in n. A pinned nCells is still
    * accepted for reproducing a specific clustering.
    *
    * Verdict per vector, deterministic: DROPPED iff a LOWER-id vector in
    * the same cell has cosine ≥ threshold; `dup_of` = the smallest such
    * id (min-id survivorship, same convention as the exact dedup family).
    * Cosines use the codegen'd native expression.
    *
    * Storage note: the cell assignment is localCheckpoint(eager)ed because
    * it feeds three plan positions (both self-join sides and the verdict
    * join) that exchange reuse cannot dedup. The returned lazy DataFrame
    * references that checkpoint, so it CANNOT be released here — it is
    * pinned in executor storage until RDD GC. Callers that consume the
    * result once should prefer [[semanticDedupWith]], which unpersists
    * deterministically after the caller's action.
    */
  def semanticDedup(corpus: DataFrame, nCells: Int = 0,
                    threshold: Double = 0.45,
                    sampleSize: Int = 10000,
                    targetCellSize: Int = 1024): DataFrame =
    semanticDedupImpl(corpus, nCells, threshold, sampleSize, targetCellSize)._1

  /** [[semanticDedup]] with deterministic checkpoint release: runs `use` on
    * the verdict DataFrame, then unpersists the cell-assignment checkpoint
    * in a finally — nothing stays pinned in executor storage afterwards.
    * `use` must fully consume the DataFrame (collect/write/count); a lazy
    * plan escaping `use` would reference the released checkpoint.
    */
  def semanticDedupWith[T](corpus: DataFrame, nCells: Int = 0,
                           threshold: Double = 0.45,
                           sampleSize: Int = 10000,
                           targetCellSize: Int = 1024)(use: DataFrame => T): T = {
    val (verdicts, release) =
      semanticDedupImpl(corpus, nCells, threshold, sampleSize, targetCellSize)
    try use(verdicts) finally release()
  }

  private def semanticDedupImpl(corpus: DataFrame, nCells: Int,
                                threshold: Double, sampleSize: Int,
                                targetCellSize: Int): (DataFrame, () => Unit) = {
    val k = if (nCells > 0) nCells else autoCells(corpus.count(), targetCellSize)
    // the assignment feeds THREE plan positions (both self-join sides and
    // the verdict join) with different projections, so exchange reuse can't
    // dedup them — materialize it once instead of scanning the corpus and
    // re-evaluating k distance expressions per reference
    val assigned = build(corpus, k, sampleSize).assigned
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
    val verdicts = assigned.select(col("vec_id"), col("cell"))
      .join(dupOf, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell").cast(LongType).as("cell"),
        col("dup_of").isNull.as("keep"), col("dup_of"))
      .orderBy("vec_id")
    (verdicts, () => graft.util.Checkpoints.unpersist(assigned))
  }

  /** Approximate top-k: probe nProbe cells per query, exact cosine rank on
    * the candidates. (Probing rides centroid literals, so it is meant for
    * flat-path indexes; a two-level index's `centroids` array works here
    * too but embeds k literals — prune via `topCentroids` first at large k.)
    */
  def ivfTopK(index: IvfIndex, queries: DataFrame, k: Int, nProbe: Int = 3): DataFrame =
    ivfTopKImpl(index, queries, k, probeCells(col("embedding"), index.centroids, nProbe))

  /** [[ivfTopK]] with the margin-adaptive probe set ([[probeCellsMargin]]):
    * `minProbe` cells always, margin-qualified extras up to `maxProbe`.
    * Default tuning and measured recall are documented at the catalog entry
    * (sim_ann_ivf) and pinned in AnnSpec.
    */
  def ivfTopKAdaptive(index: IvfIndex, queries: DataFrame, k: Int,
                      minProbe: Int = 4, maxProbe: Int = 6,
                      margin: Double = 0.1): DataFrame =
    ivfTopKImpl(index, queries, k,
      probeCellsMargin(col("embedding"), index.centroids, minProbe, maxProbe, margin))

  private def ivfTopKImpl(index: IvfIndex, queries: DataFrame, k: Int,
                          probes: Column): DataFrame =
    rankCandidates(index,
      queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(probes).as("cell")), k)

  /** Exact-cosine re-rank of the probe set: (qid, qe, cell) rows → top-k
    * per query via an equality join on the cell id. Shared tail of every
    * search path — flat literals, margin-adaptive, and two-level.
    */
  private def rankCandidates(index: IvfIndex, q: DataFrame, k: Int): DataFrame = {
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

  /** Top-k search for TWO-LEVEL indexes at large cell counts — the search
    * counterpart of [[buildTwoLevel]]'s assignment path. [[ivfTopK]] embeds
    * all k centroids as codegen literals, which is exactly right at
    * k ≤ [[flatKMax]] and exactly wrong at the SemDeDup posture (k ≈ 10⁵:
    * 10⁵ × d expression nodes per query row kills codegen long before it
    * kills correctness). Here the per-row literal cost is k₁ = ⌈√k⌉ top
    * centroids; each query explodes to its `topProbe` nearest TOP cells,
    * broadcast-joins the (top_cell → sub-centroid) table — the same
    * ≤ k·d·4-byte broadcast the assignment path already ships — scores the
    * ~topProbe·k₂ candidate sub-cells with the codegen'd distance
    * expression, and keeps the `nProbe` nearest per query (deterministic
    * (d, cell) tie-break, the probeCells order). The candidate join after
    * that is the shared cell-id equality — identical plan shape to the
    * flat path, so the whole search is literal-bounded by √k at any k.
    *
    * With `topProbe = k₁` (no top-level pruning) the selected probe set is
    * EXACTLY [[probeCells]]' nProbe-nearest over all k centroids — pinned
    * in AnnSpec as an equivalence against [[ivfTopK]]. Smaller topProbe
    * trades top-level boundary misses for a k₂-fold smaller scoring fan;
    * the assignment path's top cell is always among the probed ones when
    * topProbe ≥ 1, so a query's own cell is never missed.
    */
  def ivfTopKTwoLevel(index: IvfIndex, queries: DataFrame, k: Int,
                      nProbe: Int = 4, topProbe: Int = 3): DataFrame = {
    val top = index.topCentroids.getOrElse(throw new IllegalArgumentException(
      "ivfTopKTwoLevel: index was built by the flat path (no top level); " +
        "use ivfTopK/ivfTopKAdaptive"))
    val cellTop = index.cellTop.get
    val spark = queries.sparkSession
    import spark.implicits._
    val subTable = index.centroids.zipWithIndex.map { case (c, i) =>
      (cellTop(i), i, c.toSeq, c.map(v => v.toDouble * v.toDouble).sum)
    }.toSeq.toDF("top_cell", "cell", "centroid", "c_norm_sq")
      .withColumn("centroid", col("centroid").cast(ArrayType(FloatType)))
    val qe = col("qe")
    // |x|² − 2·x·c + |c|²: the same monotone-equivalent form distSqTo and
    // buildTwoLevel use, so probe ranking matches the flat literal path
    val dSq = VectorExpressions.normF(qe) * VectorExpressions.normF(qe) -
      lit(2.0) * VectorExpressions.dotF(qe, col("centroid")) + col("c_norm_sq")
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("_d").asc, col("cell").asc)
    val probes = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(probeCells(col("embedding"), top, math.min(topProbe, top.length)))
          .as("top_cell"))
      .join(broadcast(subTable), Seq("top_cell"))
      .select(col("qid"), qe, col("cell"), dSq.as("_d"))
      .withColumn("_rn", row_number().over(wProbe))
      .where(col("_rn") <= nProbe)
      .select(col("qid"), qe, col("cell"))
    rankCandidates(index, probes, k)
  }
}
