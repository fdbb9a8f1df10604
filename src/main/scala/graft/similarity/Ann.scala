package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two tiers, per the standard ANN playbook:
  *  - `bruteForceTopK`: exact cosine top-k. The query side is broadcast, the
  *    corpus side streams — cost O(|queries| · n). Exact baseline and the
  *    right tool when |queries| is small.
  *  - `lshTopK`: random-hyperplane LSH — corpus is bucketed by sign bits of
  *    fixed projections; search touches only the query's bucket. The shuffle
  *    is an equality join on the bucket key, so cost is O(candidates). This
  *    is the 100 TB path (an IVF index is the same shape: bucket = coarse
  *    centroid id).
  *
  * All vector math is `transform`/`zip_with`/`aggregate` HOFs — codegen'd,
  * no UDFs. Hyperplanes are deterministic (integer-arithmetic pseudo-random)
  * so results are reproducible across runs and engines.
  */
object Ann {

  /** Sequential dot product of two float arrays, in double — HOF reference
    * form (interpreted; kept as the executable spec the custom expression
    * is asserted bit-identical against).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x))

  /** Production cosine: the codegen'd native expressions (same IEEE op
    * sequence as the HOF form and the DuckDB oracle — swap never moves a
    * hash-compared value).
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosineF(a, b)

  /** Local cosine with the exact IEEE operation sequence of the expression/
    * oracle form (`dot / (sqrt(Σa²) · sqrt(Σb²))`, all folds sequential from
    * 0.0) so typed and expression paths produce bit-identical doubles.
    */
  def cosineLocal(a: Array[Float], b: Array[Float],
                  normA: Double, normB: Double): Double = {
    var dot = 0.0
    var i = 0
    while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    dot / (normA * normB)
  }

  def l2normLocal(a: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Exact all-pairs most-similar pairs (id_a < id_b), top-N — blocked
    * distributed form, the standard block-matrix decomposition of an
    * all-pairs scan.
    *
    * Rows are hashed into `B = ceil(n / rowsPerBlock)` blocks; each row is
    * replicated to the block-pair keys it participates in (a row in block b
    * is the LEFT of pairs (b, j≥b) and the RIGHT of pairs (i≤b, b)), and an
    * equality shuffle on the (pi, pj) key brings exactly two blocks together
    * per task. Cross-block pairs (pi < pj) appear exactly once; same-block
    * pairs are deduped by id order. Per-task memory is O(rowsPerBlock·d) —
    * NOTHING is ever collected to the driver, so corpus size is bounded by
    * cluster memory, not driver memory. The O(n²·d) flops are inherent to
    * the exact baseline (that's what "all pairs" means); `lshTopK` is the
    * sub-quadratic scale path. Norms are computed once per row before
    * replication; the cosine is the codegen'd native-expression form, whose
    * sequential IEEE fold is bit-identical to the DuckDB oracle regardless
    * of pair orientation (float multiply is commutative bit-exact).
    *
    * The one eager action is a count() to size the block grid (metadata-cheap
    * on parquet) — the same kind of pre-planning statistics read AQE does.
    */
  def allPairsTopN(emb: DataFrame, topN: Int, rowsPerBlock: Int = 1024): DataFrame = {
    import graft.expressions.VectorExpressions.{dotF, normF}
    val base = emb.select(col("vec_id").cast(LongType).as("vec_id"), col("embedding"))
    val n = base.count()
    val numBlocks = math.max(1L, (n + rowsPerBlock - 1) / rowsPerBlock).toInt
    val blocked = base.select(col("vec_id"), col("embedding"),
      normF(col("embedding")).as("nrm"),
      pmod(hash(col("vec_id")), lit(numBlocks)).as("blk"))
    val left = blocked.select(col("vec_id").as("ida"), col("embedding").as("ea"),
      col("nrm").as("na"), col("blk").as("pi"),
      explode(sequence(col("blk"), lit(numBlocks - 1))).as("pj"))
    val right = blocked.select(col("vec_id").as("idb"), col("embedding").as("eb"),
      col("nrm").as("nb"), col("blk").as("pj"),
      explode(sequence(lit(0), col("blk"))).as("pi"))
    val cos = dotF(col("ea"), col("eb")) / (col("na") * col("nb"))
    left.join(right, Seq("pi", "pj"))
      .where((col("pi") < col("pj")) || (col("ida") < col("idb")))
      .select(least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"),
        round(cos, 4).as("cosine"))
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(topN)
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
  }

  /** Exact top-k: queries × corpus, ranked per query. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("vid"), col("embedding").as("ve"))
    val cos = cosine(col("qe"), col("ve"))
    val w = Window.partitionBy(col("qid")).orderBy(cos.desc, col("vid").asc)
    c.crossJoin(broadcast(q))
      .where(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), round(cos, 4).as("cosine"),
        row_number().over(w).cast(LongType).as("rn"))
      .where(col("rn") <= k)
      .orderBy("qid", "rn")
  }

  // Random 64-dim vectors are the adversarial case for hyperplane LSH
  // (cosines concentrate near 0, so "near" neighbors barely separate from
  // the bulk); shorter codes + more OR-ed tables trade candidate count for
  // recall. 6 bits × 8 tables × 7 query-side probes ≈ 7n/8 candidates per
  // query at recall@5 0.74 / recall@10 0.66 on this corpus (AnnSpec, r17 —
  // 0.38 single-probe, 0.65 at ×3, 0.70/0.61 at ×5; ×7 = 1 + NumPlanes is
  // the single-bit multi-probe maximum, taken once the LshProbeBuckets
  // codegen fix made probe count nearly free on the bucket side);
  // structured embeddings reach ≥0.9 at a fraction of the cost
  // (planted-cluster gate).
  val NumPlanes = 6  // bits per table → 64 buckets
  val NumTables = 8  // OR-amplification: candidate if ANY table collides

  /** Deterministic pseudo-random hyperplane component: plane j, dim i →
    * value in [-0.5, 0.5). Knuth multiplicative hashing on the flat index.
    * Materialized as literal float vectors so the projection is the native
    * codegen'd dot product, not an interpreted HOF.
    */
  private def planeVec(j: Int): Seq[Float] =
    (0 until 64).map(i =>
      (((j.toLong * 64 + i + 1) * 2654435761L % 1048576L + 1048576L) % 1048576L
        / 1048576.0 - 0.5).toFloat)

  /** Sign-bit bucket signature of an embedding in hash table `t`
    * (planes t·NumPlanes … t·NumPlanes+NumPlanes-1). Column-algebra
    * REFERENCE form: the executable spec [[LshProbeBuckets]] is pinned
    * bit-identical against (AnnSpec); the search path itself uses the
    * expression — this fold inlines one 64-literal dot per plane, which
    * is fine for a single bucket and fatal at probe fan-out (see
    * graft.expressions.LshProbeBuckets's scaladoc for the 64 KB codegen
    * blowup the fan-out caused).
    */
  def lshBucket(e: Column, table: Int): Column =
    (table * NumPlanes until (table + 1) * NumPlanes).foldLeft(lit(0L)) {
      (acc, j) =>
        acc * 2 + when(
          graft.expressions.VectorExpressions.dotF(e, typedLit(planeVec(j))) > 0,
          1L).otherwise(0L)
    }

  /** Query-side probes per table (multi-probe LSH, Lv et al. VLDB'07):
    * the exact bucket PLUS the buckets reached by flipping the
    * `nProbe - 1` sign bits with the smallest projection magnitude — the
    * bits most likely to differ for a true neighbor sitting just across a
    * hyperplane. Query-side only: the corpus is still indexed at ONE
    * bucket per table (no extra index storage or corpus shuffle width),
    * and candidates grow by at most nProbe× — the standard recall knob
    * that does NOT touch the index. 3 → 5 at r16 (verdict #6 next-notch):
    * recall@5 0.65 → 0.70, recall@10 0.515 → 0.61 on the adversarial
    * corpus (IvfTune). 5 → 7 at r17, the single-bit multi-probe MAXIMUM
    * (bucket + one flip per plane; LshProbeBuckets rejects more loudly):
    * recall@5 0.70 → 0.74, recall@10 0.61 → 0.66, candidates ≤7n/8 per
    * query — taken once the codegen fix made the bucket side free and
    * re-measured inside the committed bench envelope (BASELINE.md r17).
    */
  val LshProbes = 7

  /** Column-algebra REFERENCE form of one table's probe set (bucket + the
    * nProbe−1 smallest-|projection| single-bit flips) — kept as the
    * executable spec [[graft.expressions.LshProbeBuckets]] is pinned
    * against in AnnSpec. NOT on the search path: rendered at probe
    * fan-out, these trees re-inline the six dot products per probe and
    * per sort element (~430 dot bodies per row at 8 tables × 5 probes),
    * blowing janino's 64 KB method limit and dropping the whole stage to
    * interpreted eval (measured 37 s vs 2 s at the 100k AnnSoak).
    */
  private[graft] def tableProbes(e: Column, table: Int, nProbe: Int): Seq[Column] = {
    val js = (table * NumPlanes until (table + 1) * NumPlanes).toSeq
    val projs = js.map(j =>
      graft.expressions.VectorExpressions.dotF(e, typedLit(planeVec(j))))
    val bucket = projs.foldLeft(lit(0L)) { (acc, p) =>
      acc * 2 + when(p > 0, 1L).otherwise(0L)
    }
    // bit drawn i-th (0-based) carries weight 2^(NumPlanes-1-i) in the
    // fold above; sort ascending by |projection| to find the flips
    val weighted = projs.zipWithIndex.map { case (p, i) =>
      struct(abs(p).as("m"), lit(1L << (NumPlanes - 1 - i)).as("w"))
    }
    val sorted = sort_array(array(weighted: _*))
    bucket +: (1 until nProbe).map(i =>
      bucket.bitwiseXOR(element_at(sorted, i).getField("w")))
  }

  /** (table, bucket) rows for one side of the candidate join: the
    * [[graft.expressions.LshProbeBuckets]] expression computes every
    * probe bucket in one compiled loop (constant-size codegen at any
    * probe count), posexplode recovers the table id from the layout
    * `[t0 probes..., t1 probes...]`.
    */
  private def probeRows(df: DataFrame, idAlias: String, nProbe: Int): DataFrame =
    df.select(col("vec_id").as(idAlias),
        posexplode(graft.expressions.LshExpressions.lshAllProbes(
          col("embedding"), NumPlanes, NumTables, nProbe)))
      .select(col(idAlias),
        floor(col("pos") / nProbe).cast(IntegerType).as("t"),
        col("col").as("b"))

  /** Approximate top-k: candidates = any-table bucket collision (ids only
    * through the join) with query-side multi-probe, then exact cosine rank
    * on the deduped candidate set. At scale this is the whole point: the
    * join is an equality shuffle on (table, bucket), never an all-pairs
    * scan, and multi-probe widens only the query side of it.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nProbe: Int = LshProbes): DataFrame = {
    val q = probeRows(queries, "qid", nProbe)
    val c = probeRows(corpus, "vid", 1) // index side: ONE bucket per table
    val candidates = c.join(broadcast(q), Seq("t", "b"))
      .where(col("vid") =!= col("qid"))
      .select("qid", "vid").dropDuplicates("qid", "vid")
    val qe = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val ve = corpus.select(col("vec_id").as("vid"), col("embedding").as("ve"))
    val cos = cosine(col("qe"), col("ve"))
    val w = Window.partitionBy(col("qid")).orderBy(cos.desc, col("vid").asc)
    candidates
      .join(broadcast(qe), Seq("qid")).join(ve, Seq("vid"))
      .select(col("qid"), col("vid"), round(cos, 4).as("cosine"),
        row_number().over(w).cast(LongType).as("rn"))
      .where(col("rn") <= k)
      .orderBy("qid", "rn")
  }
}
