package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

/** MinHash + LSH near-duplicate detection: shingle → minhash signature →
  * band → bucket-join → exact-Jaccard verification.
  *
  * Scale shape (the whole point of LSH): candidate generation is an
  * *equality* join on the band signature — a plain shuffled hash join whose
  * cost is O(candidates), never the O(n²) all-pairs comparison.
  * `DedupQueries.dd_ngram_jaccard`'s exact shingle join is the small-corpus
  * oracle baseline this is verified against.
  *
  * Implementation note (why mapPartitions, not HOF expressions): the
  * signature stage was first written with nested `transform`/`aggregate`
  * HOFs. HOFs are interpreted (no codegen), and CollapseProject inlines the
  * whole split→shingle→hash pipeline into every consumer lambda — profiling
  * showed `split(text)` re-evaluated inside each of 32×|shingles| nested
  * lambda invocations (millions of full-string splits for 500 docs). A
  * single typed `mapPartitions` pass computes each document's signature
  * exactly once, stays a pure narrow map stage (zero shuffles at any scale),
  * and materializes shingles/bands as data so no expression can be inlined
  * past it. This is the documented per-partition-imperative-logic case.
  *
  * Determinism: permutation parameters derive from the hash index by fixed
  * integer arithmetic; the base shingle hash is a local FNV-1a (64-bit),
  * platform-independent.
  */
object MinHash {

  val Prime: Long = 2147483647L // 2^31 - 1, Mersenne
  val NumHashes = 32
  val Bands     = 8
  val RowsPerBand: Int = NumHashes / Bands

  /** Explicit partition count for the verification stage: AQE would coalesce
    * the tiny id-pair shuffle to one partition (bytes-based sizing), but the
    * per-row verify work is CPU-heavy — pin the fan-out instead.
    */
  val VerifyParallelism = 32

  private def aParam(i: Int): Long = (2L * i + 1) * 40503L % Prime
  private def bParam(i: Int): Long = (i * 1103515245L + 12345L) % Prime

  /** FNV-1a 64-bit over UTF-8 bytes, reduced mod Prime — deterministic and
    * engine-independent.
    */
  def shingleHash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    (h & Long.MaxValue) % Prime
  }

  /** Distinct w-shingles of a token array (single shingle for short docs). */
  def shinglesOf(tokens: Array[String], w: Int): Array[String] =
    if (tokens.length >= w) tokens.sliding(w).map(_.mkString(" ")).toArray.distinct
    else Array(tokens.mkString(" "))

  /** 32-wide minhash signature of a shingle set. */
  def signatureOf(shingles: Array[String]): Array[Long] = {
    val hashed = shingles.map(shingleHash)
    Array.tabulate(NumHashes) { i =>
      val a = aParam(i); val b = bParam(i)
      var min = Long.MaxValue
      var j = 0
      while (j < hashed.length) {
        val v = (a * hashed(j) + b) % Prime
        if (v < min) min = v
        j += 1
      }
      min
    }
  }

  def bandsOf(sig: Array[Long]): Array[String] =
    Array.tabulate(Bands)(b =>
      s"b${b}_" + sig.slice(b * RowsPerBand, (b + 1) * RowsPerBand).mkString(":"))

  /** Signature-union aggregate: elementwise min of MinHash signatures — by
    * the MinHash construction, min over a union of sets equals the
    * elementwise min of the sets' signatures, so this aggregates a GROUP's
    * signature (e.g. a dedup cluster's) without ever touching the shingles
    * again. A custom `Aggregator` because no built-in folds arrays
    * elementwise across rows short of collect_list (which buffers the whole
    * group); this buffer is a fixed 32 longs and merges associatively —
    * partial aggregation (map-side combine) applies, the property that
    * makes it a one-shuffle aggregate at 100 TB.
    */
  object SignatureUnion
    extends org.apache.spark.sql.expressions.Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)
    override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < NumHashes && i < sig.length) {
        if (sig(i) < buf(i)) buf(i) = sig(i)
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < NumHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  final case class DocSig(doc_id: Long, shingles: Array[String],
                          sig: Array[Long], bands: Array[String])

  /** Per-document shingles + signature + LSH bands in ONE narrow typed pass
    * (the signature is carried rather than recomputed by consumers that
    * need it — 32 permutations × |shingles| modular ops per doc).
    */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 shingleWidth: Int): Dataset[DocSig] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // null text (PERMISSIVE-ingest posture: bad values become NULL, never
    // errors) degrades to an empty shingle set instead of an executor NPE
    docs.select(col(idCol).cast(LongType), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val tokens = if (text == null) Array.empty[String] else text.split(" ")
        val sh = shinglesOf(tokens, shingleWidth)
        val sig = signatureOf(sh)
        DocSig(id, sh, sig, bandsOf(sig))
      })
  }

  /** Full pipeline: docs(idCol, textCol) → verified near-dup pairs
    * (id_a < id_b, jaccard ≥ threshold).
    */
  // Persisted signature tables keyed by (session, input plan, params): three
  // consumers per build (band explode + two shingle-array joins) and
  // repeated builds (bench reruns) all share one cached copy instead of
  // stacking persisted blocks per invocation. Bounded LRU — distinct
  // inputs/params beyond the cap unpersist the oldest entry rather than
  // accumulating blocks for the life of the session.
  private val sigCache = new graft.util.PersistedTableCache(maxEntries = 8)

  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     threshold: Double = 0.5, shingleWidth: Int = 3): DataFrame = {
    // MEMORY_AND_DISK (cache default): signatures are O(corpus) and must
    // spill, not OOM.
    val cacheKey =
      s"${docs.queryExecution.analyzed.semanticHash()}|$idCol|$textCol|$shingleWidth"
    val sigs = sigCache.getOrElseUpdate(docs.sparkSession, cacheKey)(
      signatures(docs, idCol, textCol, shingleWidth).toDF())

    // Candidate generation: explode bands, self-join on the band signature —
    // ids ONLY. Band collisions can be dense; carrying shingle arrays
    // through the collision join would turn a cheap id-pair shuffle into
    // hundreds of MB. Dedup id pairs first, then join arrays back once.
    val banded = sigs.select(col("doc_id"), explode(col("bands")).as("band"))
    val candidates = banded.select(col("doc_id").as("id_a"), col("band"))
      .join(banded.select(col("doc_id").as("id_b"), col("band")), Seq("band"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
      // AQE would coalesce the tiny id-pair shuffle to one partition, but
      // per-row verify work is CPU-heavy — pin the fan-out by work, not bytes.
      .repartition(VerifyParallelism, col("id_a"), col("id_b"))

    // Exact verification only on candidates (array_intersect on shingle sets).
    val shingleSets = sigs.select(col("doc_id"), col("shingles"))
    val withArrays = candidates
      .join(shingleSets.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(shingleSets.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType)
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType)
    withArrays
      .select(col("id_a"), col("id_b"), round(inter / union, 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
  }
}
