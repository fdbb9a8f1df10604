package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.similarity.{Ann, Ivf}

/** One-off ANN scale soak (test scope, not shipped — r16 verdict #7): the
  * recall floors in AnnSpec are measured on the 500–2,000-vector corpus
  * SFs; this tool evidences the 100 TB posture with DATA at a corpus two
  * orders larger — a deterministic synthetic 100,000-vector / 64-dim
  * clustered corpus (2,000 planted clusters × 50 members, noise 0.05 —
  * the shape real embedding corpora have), 50 one-per-cluster queries,
  * exact brute-force ground truth, and wall/recall/probe numbers for
  * every production search path:
  *
  *   - LSH multi-probe (the sim_ann_lsh configuration)
  *   - IVF margin-adaptive over autoCells (the sim_ann_ivf config; ~98
  *     cells at n=100k → flat literal path)
  *   - two-level IVF, pruned production form (the sim_ann_ivf2 config;
  *     nCells=1024 > flatKMax forces the √k top level)
  *   - SemDeDup semanticDedup wall + drop fraction at autoCells
  *
  * Results are recorded in BASELINE.md §ANN-scale. Deterministic: corpus
  * from per-id seeded Random, queries fixed, so reruns reproduce.
  *
  * Usage: Test/runMain graft.tools.AnnSoak [n] [clusters]
  */
object AnnSoak {
  case class EmbRow(vec_id: Long, embedding: Seq[Float])

  def corpus(spark: SparkSession, n: Long, clusters: Int): DataFrame = {
    import spark.implicits._
    val dim = 64
    spark.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val c = (id % clusters).toInt
        val base = new scala.util.Random(c)
        val b = Array.fill(dim)(base.nextFloat() * 2f - 1f)
        val noise = new scala.util.Random(id)
        EmbRow(id, b.map(v => v + (noise.nextFloat() * 2f - 1f) * 0.05f).toSeq)
      }
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)).as("embedding"))
  }

  /** Adversarial 100k corpus (r17 verdict #2): the planted-cluster corpus
    * above reads recall 1.000 on every path — 50-member clusters make the
    * top-5 trivially co-located — so it validates plumbing, not the hard
    * regime the sf0.001 floors measure. This draw scales the AnnSpec
    * adversarial structure up: n UNIFORM random vectors (dim-64 cosines
    * concentrate near 0 ± ~0.12, but the MAX over 100k draws reaches
    * ~0.5 — the noise ceiling), plus 5 planted near-margin neighbors PER
    * QUERY at mixing alphas 0.70/0.60/0.50/0.45/0.40, i.e. cosines
    * ≈ 0.92/0.83/0.71/0.63/0.55 (vec = α·q̂ + (1-α)·n̂): the deepest
    * plants sit AT the noise ceiling, so the true top-5 is a
    * planted-plus-extreme-noise mix and recall measures genuine
    * retrieval hardness at the hash/cell margin — exactly where
    * multi-probe and margin-adaptive probing earn or lose recall.
    * Planted ids live at n..n+5·nq-1, derived deterministically from
    * their query's base vector.
    */
  def adversarialCorpus(spark: SparkSession, n: Long, qStride: Long): DataFrame = {
    import spark.implicits._
    val dim = 64
    val alphas = Array(0.70f, 0.60f, 0.50f, 0.45f, 0.40f)
    val nq = n / qStride // queries are ids 0, qStride, 2·qStride, …
    def uniform(seed: Long): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
    }
    def norm(v: Array[Float]): Array[Float] = {
      val s = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / s)
    }
    spark.range(n + 5 * nq).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val v =
          if (id < n) uniform(id)
          else {
            val j = id - n
            val q = norm(uniform((j / 5) * qStride)) // the query's unit vector
            val a = alphas((j % 5).toInt)
            val noise = norm(uniform(id * 7919L + 13))
            q.zip(noise).map { case (qv, nv) => a * qv + (1 - a) * nv }
          }
        EmbRow(id, v.toSeq)
      }
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val clusters = if (args.length > 1) args(1).toInt else 2000
    val adversarial = args.length > 2 && args(2) == "adversarial"
    val spark = GraftSession.getOrCreate("graft-ann-soak")
    val qStride = math.max(1L, n / 50)
    val emb =
      (if (adversarial) adversarialCorpus(spark, n, qStride)
       else corpus(spark, n, clusters)).localCheckpoint(true)
    println(s"corpus: ${emb.count()} vectors, " +
      (if (adversarial) "adversarial uniform+near-margin" else s"$clusters clusters") +
      ", dim 64")
    val queries = emb.where(col("vec_id") < n && col("vec_id") % qStride === 0)
      .localCheckpoint(true)
    val nq = queries.count()
    println(s"queries: $nq")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val k = 5
    val exact = timed("bruteforce ground truth") {
      Ann.bruteForceTopK(queries, emb, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    def recall(approx: Set[(Long, Long)], label: String): Unit =
      println(f"$label%-28s recall@$k = ${exact.intersect(approx).size.toDouble / exact.size}%.3f")

    val lsh = timed(s"lsh multi-probe x${Ann.LshProbes}")(
      Ann.lshTopK(queries, emb, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    recall(lsh, s"lsh multi-probe x${Ann.LshProbes}")
    if (adversarial) {
      // recall/probe curve (r17 verdict #2): how each path buys recall
      // with probes in the hard regime
      Seq(1, 3, 5).foreach { p =>
        val s = timed(s"lsh multi-probe x$p")(
          Ann.lshTopK(queries, emb, k, nProbe = p).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet)
        recall(s, s"lsh multi-probe x$p")
      }
    }

    val nCellsFlat = Ivf.autoCells(n)
    val flatIdx = timed(s"ivf build (flat, $nCellsFlat cells)")(
      Ivf.build(emb, nCells = nCellsFlat))
    val adaptive = timed("ivf margin-adaptive 4..6")(
      Ivf.ivfTopKAdaptive(flatIdx, queries, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    recall(adaptive, "ivf margin-adaptive 4..6")
    val avgProbes = queries.select(size(Ivf.probeCellsMargin(
        col("embedding"), flatIdx.centroids, 4, 6, 0.1)).as("p"))
      .agg(avg(col("p"))).collect()(0).getDouble(0)
    println(f"ivf adaptive avg probes       $avgProbes%.2f of $nCellsFlat cells")

    if (adversarial) {
      Seq(4, 8, 16, 32).foreach { p =>
        val s = timed(s"ivf flat nProbe=$p")(
          Ivf.ivfTopK(flatIdx, queries, k, nProbe = p).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet)
        recall(s, s"ivf flat nProbe=$p")
      }
    }

    val tlIdx = timed("ivf2 build (two-level, 1024 cells)")(
      Ivf.build(emb, nCells = 1024))
    val pruned = timed("ivf2 pruned (nProbe=4, top=3)")(
      Ivf.ivfTopKTwoLevel(tlIdx, queries, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    recall(pruned, "ivf2 pruned (nProbe=4, top=3)")

    timed("semanticDedup autoCells") {
      Ivf.semanticDedupWith(emb, threshold = 0.9) { df =>
        val drops = df.where(!col("keep")).count()
        println(f"semanticDedup drops           $drops (${100.0 * drops / n}%.1f%% at cos>=0.9)")
      }
    }
    spark.stop()
  }
}
