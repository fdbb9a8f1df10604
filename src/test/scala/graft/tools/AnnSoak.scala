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

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val clusters = if (args.length > 1) args(1).toInt else 2000
    val spark = GraftSession.getOrCreate("graft-ann-soak")
    val emb = corpus(spark, n, clusters).localCheckpoint(true)
    println(s"corpus: ${emb.count()} vectors, $clusters clusters, dim 64")
    val queries = emb.where(col("vec_id") % math.max(1L, n / 50) === 0)
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
