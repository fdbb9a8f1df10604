package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.Tables
import graft.similarity.{Ann, Ivf}

/** Dev tool (test scope, not shipped): measures IVF recall@5 / recall@10 and
  * average probe counts for the fixed-nProbe vs margin-adaptive probe sets
  * on the sf0.001 embeddings corpus — the evidence behind the
  * [[graft.similarity.Ivf.ivfTopKAdaptive]] defaults and the AnnSpec floors.
  *
  * Usage: Test/runMain graft.tools.IvfTune [sfDir]
  */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.getOrCreate("graft-ivf-tune")
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < 20)

    def recallOf(approx: Set[(Long, Long)], k: Int): Double = {
      val exact = Ann.bruteForceTopK(queries, emb, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(approx).size.toDouble / exact.size
    }

    Seq(8, 16).foreach { nCells =>
      val index = Ivf.build(emb, nCells = nCells)
      Seq(2, 3, 4).foreach { p =>
        Seq(5, 10).foreach { k =>
          val approx = Ivf.ivfTopK(index, queries, k, nProbe = p).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          println(f"nCells=$nCells fixed nProbe=$p k=$k recall=${recallOf(approx, k)}%.3f avgProbes=$p")
        }
      }
      Seq((3, 5, 0.05), (3, 5, 0.10), (4, 6, 0.02), (4, 6, 0.05), (4, 6, 0.10)).foreach {
        case (np, mp, m) =>
          val avgProbes = queries
            .select(size(Ivf.probeCellsMargin(col("embedding"), index.centroids, np, mp, m)).as("n"))
            .agg(avg(col("n"))).collect()(0).getDouble(0)
          Seq(5, 10).foreach { k =>
            val approx = Ivf.ivfTopKAdaptive(index, queries, k, np, mp, m).collect()
              .map(r => (r.getLong(0), r.getLong(1))).toSet
            println(f"nCells=$nCells adaptive min=$np max=$mp margin=$m k=$k recall=${recallOf(approx, k)}%.3f avgProbes=$avgProbes%.2f")
          }
      }
    }

    // LSH recall@10 beside the @5 the spec already pins, across probe counts
    // (r17: extended past x5 — the LshProbeBuckets codegen fix made probe
    // count nearly free on the bucket side; candidates are the real cost)
    // (7 = 1 + NumPlanes is the single-bit multi-probe maximum)
    Seq(3, 4, 5, 6, 7).foreach { np =>
      Seq(5, 10).foreach { k =>
        val exact = Ann.bruteForceTopK(queries, emb, k).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val approx = Ann.lshTopK(queries, emb, k, nProbe = np).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"lsh nProbe=$np k=$k recall=${exact.intersect(approx).size.toDouble / exact.size}%.3f")
      }
    }

    // planted clusters: the margin arm should collapse probe counts to ~1
    // for deep-interior queries while holding recall
    val rnd = new scala.util.Random(42)
    val dim = 64
    val rows = for {
      c <- 0 until 20
      base = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
      i <- 0 until 25
    } yield (c * 25L + i, base.map(v => v + (rnd.nextFloat() * 2f - 1f) * 0.02f).toSeq)
    import spark.implicits._
    val planted = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)).as("embedding"))
    val pQueries = planted.where(col("vec_id") % 25 === 0)
    val pIndex = Ivf.build(planted, nCells = 16)
    val pExact = Ann.bruteForceTopK(pQueries, planted, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq((1, 4, 0.5), (1, 4, 1.0), (2, 6, 0.5)).foreach { case (np, mp, m) =>
      val avgProbes = pQueries
        .select(size(Ivf.probeCellsMargin(col("embedding"), pIndex.centroids, np, mp, m)).as("n"))
        .agg(avg(col("n"))).collect()(0).getDouble(0)
      val approx = Ivf.ivfTopKAdaptive(pIndex, pQueries, 5, np, mp, m).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"planted adaptive min=$np max=$mp margin=$m recall@5=${pExact.intersect(approx).size.toDouble / pExact.size}%.3f avgProbes=$avgProbes%.2f")
    }

    // Two-level search: topProbe-vs-recall curve for the PRUNED production
    // form (r16 verdict #2 — the only ANN path without a recall floor).
    // nCells=200 forces the two-level build on this corpus; the flat
    // literal path over the SAME index at the same nProbe is the
    // pruning-loss-free reference, so recall ratio pruned/flat isolates
    // exactly what topProbe pruning costs.
    val tlIndex = Ivf.build(emb, nCells = 200)
    val k1 = tlIndex.topCentroids.get.length
    Seq(5, 10).foreach { k =>
      val exact = Ann.bruteForceTopK(queries, emb, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val flat = Ivf.ivfTopK(tlIndex, queries, k, nProbe = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val flatRecall = exact.intersect(flat).size.toDouble / exact.size
      (1 to k1).foreach { tp =>
        val pruned = Ivf.ivfTopKTwoLevel(tlIndex, queries, k, nProbe = 4,
          topProbe = tp).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val r = exact.intersect(pruned).size.toDouble / exact.size
        val vsFlat = pruned.intersect(flat).size.toDouble / flat.size
        println(f"twolevel nCells=200 k1=$k1 topProbe=$tp k=$k " +
          f"recall=$r%.3f flatRecall=$flatRecall%.3f probeAgreement=$vsFlat%.3f")
      }
    }
    // planted clusters under a two-level index: 200 cells over 20 tight
    // clusters shatter each cluster across ~10 sub-cells, but those
    // sub-cells share the cluster's top cell, so the pruned search should
    // hold high absolute recall — the clustered-corpus gate for the
    // production (topProbe < k1) form.
    val pTl = Ivf.build(planted, nCells = 200)
    val pK1 = pTl.topCentroids.get.length
    (1 to math.min(4, pK1)).foreach { tp =>
      val approx = Ivf.ivfTopKTwoLevel(pTl, pQueries, 5, nProbe = 4, topProbe = tp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"planted twolevel k1=$pK1 topProbe=$tp " +
        f"recall@5=${pExact.intersect(approx).size.toDouble / pExact.size}%.3f")
    }
    spark.stop()
  }
}
