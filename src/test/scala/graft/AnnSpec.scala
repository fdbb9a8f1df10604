package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Ann

/** Planted-cluster fixture row (file-scope for encoder derivation). */
case class PlantedEmb(vec_id: Long, embedding: Seq[Float])

class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val emb = Tables.embeddings(spark, TestSpark.sf0001)

  test("cosine of a vector with itself is 1.0") {
    val self = emb.where(col("vec_id") === 0)
      .select(Ann.cosine(col("embedding"), col("embedding")).as("c"))
      .collect()(0).getDouble(0)
    assert(math.abs(self - 1.0) < 1e-9)
  }

  test("bruteForceTopK returns k ranked neighbors per query, no self-match") {
    val res = Ann.bruteForceTopK(emb.where(col("vec_id") < 3), emb, k = 5).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.length == 5)
      assert(rows.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      // ranked by descending cosine
      val cos = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(!rows.exists(r => r.getLong(1) == r.getLong(0)))
    }
  }

  test("lshTopK results are a subset of same-bucket candidates with decent recall@5/@10") {
    val queries = emb.where(col("vec_id") < 20)
    // Corpus, hyperplanes, and tie-breaks are all deterministic, so recall
    // is a stable number (measured 0.74@5 / 0.66@10 on this corpus with
    // query-directed multi-probe ×7, r17 — 0.38 single-probe, 0.65@5 at
    // ×3, 0.70/0.61 at ×5; ×7 = 1 + NumPlanes is the single-bit maximum)
    // — gate each at measured − 0.1 (r11 verdict item #6: a 0.2 floor
    // would pass a badly broken index).
    Seq((5, 0.64, 0.74), (10, 0.55, 0.66)).foreach { case (k, floor, measured) =>
      val exact = Ann.bruteForceTopK(queries, emb, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = Ann.lshTopK(queries, emb, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(approx.nonEmpty)
      val recall = exact.intersect(approx).size.toDouble / exact.size
      info(s"recall@$k = $recall")
      assert(recall >= floor,
        s"LSH recall@$k regressed below measured-minus-margin ($measured - ~0.1): $recall")
    }
  }

  test("IVF top-k: valid structure and recall competitive with probing rate (margin-adaptive)") {
    val queries = emb.where(col("vec_id") < 20)
    val index = graft.similarity.Ivf.build(emb, nCells = 8)
    // margin-adaptive probing (r16, verdict #6): minProbe=4 nearest cells
    // always, margin-qualified extras up to 6 — measured 0.74@5 / 0.76@10
    // at 4.3 avg probes on this corpus (IvfTune; fixed nProbe=4 reads
    // 0.71/0.73, fixed 3 read 0.60/0.625 pre-r16). Floors = measured − ~0.1.
    Seq((5, 0.6, 0.74), (10, 0.6, 0.76)).foreach { case (k, floor, measured) =>
      val approx = graft.similarity.Ivf.ivfTopKAdaptive(index, queries, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(approx.nonEmpty)
      val exact = Ann.bruteForceTopK(queries, emb, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exact.intersect(approx).size.toDouble / exact.size
      info(s"ivf recall@$k = $recall (adaptive 4..6 of 8 cells probed)")
      assert(recall >= floor,
        s"IVF recall@$k regressed below measured-minus-margin ($measured - ~0.1): $recall")
    }
  }

  test("allPairsTopN: blocked grid covers every pair exactly once (multi-block == single-block == local reference)") {
    // Force a multi-block grid (500 rows / 64-per-block = 8 blocks, 36 block
    // pairs) and compare against the degenerate single-block run and a local
    // reference computation. Any missed/duplicated block-pair key would move
    // the top-10 or its cosines.
    val multi = Ann.allPairsTopN(emb, topN = 10, rowsPerBlock = 64).collect()
    val single = Ann.allPairsTopN(emb, topN = 10, rowsPerBlock = Int.MaxValue).collect()
    assert(multi.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      single.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)

    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val local = (for {
      (ida, ea) <- rows; (idb, eb) <- rows if ida < idb
    } yield {
      val c = Ann.cosineLocal(ea, eb, Ann.l2normLocal(ea), Ann.l2normLocal(eb))
      (ida, idb, math.floor(c * 10000 + 0.5) / 10000)
    }).sortBy { case (a, b, c) => (-c, a, b) }.take(10)
    assert(multi.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq == local.toSeq)

    // fuzz the grid geometry: any block size must produce the same top-10
    // (catches off-by-one in the block-pair replication ranges)
    Seq(1, 3, 17, 100, 499, 500, 501).foreach { rpb =>
      val got = Ann.allPairsTopN(emb, topN = 10, rowsPerBlock = rpb).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == local.toSeq, s"rowsPerBlock=$rpb diverged")
    }
  }

  test("allPairsTopN: fully distributed plan — no driver collect, no typed path, no UDF") {
    // The pre-r5 implementation collected the whole corpus to the driver and
    // re-emitted it via mapPartitions; that shape shows up in the physical
    // plan as DeserializeToObject/SerializeFromObject (typed boundary). The
    // blocked form must be pure relational ops end to end.
    val plan = Ann.allPairsTopN(emb, topN = 10, rowsPerBlock = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), "typed boundary found:\n" + plan)
    assert(!plan.contains("SerializeFromObject"), "typed boundary found:\n" + plan)
    assert(!plan.contains("ScalaUDF"), "UDF found:\n" + plan)
    assert(plan.contains("Join"), "expected a block-pair join:\n" + plan)
  }

  test("semanticDedup: verdicts equal the per-cell local recomputation at nCells in {4, 16, 64}") {
    val t = 0.2 // low threshold on random vectors so drops actually occur
    Seq(4, 16, 64).foreach { k =>
      val out = graft.similarity.Ivf.semanticDedup(emb, nCells = k, threshold = t)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap
      // recompute from the same deterministic assignment, driver-side
      val assigned = graft.similarity.Ivf.build(emb, nCells = k).assigned
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      val byCell = assigned.groupBy(_._3)
      val want = assigned.map { case (id, e, cell) =>
        val lowerDups = byCell(cell).filter { case (id2, e2, _) =>
          id2 < id && Ann.cosineLocal(e, e2,
            Ann.l2normLocal(e), Ann.l2normLocal(e2)) >= t
        }.map(_._1)
        id -> (if (lowerDups.isEmpty) None else Some(lowerDups.min))
      }.toMap
      assert(out.keySet == want.keySet, s"nCells=$k: id set diverged")
      want.foreach { case (id, dupOf) =>
        val (_, keep, gotDup) = out(id)
        assert(keep == dupOf.isEmpty, s"nCells=$k vec $id: keep verdict diverged")
        assert(gotDup == dupOf, s"nCells=$k vec $id: dup_of attribution diverged")
      }
      assert(want.values.exists(_.nonEmpty), s"nCells=$k: threshold too high, no drops")
      assert(want.values.exists(_.isEmpty), s"nCells=$k: threshold too low, nothing kept")
    }
  }

  test("autoCells: corpus-proportional with floor 1 and the broadcast-bound cap") {
    import graft.similarity.Ivf
    assert(Ivf.autoCells(0) == 1)
    assert(Ivf.autoCells(500) == 1)
    assert(Ivf.autoCells(1024) == 1)
    assert(Ivf.autoCells(1025) == 2)
    // SemDeDup web-scale posture: ~1e9 docs at the default target → 1e6
    // wanted cells, clamped to the documented broadcast-table cap
    assert(Ivf.autoCells(1000000000L) == Ivf.maxAutoCells)
    // constant cell size ⇒ linear total pair cost: k(n) doubles with n
    assert(Ivf.autoCells(1 << 20) * 2 == Ivf.autoCells(1 << 21))
  }

  test("two-level quantizer: assignment equals the local two-level recompute, no vector dropped") {
    import graft.similarity.Ivf
    val k = 200 // > flatKMax → forces the two-level path
    assert(k > Ivf.flatKMax)
    val index = Ivf.build(emb, nCells = k)
    val top = index.topCentroids.getOrElse(fail("two-level path not taken"))
    val cellTop = index.cellTop.get
    assert(cellTop.length == index.centroids.length)
    val got = index.assigned.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    assert(got.length == emb.count(), "assignment dropped or duplicated vectors")

    // mirrors the engine's monotone-equivalent form |x|²−2·x·c+|c|² with the
    // same sequential double accumulation as the codegen'd expressions
    def distSq(e: Array[Float], c: Array[Float]): Double = {
      var dot = 0.0; var i = 0
      while (i < e.length) { dot += e(i).toDouble * c(i).toDouble; i += 1 }
      val nrm = Ann.l2normLocal(e)
      val cNormSq = c.map(v => v.toDouble * v.toDouble).sum
      nrm * nrm - 2.0 * dot + cNormSq
    }
    got.foreach { case (id, e, cell) =>
      // top level: argmin over top centroids, ties → lowest index (the
      // probeCells struct-sort tie-break)
      var bestT = 0; var bestD = Double.MaxValue
      top.indices.foreach { t =>
        val d = distSq(e, top(t))
        if (d < bestD) { bestD = d; bestT = t }
      }
      // sub level: min over (d, cell) among that top cell's sub-centroids
      val want = index.centroids.indices
        .filter(cellTop(_) == bestT)
        .map(c => (distSq(e, index.centroids(c)), c)).min._2
      assert(cell == want, s"vec $id: two-level assignment diverged")
    }
    info(s"two-level: k1=${top.length} top cells, ${index.centroids.length} global cells")
  }

  test("ivfTopKTwoLevel: with full top coverage it EQUALS the flat literal path; pruned form valid; flat index rejected") {
    import graft.similarity.Ivf
    val queries = emb.where(col("vec_id") < 20)
    val index = Ivf.build(emb, nCells = 200) // > flatKMax -> two-level
    val k1 = index.topCentroids.get.length
    // topProbe >= k1 means no top-level pruning: the nProbe-nearest probe
    // set over all 200 cells must match probeCells' literal ranking exactly,
    // so the search result is row-identical to the flat path
    val flat = Ivf.ivfTopK(index, queries, k = 5, nProbe = 4)
      .collect().map(_.toString).toSeq
    val full = Ivf.ivfTopKTwoLevel(index, queries, k = 5, nProbe = 4,
      topProbe = k1).collect().map(_.toString).toSeq
    assert(full == flat,
      "two-level search with full top coverage diverged from the flat literal path")
    // pruned top level: valid structure (5 ranked rows per query, no self)
    val pruned = Ivf.ivfTopKTwoLevel(index, queries, k = 5, nProbe = 4,
      topProbe = 3).collect()
    val byQ = pruned.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq)
      assert(!rows.exists(r => r.getLong(1) == r.getLong(0)))
    }
    info(s"two-level search: k1=$k1 top cells, pruned form returned ${pruned.length} rows")
    // a flat index has no top level -> loud rejection, not silent fallback
    val flatIndex = Ivf.build(emb, nCells = 16)
    val ex = intercept[IllegalArgumentException] {
      Ivf.ivfTopKTwoLevel(flatIndex, queries, k = 5)
    }
    assert(ex.getMessage.contains("flat path"))
  }

  test("ivfTopKTwoLevel PRUNED form: recall floor vs the flat path at the production defaults") {
    // r16 verdict #2: the pruned search (topProbe < k1 — the form
    // sim_ann_ivf2 benches and the only one that matters at SemDeDup-scale
    // k) was pinned row-valid + equivalent-at-full-coverage only; a
    // top-level boundary miss would silently cost recall. Gate it RELATIVE
    // to the flat literal path over the SAME index at the same nProbe —
    // that ratio isolates exactly what top-level pruning costs (absolute
    // recall on this adversarial 500-vector/200-cell corpus is probe-
    // bounded at ~0.37 for flat itself, too noisy for an absolute floor).
    // Measured (IvfTune r17, deterministic corpus): topProbe=3 holds
    // recall 0.32@5 vs flat 0.37 (ratio 0.86) and 0.295@10 vs 0.335
    // (0.88); probe agreement 0.70. Floor = 0.55x flat per the verdict.
    import graft.similarity.Ivf
    val queries = emb.where(col("vec_id") < 20)
    val index = Ivf.build(emb, nCells = 200)
    Seq(5, 10).foreach { k =>
      val exact = Ann.bruteForceTopK(queries, emb, k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val flat = Ivf.ivfTopK(index, queries, k, nProbe = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val pruned = Ivf.ivfTopKTwoLevel(index, queries, k, nProbe = 4, topProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val flatRecall = exact.intersect(flat).size.toDouble / exact.size
      val prunedRecall = exact.intersect(pruned).size.toDouble / exact.size
      info(f"two-level pruned recall@$k = $prunedRecall%.3f vs flat $flatRecall%.3f")
      assert(prunedRecall >= 0.55 * flatRecall,
        s"pruned two-level recall@$k fell below 0.55x the flat path: " +
          s"$prunedRecall vs flat $flatRecall")
    }
  }

  test("planted clusters: two-level pruned search holds recall@5 >= 0.7") {
    // Clustered-corpus gate for the pruned form: 200 cells shatter each of
    // the 20 planted clusters across ~10 sub-cells, but those sub-cells
    // share the cluster's top cell, so topProbe=3 pruning loses nothing —
    // measured 0.81 at every topProbe in 1..k1 (IvfTune r17; the 0.19 gap
    // to 1.0 is nProbe=4 probe-count-bounded, identical for the flat
    // path). Floor = measured - ~0.1, the sibling convention.
    import graft.similarity.Ivf
    val queries = planted.where(col("vec_id") % 25 === 0)
    val exact = Ann.bruteForceTopK(queries, planted, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val index = Ivf.build(planted, nCells = 200)
    val approx = Ivf.ivfTopKTwoLevel(index, queries, k = 5, nProbe = 4, topProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"planted two-level pruned recall@5 = $recall%.3f")
    assert(recall >= 0.7,
      s"pruned two-level recall regressed on clustered fixture: $recall")
  }

  test("semanticDedupWith releases the assignment checkpoint; result matches semanticDedup") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val viaWith = graft.similarity.Ivf.semanticDedupWith(emb, nCells = 8, threshold = 0.2) {
      df => df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    }
    val after = sc.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"checkpoint leaked: persistent RDDs ${after -- before} remain")
    val direct = graft.similarity.Ivf.semanticDedup(emb, nCells = 8, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(viaWith == direct)
  }

  // ---- planted-cluster recall: the structured-embedding regression gate ----
  // The random-vector corpus above is the adversarial case (cosines
  // concentrate near 0) and its honest floors are 0.2/0.25 — too low to
  // catch a real recall regression. Real embedding corpora are clustered;
  // this fixture plants 20 tight clusters (base + small noise) where any
  // correct LSH/IVF configuration must reach recall ≥ 0.9.
  lazy val planted = {
    val rnd = new scala.util.Random(42)
    val dim = 64
    val rows = for {
      c <- 0 until 20
      base = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
      i <- 0 until 25
    } yield PlantedEmb(c * 25L + i,
      base.map(v => v + (rnd.nextFloat() * 2f - 1f) * 0.02f).toSeq)
    val s = spark
    import s.implicits._
    s.createDataset(rows).toDF()
      .select(col("vec_id"), col("embedding").cast(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)).as("embedding"))
  }

  test("planted clusters: LSH recall@5 >= 0.9 (6 bits x 8 tables)") {
    val queries = planted.where(col("vec_id") % 25 === 0) // one per cluster
    val exact = Ann.bruteForceTopK(queries, planted, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(queries, planted, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"planted LSH recall@5 = $recall")
    assert(recall >= 0.9, s"LSH recall regressed on clustered fixture: $recall")
  }

  test("planted clusters: IVF recall@5 >= 0.9 (nCells=16, nProbe=2)") {
    val queries = planted.where(col("vec_id") % 25 === 0)
    val exact = Ann.bruteForceTopK(queries, planted, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val index = graft.similarity.Ivf.build(planted, nCells = 16)
    val approx = graft.similarity.Ivf.ivfTopK(index, queries, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"planted IVF recall@5 = $recall")
    assert(recall >= 0.9, s"IVF recall regressed on clustered fixture: $recall")
  }

  test("planted clusters: margin-adaptive probing holds recall >= 0.9 at ~1 avg probe") {
    // The payoff case for probeCellsMargin: clustered queries sit DEEP in
    // their cells, so the margin arm collapses the probe count to ~1 where
    // fixed probing pays 2+ — recall stays ≥ 0.9 (measured 0.96 at 1.15 avg
    // probes, IvfTune r16). The avg-probe ceiling pins the adaptivity claim
    // itself, not just recall.
    val queries = planted.where(col("vec_id") % 25 === 0)
    val index = graft.similarity.Ivf.build(planted, nCells = 16)
    val exact = Ann.bruteForceTopK(queries, planted, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.similarity.Ivf
      .ivfTopKAdaptive(index, queries, k = 5, minProbe = 1, maxProbe = 4, margin = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    val avgProbes = queries.select(size(graft.similarity.Ivf.probeCellsMargin(
        col("embedding"), index.centroids, 1, 4, 0.5)).as("n"))
      .agg(avg(col("n"))).collect()(0).getDouble(0)
    info(s"planted adaptive IVF recall@5 = $recall at avgProbes = $avgProbes")
    assert(recall >= 0.9, s"adaptive IVF recall regressed on clustered fixture: $recall")
    assert(avgProbes <= 2.0,
      s"margin arm stopped collapsing interior probe counts: $avgProbes")
  }

  test("LshProbeBuckets expression is bit-identical to the Column reference forms") {
    // The search path computes every probe bucket in one compiled loop
    // (constant-size codegen); the Column fold/sort forms it replaced are
    // kept as the executable spec. Any drift — plane formula, bit order,
    // flip order, tie-breaks — moves a bucket here.
    import graft.expressions.LshExpressions
    val nProbe = Ann.LshProbes
    val exprCols = emb.select(col("vec_id"),
      LshExpressions.lshAllProbes(col("embedding"),
        Ann.NumPlanes, Ann.NumTables, nProbe).as("probes"))
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    (0 until Ann.NumTables).foreach { t =>
      val refCols = Ann.tableProbes(col("embedding"), t, nProbe)
        .zipWithIndex.map { case (c, i) => c.as(s"p$i") }
      val ref = emb.select(col("vec_id") +: refCols: _*)
        .orderBy("vec_id").collect()
        .map(r => r.getLong(0) -> (1 to nProbe).map(r.getLong))
      exprCols.zip(ref).foreach { case ((id1, all), (id2, want)) =>
        assert(id1 == id2)
        val got = all.slice(t * nProbe, (t + 1) * nProbe)
        assert(got == want,
          s"table $t vec $id1: expression probes $got != reference $want")
      }
    }
    // the single-bucket (nProbe=1) layout matches lshBucket per table
    val single = emb.select(col("vec_id"),
      LshExpressions.lshAllProbes(col("embedding"),
        Ann.NumPlanes, Ann.NumTables, 1).as("b"))
      .orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    (0 until Ann.NumTables).foreach { t =>
      val ref = emb.select(col("vec_id"), Ann.lshBucket(col("embedding"), t))
        .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      single.zip(ref).foreach { case ((id1, bs), (id2, b)) =>
        assert(id1 == id2 && bs(t) == b, s"table $t vec $id1 bucket drifted")
      }
    }
  }

  test("LshProbeBuckets rejects nProbe beyond the single-bit flip budget") {
    // 1 + NumPlanes is the maximum distinct single-bit probes per table;
    // the Column form silently produced NULL probes past it (element_at
    // out of bounds), the expression fails loudly at construction
    import graft.expressions.LshExpressions
    val ex = intercept[IllegalArgumentException] {
      emb.select(LshExpressions.lshAllProbes(col("embedding"),
        Ann.NumPlanes, Ann.NumTables, Ann.NumPlanes + 2))
    }
    assert(ex.getMessage.contains("out of range"))
    // the maximum itself is valid
    val full = emb.limit(1).select(LshExpressions.lshAllProbes(col("embedding"),
      Ann.NumPlanes, Ann.NumTables, Ann.NumPlanes + 1)).collect()(0).getSeq[Long](0)
    assert(full.length == Ann.NumTables * (Ann.NumPlanes + 1))
  }

  test("lsh bucket is deterministic") {
    val b1 = emb.select(Ann.lshBucket(col("embedding"), 0).as("b")).collect().map(_.getLong(0))
    val b2 = emb.select(Ann.lshBucket(col("embedding"), 0).as("b")).collect().map(_.getLong(0))
    assert(b1.toSeq == b2.toSeq)
  }
}
