package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Ann

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

  test("lshTopK results are a subset of same-bucket candidates with decent recall@5") {
    val queries = emb.where(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(queries, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(queries, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Corpus, hyperplanes, and tie-breaks are all deterministic, so recall
    // is a stable number (measured 0.38 on this corpus) — gate it with
    // margin rather than merely asserting structure.
    assert(approx.nonEmpty)
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"recall@5 = $recall")
    assert(recall >= 0.2,
      s"LSH recall regressed below the gated floor: $recall")
  }

  test("IVF top-k: valid structure and recall competitive with probing rate") {
    val queries = emb.where(col("vec_id") < 20)
    val index = graft.similarity.Ivf.build(emb, nCells = 8)
    val approx = graft.similarity.Ivf.ivfTopK(index, queries, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty)
    val exact = Ann.bruteForceTopK(queries, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"ivf recall@5 = $recall (2/8 cells probed)")
    // deterministic k-means seed + corpus → stable recall (measured 0.48)
    assert(recall >= 0.25,
      s"IVF recall regressed below the gated floor: $recall")
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

  test("semanticDedup: verdicts equal the per-cell local recomputation; min-id survivorship") {
    val t = 0.2 // low threshold on random vectors so drops actually occur
    val out = graft.similarity.Ivf.semanticDedup(emb, nCells = 8, threshold = t)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    // recompute from the same deterministic assignment, driver-side
    val assigned = graft.similarity.Ivf.build(emb, nCells = 8).assigned
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val byCell = assigned.groupBy(_._3)
    val want = assigned.map { case (id, e, cell) =>
      val lowerDups = byCell(cell).filter { case (id2, e2, _) =>
        id2 < id && Ann.cosineLocal(e, e2,
          Ann.l2normLocal(e), Ann.l2normLocal(e2)) >= t
      }.map(_._1)
      id -> (if (lowerDups.isEmpty) None else Some(lowerDups.min))
    }.toMap
    assert(out.keySet == want.keySet)
    want.foreach { case (id, dupOf) =>
      val (_, keep, gotDup) = out(id)
      assert(keep == dupOf.isEmpty, s"vec $id: keep verdict diverged")
      assert(gotDup == dupOf, s"vec $id: dup_of attribution diverged")
    }
    assert(want.values.exists(_.nonEmpty), "threshold too high: no drops exercised")
    assert(want.values.exists(_.isEmpty), "threshold too low: nothing kept")
  }

  test("lsh bucket is deterministic") {
    val b1 = emb.select(Ann.lshBucket(col("embedding"), 0).as("b")).collect().map(_.getLong(0))
    val b2 = emb.select(Ann.lshBucket(col("embedding"), 0).as("b")).collect().map(_.getLong(0))
    assert(b1.toSeq == b2.toSeq)
  }
}
