package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(edges.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to one component labeled by its min (transitivity)") {
    // 1-2, 2-3, 3-4, 4-5: A~B, B~C must merge even though A!~C
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate min labels") {
    val got = cc(Seq((10L, 11L), (20L, 21L), (21L, 22L), (5L, 10L)))
    assert(got == Map(5L -> 5L, 10L -> 5L, 11L -> 5L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("edge direction and duplicates do not matter") {
    val a = cc(Seq((2L, 1L), (1L, 2L), (2L, 3L)))
    val b = cc(Seq((1L, 2L), (3L, 2L)))
    assert(a == b)
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("self-loops and null-free handling") {
    val got = cc(Seq((1L, 1L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("star graph converges in few rounds with high-id center") {
    // center 100 connected to 1..6: min label 1 must reach all spokes
    val got = cc((1L to 6L).map(i => (100L, i)))
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 6L).toSet + 100L)
  }

  private def ccStar(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.componentsStar(edges.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference union-find on the driver — ground truth for both variants. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // min id per root
    val minOf = verts.groupBy(find).map { case (r, vs) => r -> vs.min }
    verts.map(v => v -> minOf(find(v))).toMap
  }

  test("large-star/small-star equals propagation equals union-find on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m,
        Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield edges.filter(e => e._1 != e._2)
    (0 until 8).foreach { i =>
      val edges = edgeGen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil)
      if (edges.nonEmpty) {
        val want = ufComponents(edges)
        assert(cc(edges) == want, s"propagation differs from union-find, seed=$i")
        assert(ccStar(edges) == want, s"star variant differs from union-find, seed=$i")
      }
    }
  }

  test("large-star/small-star handles a long chain (diameter >> rounds)") {
    val chain = (1L until 20L).map(i => (i, i + 1))
    assert(ccStar(chain).values.toSet == Set(1L))
  }

  test("long chain (diameter 600): both variants converge within their round budgets") {
    // The adversarial shape for label propagation is a path graph — diameter
    // equals vertex count. Pointer jumping must collapse it in ~log2(600)≈10
    // rounds (default maxIter 25 would THROW on non-convergence if rounds
    // scaled with diameter), and the star rewrite's O(log n) bound is
    // likewise exercised far beyond the toy sizes.
    val chain = (1L until 600L).map(i => (i, i + 1))
    val viaProp = cc(chain)
    assert(viaProp.values.toSet == Set(1L) && viaProp.size == 600)
    val viaStar = ccStar(chain)
    assert(viaStar == viaProp)
  }

  test("componentsAuto: both dispatch branches label the real corpus graph identically") {
    import org.apache.spark.sql.functions.col
    // the actual dedup edge set clusterLabels feeds it, both paths forced
    val edges = graft.queries.DedupQueries.ngramJaccardPairs(spark, TestSpark.sf0001)
      .where(col("jaccard") >= 0.2).select("doc_a", "doc_b")
    def labels(threshold: Long) = ConnectedComponents
      .componentsAuto(edges, "doc_a", "doc_b", starEdgeThreshold = threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStar = labels(0L)           // count > 0 → componentsStar
    val viaProp = labels(Long.MaxValue) // count <= max → components
    assert(viaStar.nonEmpty)
    assert(viaStar == viaProp,
      "dispatch branches must be label-equivalent on the corpus graph")
  }
}
