package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QueryCatalog

/** Semantic assertions for the round-4 queries (value-level correctness is
  * the DuckDB oracle gate; these pin the semantics the oracle can't express
  * as directly — per-row invariants and plan shapes).
  */
class Round4QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def df(name: String) =
    QueryCatalog.byName(name).build(spark, TestSpark.sf0001)

  test("j11_lateral_topk: at most 2 orders per customer, each among that customer's priciest") {
    val out = df("j11_lateral_topk").cache()
    try {
      val perCust = out.groupBy("c_custkey").count().agg(max("count")).head.getLong(0)
      assert(perCust <= 2)
      // cross-check against the window idiom (same semantics, different syntax)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val expect = Tables.orders(spark, TestSpark.sf0001)
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .where(col("rn") <= 2).drop("rn")
      assert(out.exceptAll(expect).isEmpty && expect.exceptAll(out).isEmpty)
    } finally out.unpersist()
  }

  test("j11_lateral_topk: correlated LIMIT decorrelates to WindowGroupLimit, no nested loop") {
    val plan = df("j11_lateral_topk").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected rank-limit pushdown:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"lateral join must not plan a nested loop:\n$plan")
  }

  test("a13_exists_subquery: every row has an urgent order and no finished order") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
    val urgent = orders.where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val finished = orders.where(col("o_orderstatus") === "F")
      .select(col("o_custkey")).distinct()
    val got = df("a13_exists_subquery").select(col("c_custkey"))
    assert(got.join(urgent, got("c_custkey") === urgent("o_custkey"), "left_anti").isEmpty)
    assert(got.join(finished, got("c_custkey") === finished("o_custkey"), "left_semi").isEmpty)
  }

  test("f22_width_bucket: buckets in [0,13] and counts sum to the table size") {
    val out = df("f22_width_bucket").collect()
    assert(out.forall { r => val b = r.getLong(0); b >= 0 && b <= 13 })
    val total = out.map(_.getLong(1)).sum
    assert(total == Tables.orders(spark, TestSpark.sf0001).count())
  }

  // (l_orderkey, l_linenumber) is not unique in this corpus, so assert by
  // counts rather than a (many-to-many) key join.
  test("f23_try_arith: per_disc is NULL exactly as often as discount is zero or null") {
    val out = df("f23_try_arith")
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val expectNull = li.where(col("l_discount") === 0 || col("l_discount").isNull
      || col("l_extendedprice").isNull).count()
    assert(out.where(col("per_disc").isNull).count() == expectNull)
    assert(out.count() == li.count())
  }

  test("r9_recursive_cte: contiguous month spine covering every order, counts sum to total") {
    val rows = df("r9_recursive_cte").collect()
    val months = rows.map(_.getDate(0).toLocalDate)
    months.sliding(2).foreach { pair =>
      if (pair.length == 2)
        assert(pair(0).plusMonths(1) == pair(1), s"gap between ${pair(0)} and ${pair(1)}")
    }
    assert(rows.map(_.getLong(1)).sum ==
      Tables.orders(spark, TestSpark.sf0001).count())
  }

  test("x9_sequence_packing: per-language packs partition all tokens, pack ids dense from 0") {
    val out = df("x9_sequence_packing").cache()
    try {
      val docs = Tables.documents(spark, TestSpark.sf0001)
        .select(col("lang"), size(split(col("text"), " ")).cast("long").as("tok"))
        .groupBy("lang").agg(sum("tok").as("total"), count(lit(1)).as("n"))
      val packed = out.groupBy("lang")
        .agg(sum("n_tokens").as("ptotal"), sum("n_docs").as("pn"),
          min("pack").as("lo"), max("pack").as("hi"), count(lit(1)).as("npacks"))
      val j = packed.join(docs, "lang").collect()
      j.foreach { r =>
        assert(r.getAs[Long]("ptotal") == r.getAs[Long]("total"), s"token loss in $r")
        assert(r.getAs[Long]("pn") == r.getAs[Long]("n"), s"doc loss in $r")
        assert(r.getAs[Long]("lo") == 0L, s"packs must start at 0: $r")
      }
    } finally out.unpersist()
  }

  test("x11_cms_heavy_hitters: CMS estimate bounded below by exact, above by exact + eps*N") {
    val rows = df("x11_cms_heavy_hitters").collect()
    assert(rows.length == 20)
    val totalTokens = Tables.documents(spark, TestSpark.sf0001)
      .select(sum(size(split(col("text"), " ")))).head.getLong(0)
    val slack = math.ceil(0.001 * totalTokens).toLong
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS must never undercount: $r")
      assert(est <= exact + slack, s"CMS overshoot beyond eps*N: $r (N=$totalTokens)")
    }
    // probe is the native cms_estimate_count expression, not a UDF boundary
    // (assert on the optimized logical plan — the physical string folds the
    // projection into TakeOrderedAndProject without printing its expressions)
    val plan = df("x11_cms_heavy_hitters").queryExecution.optimizedPlan.toString
    assert(!plan.contains("UDF"), "UDF probe found:\n" + plan)
    assert(plan.contains("cms_estimate_count"), "native CMS probe missing:\n" + plan)
  }

  test("BloomPrefilter.semiJoin is exact; prefilter passes all matches and few extras") {
    import graft.operators.BloomPrefilter
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val big = Tables.orders(spark, TestSpark.sf0001)
      .where(col("o_totalprice") > 300000).select("o_orderkey")
    val got = BloomPrefilter.semiJoin(li, "l_orderkey", big, "o_orderkey",
      expectedN = 10000L, fpp = 0.01)
    val want = li.join(big, li("l_orderkey") === big("o_orderkey"), "left_semi")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // prefilter alone: no false negatives, false positives ≈ fpp
    val preDf = BloomPrefilter.prefilterOnly(li, "l_orderkey", big, "o_orderkey",
      expectedN = 10000L, fpp = 0.01)
    val pre = preDf.count()
    assert(pre >= want.count(), "bloom filter dropped a true match")
    assert(pre <= want.count() + math.ceil(li.count() * 0.05).toLong,
      s"false-positive rate far above fpp: pre=$pre want=${want.count()}")
    // probe is Spark's codegen'd might_contain, not a UDF boundary
    val prePlan = preDf.queryExecution.executedPlan.toString
    assert(!prePlan.contains("ScalaUDF"), "UDF probe found:\n" + prePlan)
    assert(prePlan.contains("might_contain"), "native bloom probe missing:\n" + prePlan)
  }

  test("x12_global_index: dense 0-based, order-consistent, multi-partition") {
    import graft.operators.GlobalIndex
    val docs = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "lang")
    val out = GlobalIndex.withGlobalIndex(docs, Seq(col("doc_id")), "idx").cache()
    try {
      val n = docs.count()
      assert(out.count() == n)
      // dense [0, n) and strictly increasing with doc_id
      assert(out.agg(min("idx"), max("idx")).head == org.apache.spark.sql.Row(0L, n - 1))
      val rows = out.orderBy("doc_id").select("doc_id", "idx").collect()
      rows.sliding(2).foreach { p =>
        if (p.length == 2) assert(p(0).getLong(1) < p(1).getLong(1))
      }
      assert(rows.map(_.getLong(1)).toSet.size == n.toInt)
    } finally out.unpersist()
  }

  test("x10_source_mixture: src0 keeps everything, kept never exceeds total") {
    val rows = df("x10_source_mixture").collect()
    rows.foreach { r =>
      val (src, total, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(kept <= total)
      if (src == "src0") assert(kept == total, s"src0 must keep all: $r")
    }
  }
}
