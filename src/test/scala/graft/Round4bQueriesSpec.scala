package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QueryCatalog

/** Semantic assertions for the round-4 continuation queries (value-level
  * correctness is the DuckDB oracle gate; these pin per-row invariants,
  * cross-formulation equivalences, and plan shapes the oracle can't express).
  */
class Round4bQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def df(name: String) =
    QueryCatalog.byName(name).build(spark, TestSpark.sf0001)

  test("x19_event_funnel: lazy single plan (no jobs at build), stages monotone, rates consistent") {
    // Control: a bare table load costs one parquet schema-inference job.
    // The funnel build (which loads events exactly once) must cost no more —
    // the pre-r5 form added three eager count() jobs on top. Counted via
    // TestSpark.countJobs (thread-local job group) so parallel suites on
    // the shared session can't inflate the measurement.
    val controlCost = TestSpark.countJobs("x19-control") {
      Tables.events(spark, TestSpark.sf0001)
    }
    var funnel: org.apache.spark.sql.DataFrame = null
    val buildCost = TestSpark.countJobs("x19-build") { funnel = df("x19_event_funnel") }
    assert(buildCost <= controlCost,
      s"x19 build launched $buildCost job(s); read-setup control is $controlCost")
    val r = funnel.collect()(0)
    val (nv, nc, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nv >= nc && nc >= np, s"funnel stages must shrink: $r")
    assert(math.abs(r.getDouble(3) - math.floor(nc.toDouble / nv * 10000 + 0.5) / 10000) < 1e-12)
    assert(math.abs(r.getDouble(4) - math.floor(np.toDouble / nc * 10000 + 0.5) / 10000) < 1e-12)
    // the shared v/c aggregate prefixes dedup at execution, not by re-scan
    funnel.collect()
    assert(funnel.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "expected exchange reuse across the repeated stage prefixes")
  }

  test("st5_interval_join: every pair same-user with click in (purchase-1h, purchase]") {
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"))
    val out = df("st5_interval_join")
    val checked = out
      .join(ev.select(col("event_id").as("purchase_id"), col("ts").as("pts"),
        col("user_id").as("pu")), "purchase_id")
      .join(ev.select(col("event_id").as("click_id"), col("ts").as("cts"),
        col("user_id").as("cu")), "click_id")
    assert(checked.where(col("pu") =!= col("cu")).isEmpty)
    assert(checked.where(col("cts") > col("pts") ||
      col("cts") < col("pts") - expr("INTERVAL 1 HOUR")).isEmpty)
    assert(out.count() == checked.count())
  }

  test("st5_interval_join: plans an equi-join on user, not a nested loop") {
    val plan = df("st5_interval_join").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join must hash/merge on the user key:\n$plan")
  }

  test("r10_merge_upsert: deletes removed, updates applied, base untouched") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
    val nDel = orders.where(col("o_orderstatus") === "F" &&
      pmod(col("o_orderkey"), lit(13)) === 0).count()
    val nUpd = orders.where(col("o_orderstatus") === "O" &&
      pmod(col("o_orderkey"), lit(7)) === 0).count()
    val out = df("r10_merge_upsert").cache()
    try {
      assert(out.count() == orders.count() - nDel)
      assert(out.where(col("src") === "U").count() == nUpd)
      // updated rows carry exactly base price + 1000
      val updated = out.where(col("src") === "U")
        .join(orders, "o_orderkey")
        .where(abs(col("price") - (col("o_totalprice") + 1000d)) > 1e-6)
      assert(updated.isEmpty)
      // untouched rows carry the base price
      val base = out.where(col("src") === "B")
        .join(orders, "o_orderkey")
        .where(abs(col("price") - col("o_totalprice")) > 1e-6)
      assert(base.isEmpty)
    } finally out.unpersist()
  }

  test("w8_gaps_islands: runs partition all orders and adjacent runs change status") {
    val out = df("w8_gaps_islands").cache()
    try {
      assert(out.agg(sum("run_len")).head.getLong(0) ==
        Tables.orders(spark, TestSpark.sf0001).count())
      assert(out.where(col("run_start") > col("run_end")).isEmpty)
      // cross-formulation: run count == lag-based status-change count
      // (a run starts where the previous row's status differs or is absent)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val expectedRuns = Tables.orders(spark, TestSpark.sf0001)
        .withColumn("prev", lag(col("o_orderstatus"), 1).over(w))
        .where(col("prev").isNull || col("prev") =!= col("o_orderstatus"))
        .count()
      assert(out.count() == expectedRuns)
    } finally out.unpersist()
  }

  test("w8_gaps_islands: both windows share one hash exchange (re-sort, no reshuffle)") {
    val plan = df("w8_gaps_islands").queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected a single hash exchange:\n$plan")
  }

  test("dq1_profile: one row per column, stats match direct computation") {
    val rows = df("dq1_profile").collect()
    assert(rows.length == 4)
    val orders = Tables.orders(spark, TestSpark.sf0001)
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("o_orderstatus").getLong(1) ==
      orders.where(col("o_orderstatus").isNull).count())
    assert(byName("o_orderstatus").getLong(2) ==
      orders.agg(countDistinct("o_orderstatus")).head.getLong(0))
    assert(byName("o_custkey").getString(3).toLong ==
      orders.agg(min("o_custkey")).head.getLong(0))
  }

  test("j12_salted_join: identical to the unsalted join aggregate") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val sup = Tables.supplier(spark, TestSpark.sf0001)
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        graft.queries.Canon.round(
          sum(col("l_extendedprice").cast("decimal(38,6)")).cast("double"), 4)
          .as("revenue"))
    val got = df("j12_salted_join")
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
  }

  test("a17_listagg: nations string is sorted asc and element count matches n") {
    df("a17_listagg").collect().foreach { r =>
      val parts = r.getString(1).split(",").toSeq
      assert(parts == parts.sorted, s"WITHIN GROUP order violated: $r")
      assert(parts.length == r.getLong(2), s"element count != n: $r")
    }
  }

  test("f27_timestamp_arith: minutes-into-hour in [0,59], +90min exact") {
    val out = df("f27_timestamp_arith").cache()
    try {
      assert(out.where(col("min_into_hour") < 0 || col("min_into_hour") > 59).isEmpty)
      val ev = Tables.events(spark, TestSpark.sf0001).select("event_id", "ts")
      val bad = out.join(ev, "event_id")
        .where(col("ts_plus90") =!= col("ts") + expr("INTERVAL 90 MINUTE"))
      assert(bad.isEmpty)
    } finally out.unpersist()
  }

  test("x13_contamination: pairs share the 60-char fingerprint across the split boundary") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), substring(lower(trim(col("text"))), 1, 60).as("fp"))
    val out = df("x13_contamination")
    assert(out.where(pmod(col("train_doc"), lit(10)) >= 8).isEmpty)
    assert(out.where(pmod(col("val_doc"), lit(10)) =!= 8).isEmpty)
    val joined = out
      .join(docs.select(col("doc_id").as("train_doc"), col("fp").as("tfp")), "train_doc")
      .join(docs.select(col("doc_id").as("val_doc"), col("fp").as("vfp")), "val_doc")
    assert(joined.where(col("tfp") =!= col("vfp")).isEmpty)
  }

  test("a19_skew_distinct: two-phase rewrite plans plain hash aggs, no Expand") {
    val plan = df("a19_skew_distinct").queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"the rewrite exists to avoid the distinct-aggregate Expand:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected hash aggregation:\n$plan")
  }

  test("a18_approx_percentile: each estimate within the sketch's rank-error bound") {
    // accuracy=1000 ⇒ rank error ε ≤ 1/1000; the estimate must lie between
    // the exact (p−ε) and (p+ε) quantiles (inclusive, with index clamping)
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val byFlag = li.select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    val eps = 1.0 / 1000
    df("a18_approx_percentile").collect().foreach { r =>
      val vs = byFlag(r.getString(0))
      val n = vs.length
      def at(i: Int): Double = vs(math.min(n - 1, math.max(0, i)))
      Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2), 0.99 -> r.getDouble(3))
        .foreach { case (p, est) =>
          // GK guarantee: returned element's rank ∈ [(p−ε)n, (p+ε)n];
          // ±1 covers 0- vs 1-based rank conventions
          val lo = at(math.floor((p - eps) * n).toInt - 1)
          val hi = at(math.ceil((p + eps) * n).toInt)
          assert(est >= lo - 1e-4 && est <= hi + 1e-4,
            s"p=$p flag=${r.getString(0)}: est=$est outside [$lo, $hi]")
        }
    }
  }

  test("x15_int8_quantize: quantized range within [-128, 128], scale reconstructs absmax") {
    val out = df("x15_int8_quantize").cache()
    try {
      // absmax/127 scaling keeps every quantized value in [-128, 128]
      // (127 + the 0.5 round-up); qmin <= qmax always
      assert(out.where(col("qmin") < -128 || col("qmax") > 128).isEmpty)
      assert(out.where(col("qmin") > col("qmax")).isEmpty)
      assert(out.count() ==
        Tables.embeddings(spark, TestSpark.sf0001).count())
      // the max-magnitude element must quantize to ±127 (that's what
      // absmax scaling means)
      assert(out.where(greatest(abs(col("qmin")), abs(col("qmax"))) < 127
        && col("scale_r") > 0).isEmpty)
    } finally out.unpersist()
  }

  test("x14_incremental_agg: partial-merge equals the full recompute") {
    val full = Tables.orders(spark, TestSpark.sf0001)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        graft.queries.Canon.round(
          sum(col("o_totalprice").cast("decimal(38,6)")).cast("double"), 4)
          .as("total"))
    val got = df("x14_incremental_agg")
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
  }

  test("x20_temperature_mixture: head source at exactly 1e6 ppm, others upweighted, budgets exact") {
    val rows = df("x20_temperature_mixture").collect()
    assert(rows.nonEmpty)
    val headPpm = rows.map(_.getAs[Long]("upweight_ppm")).min
    // the largest source is its own head: sqrt(max/max) = 1.0 exactly
    assert(headPpm == 1000000L, s"head source ppm $headPpm != 1000000")
    rows.foreach { r =>
      val ppm = r.getAs[Long]("upweight_ppm")
      val nTok = r.getAs[Long]("n_tokens")
      val eff = r.getAs[Long]("tokens_eff")
      // alpha = 0.5 only UPweights relative to the head source
      assert(ppm >= 1000000L, s"${r.getAs[String]("source")}: ppm $ppm < 1e6")
      // effective budget is pure integer arithmetic on (n_tokens, ppm)
      assert(eff == nTok * ppm / 1000000L,
        s"${r.getAs[String]("source")}: tokens_eff $eff drifted")
      assert(eff >= nTok, s"${r.getAs[String]("source")}: upweight shrank the budget")
    }
  }
}
