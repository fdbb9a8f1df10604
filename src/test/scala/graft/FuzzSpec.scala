package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fuzz.FuzzGen

/** Random differential testing (round-6 verdict item #2): seeded generated
  * relational queries, each rendered twice from one draw — a DataFrame-API
  * plan built from Column operators and the equivalent SQL text — must
  * produce identical rows. Two independent construction paths through
  * parser/analyzer/optimizer are the tier of correctness evidence above the
  * hand-declared 132: a bug in either rendering, in the generator's
  * determinism discipline (total ORDER BY, NULLS FIRST, no float
  * accumulation), or in an optimizer rule that only fires on one plan shape
  * shows up as a row diff with the seed to reproduce it.
  *
  * The cross-ENGINE differential for the same grammar is driver-run: the
  * fz* entries in FuzzQueries are fixed seeds whose SQL goes to DuckDB via
  * oracle_sql.json.
  */
class FuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val views: Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t =>
        Tables.load(spark, TestSpark.sf0001, t).createOrReplaceTempView(t))

  test("120 seeded random queries: DataFrame-API plan ≡ spark.sql of the generated SQL") {
    views
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed)
      val dfRes = q.build(spark, TestSpark.sf0001)
      val sqlRes = spark.sql(q.sql)
      assert(dfRes.columns.toSeq == sqlRes.columns.toSeq,
        s"seed $seed column mismatch: ${q.sql}")
      val a = dfRes.collect().map(_.toString).toSeq
      val b = sqlRes.collect().map(_.toString).toSeq
      assert(a == b,
        s"seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info("120 seeds matched across both construction paths")
  }

  test("generation is deterministic: same seed, same SQL") {
    (1 to 120).foreach { seed =>
      assert(FuzzGen.query(seed).sql == FuzzGen.query(seed).sql, s"seed $seed")
    }
    // and materially diverse: most seeds yield distinct queries
    val texts = (1 to 120).map(FuzzGen.query(_).sql)
    assert(texts.distinct.size > 100, s"only ${texts.distinct.size} distinct queries")
  }

  test("grammar v2 (windows + set ops): 120 seeds, DataFrame-API ≡ spark.sql") {
    views
    var windows = 0; var setops = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 2)
      if (q.sql.contains(" OVER (")) windows += 1
      if (Seq("UNION ALL", "INTERSECT", "EXCEPT").exists(q.sql.contains)) setops += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v2 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v2 seeds matched; $windows window-mode, $setops set-op-mode")
    // the new modes must actually be exercised, not just reachable
    assert(windows >= 20, s"window mode under-drawn: $windows")
    assert(setops >= 10, s"set-op mode under-drawn: $setops")
  }

  test("grammar v3 (IN/BETWEEN/DISTINCT/avg/DESC): 120 seeds, DataFrame-API ≡ spark.sql") {
    views
    var inb = 0; var dist = 0; var desc = 0; var avgs = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 3)
      if (q.sql.contains(" IN (") || q.sql.contains(" BETWEEN ")) inb += 1
      if (q.sql.contains("SELECT DISTINCT")) dist += 1
      if (q.sql.contains("DESC NULLS LAST")) desc += 1
      if (q.sql.contains("avg(")) avgs += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v3 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v3 seeds matched; $inb IN/BETWEEN, $dist DISTINCT, $desc DESC-ordered, $avgs avg")
    assert(inb >= 10, s"IN/BETWEEN under-drawn: $inb")
    assert(desc >= 10, s"DESC ordering under-drawn: $desc")
  }

  test("v1 seeds are frozen: v2 dispatch never perturbs version-1 draws") {
    // the fz2xx catalog entries render from v1; a change here would silently
    // re-point their oracle SQL
    val pinned = Map(
      201 -> FuzzGen.query(201).sql, 228 -> FuzzGen.query(228).sql)
    pinned.foreach { case (seed, sql) =>
      assert(FuzzGen.query(seed, 1).sql == sql, s"seed $seed drifted")
    }
  }
}
