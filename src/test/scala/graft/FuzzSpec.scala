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

/** Grammar slices v1-v18 (see FuzzSpecBase). */
class FuzzSpec extends FuzzSpecBase {

  test("120 seeded random queries: DataFrame-API plan ≡ spark.sql of the generated SQL") {
    views
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed)
      val dfRes = q.build(spark, TestSpark.sf0001)
      val sqlRes = spark.sql(q.sparkSql)
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
      if (q.mode.startsWith("window:")) windows += 1
      if (q.mode.startsWith("setop:")) setops += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
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
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v3 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v3 seeds matched; $inb IN/BETWEEN, $dist DISTINCT, $desc DESC-ordered, $avgs avg")
    assert(inb >= 10, s"IN/BETWEEN under-drawn: $inb")
    assert(desc >= 10, s"DESC ordering under-drawn: $desc")
  }

  test("grammar v4 (lead/first/last/ntile, multi-key partitions, UNION): 120 seeds, DF-API ≡ spark.sql") {
    views
    var v4fn = 0; var multi = 0; var union = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 4)
      if (Seq("lead(", "first_value(", "last_value(", "ntile(").exists(q.sql.contains)) v4fn += 1
      if ("PARTITION BY [a-z_]+, [a-z_]+ ".r.findFirstIn(q.sql).isDefined) multi += 1
      if (q.sql.contains(" UNION SELECT ")) union += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v4 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v4 seeds matched; $v4fn new-window-fn, $multi multi-key-partition, $union UNION-distinct")
    assert(v4fn >= 5, s"v4 window functions under-drawn: $v4fn")
  }

  test("grammar v5 (subqueries + derived-table joins): 120 seeds, DF-API ≡ spark.sql") {
    views
    var subq = 0; var anti = 0; var scalar = 0; var derived = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 5)
      // generators report the drawn mode directly (ADVICE r10: SQL
      // substring classification silently inflates when another mode
      // happens to emit the same token)
      if (q.mode == "subq:anti") anti += 1
      else if (q.mode == "subq:in" || q.mode == "subq:exists") subq += 1
      if (q.mode == "subq:scalar") scalar += 1
      if (q.mode == "derived") derived += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v5 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v5 seeds matched; $subq subquery, $anti anti (NOT EXISTS), " +
      s"$scalar scalar, $derived derived-join")
    // the new modes must actually be exercised, not just reachable
    assert(subq >= 15, s"subquery mode under-drawn: $subq")
    assert(anti >= 3, s"NOT EXISTS shape under-drawn: $anti")
    assert(scalar >= 3, s"scalar-subquery shape under-drawn: $scalar")
    assert(derived >= 10, s"derived-join mode under-drawn: $derived")
  }

  test("grammar v6 (events table: timestamps, window + agg + proj): 120 seeds, DF-API ≡ spark.sql") {
    views
    var ev = 0; var evWin = 0; var tsPred = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 6)
      val isEvents = q.mode.endsWith(":events")
      if (isEvents) ev += 1
      if (q.mode == "window:events") evWin += 1
      // a 2024 TIMESTAMP literal is drawn only from events.ts's pool
      if (isEvents && q.sql.contains("TIMESTAMP '2024")) tsPred += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v6 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v6 seeds matched; $ev over events ($evWin windowed, $tsPred with ts)")
    // the events table must actually be drawn at the declared 60% rate,
    // in both the body and the window generator
    assert(ev >= 50, s"events mode under-drawn: $ev")
    assert(evWin >= 5, s"events window shape under-drawn: $evWin")
  }

  test("grammar v7 (documents table: text strings, groupable dims): 120 seeds, DF-API ≡ spark.sql") {
    views
    var doc = 0; var docWin = 0; var txt = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 7)
      val isDoc = q.mode.endsWith(":documents")
      if (isDoc) doc += 1
      if (q.mode == "window:documents") docWin += 1
      if (isDoc && q.sql.contains("text")) txt += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v7 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v7 seeds matched; $doc over documents ($docWin windowed, $txt touching text)")
    assert(doc >= 50, s"documents mode under-drawn: $doc")
    assert(docWin >= 5, s"documents window shape under-drawn: $docWin")
  }

  test("grammar v8 (set-ops + self-scalar subqueries over events/documents): 120 seeds, DF-API ≡ spark.sql") {
    views
    var setop = 0; var scalar = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 8)
      val overNew = q.sql.contains("FROM events") || q.sql.contains("FROM documents")
      if (q.mode == "setop:events" || q.mode == "setop:documents") setop += 1
      if (overNew && q.mode == "subq:scalar") scalar += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v8 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v8 seeds matched; $setop set-op, $scalar self-scalar over events/documents")
    assert(setop >= 15, s"v8 set-op shape under-drawn: $setop")
    assert(scalar >= 15, s"v8 self-scalar shape under-drawn: $scalar")
  }

  test("grammar v9 (events⋈customer cross-family joins): 120 seeds, DF-API ≡ spark.sql") {
    views
    var joined = 0; var threeWay = 0; var win = 0; var subq = 0; var derived = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 9)
      val isEdge = q.sql.contains("user_id = c_custkey") ||
        q.sql.contains("(SELECT c_custkey FROM customer") ||
        q.sql.contains("c_custkey = user_id") ||
        (q.sql.contains("FROM events") && q.sql.contains("customer"))
      if (isEdge) joined += 1
      if (isEdge && q.sql.contains("nation")) threeWay += 1
      if (isEdge && q.sql.contains(" OVER ")) win += 1
      if (isEdge && (q.sql.contains("EXISTS (SELECT ") ||
        q.sql.contains(" IN (SELECT ") || q.sql.contains("(SELECT min(") ||
        q.sql.contains("(SELECT max(") || q.sql.contains("(SELECT avg("))) subq += 1
      if (isEdge && q.sql.contains(") d JOIN ")) derived += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v9 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v9 seeds matched; $joined on the events⋈customer edge " +
      s"($threeWay three-way, $win windowed, $subq subquery, $derived derived-join)")
    // every join-bearing mode over the new edge must actually be drawn
    assert(joined >= 50, s"cross-family edge under-drawn: $joined")
    assert(threeWay >= 5, s"three-way chain under-drawn: $threeWay")
    assert(win >= 5, s"windowed shape under-drawn: $win")
    assert(subq + derived >= 5, s"subquery/derived shapes under-drawn: ${subq + derived}")
  }

  test("grammar v10 (conditional aggs, set-ops over joins, agg-of-agg): 120 seeds, DF-API ≡ spark.sql") {
    views
    var condAgg = 0; var setopJoin = 0; var aggOfAgg = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 10)
      if (q.mode == "condagg") condAgg += 1
      if (q.mode == "setopjoin") setopJoin += 1
      if (q.mode == "aggofagg") aggOfAgg += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v10 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v10 seeds matched; $condAgg conditional-agg, " +
      s"$setopJoin set-op-over-join, $aggOfAgg agg-of-agg")
    assert(condAgg >= 15, s"conditional-agg mode under-drawn: $condAgg")
    assert(setopJoin >= 10, s"set-op-over-join mode under-drawn: $setopJoin")
    assert(aggOfAgg >= 10, s"agg-of-agg mode under-drawn: $aggOfAgg")
  }

  test("grammar v11 (ROLLUP/CUBE+GROUPING, missing LEFT joins, top-N groups): 120 seeds, DF-API ≡ spark.sql") {
    views
    var gsets = 0; var leftNull = 0; var topN = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 11)
      if (q.mode == "rollup" || q.mode == "cube") gsets += 1
      if (q.mode.startsWith("leftnull:")) leftNull += 1
      if (q.mode == "topgroups") topN += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v11 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v11 seeds matched; $gsets grouping-sets, $leftNull left-null, $topN top-N-groups")
    assert(gsets >= 15, s"grouping-sets mode under-drawn: $gsets")
    assert(leftNull >= 15, s"missing-LEFT-join mode under-drawn: $leftNull")
    assert(topN >= 10, s"top-N-groups mode under-drawn: $topN")
  }

  test("grammar v12 (FULL OUTER, INTERSECT/EXCEPT ALL, agg-join cohorts): 120 seeds, DF-API ≡ spark.sql") {
    views
    var full = 0; var bagOp = 0; var aggJoin = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 12)
      if (q.mode.startsWith("fullouter:")) full += 1
      if (q.mode == "setopall") bagOp += 1
      if (q.mode == "aggjoin") aggJoin += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v12 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v12 seeds matched; $full full-outer, $bagOp bag-set-op, $aggJoin agg-join")
    assert(full >= 15, s"FULL OUTER mode under-drawn: $full")
    assert(bagOp >= 15, s"INTERSECT/EXCEPT ALL mode under-drawn: $bagOp")
    assert(aggJoin >= 10, s"agg-join mode under-drawn: $aggJoin")
  }

  test("grammar v13 (computed projections, sliding frames, CASE keys): 120 seeds, DF-API ≡ spark.sql") {
    views
    var exprs = 0; var sliding = 0; var caseKey = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 13)
      if (q.mode == "exprproj") exprs += 1
      if (q.mode == "sliding") sliding += 1
      if (q.mode == "casekey") caseKey += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v13 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v13 seeds matched; $exprs computed-expr, $sliding sliding-frame, $caseKey CASE-key")
    assert(exprs >= 15, s"computed-projection mode under-drawn: $exprs")
    assert(sliding >= 15, s"sliding-frame mode under-drawn: $sliding")
    assert(caseKey >= 10, s"CASE-key mode under-drawn: $caseKey")
  }

  test("grammar v14 (correlated scalars, non-count HAVING, 3-branch UNION): 120 seeds, DF-API ≡ spark.sql") {
    views
    var corr = 0; var hav = 0; var u3 = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 14)
      if (q.mode.startsWith("corrscalar:")) corr += 1
      if (q.mode == "havingagg") hav += 1
      if (q.mode == "union3") u3 += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v14 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v14 seeds matched; $corr correlated-scalar, $hav agg-HAVING, $u3 three-branch-union")
    assert(corr >= 20, s"correlated-scalar mode under-drawn: $corr")
    assert(hav >= 10, s"agg-HAVING mode under-drawn: $hav")
    assert(u3 >= 10, s"three-branch-union mode under-drawn: $u3")
  }

  test("grammar v15 (window-over-aggregate, OFFSET, NULLIF/IS DISTINCT FROM): 120 seeds, DF-API ≡ spark.sql") {
    views
    var aggRank = 0; var offs = 0; var nullSc = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 15)
      if (q.mode == "aggrank") aggRank += 1
      if (q.mode == "offset") offs += 1
      if (q.mode == "nullscalar") nullSc += 1
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v15 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v15 seeds matched; $aggRank agg-rank, $offs offset, $nullSc null-scalar")
    assert(aggRank >= 15, s"window-over-aggregate mode under-drawn: $aggRank")
    assert(offs >= 15, s"OFFSET mode under-drawn: $offs")
    assert(nullSc >= 10, s"NULLIF/IS-DISTINCT mode under-drawn: $nullSc")
  }

  test("grammar v16 (embeddings array/HOF derived scalars): 120 seeds, DF-API ≡ spark.sql") {
    views
    var emb = 0; var embWin = 0; var dual = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 16)
      if (q.mode.endsWith(":emb")) emb += 1
      if (q.mode == "window:emb") embWin += 1
      if (q.sparkSqlOpt.isDefined) {
        dual += 1
        // the two dialects must genuinely differ (else the third rendering
        // adds no evidence) and the oracle text must carry the DuckDB array
        // syntax, never Spark's
        assert(q.sparkSql != q.sql, s"v16 seed $seed: dialects identical")
        assert(q.sql.contains("list_reduce(") && !q.sql.contains("element_at("),
          s"v16 seed $seed: oracle text not DuckDB-dialect: ${q.sql.take(120)}")
        assert(q.sparkSql.contains("aggregate(") && !q.sparkSql.contains("list_reduce("),
          s"v16 seed $seed: spark text not Spark-dialect")
      }
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v16 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sparkSql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v16 seeds matched; $emb over emb ($embWin windowed, $dual dual-dialect)")
    assert(emb >= 60, s"emb mode under-drawn: $emb")
    assert(embWin >= 15, s"emb window shape under-drawn: $embWin")
    assert(dual == emb, s"every emb query must render dual dialects: $dual != $emb")
  }

  test("grammar v17 (NULL-injection: NOT IN / IN-with-NULL / DISTINCT FROM / null-skipping aggs): 120 seeds, DF-API ≡ spark.sql") {
    views
    var notIn = 0; var inNull = 0; var distinctFrom = 0; var isNull = 0
    var aggC = 0; var body = 0; var win = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 17)
      q.mode match {
        case "nullfz:notin"    => notIn += 1
        case "nullfz:innull"   => inNull += 1
        case "nullfz:distinct" => distinctFrom += 1
        case "nullfz:isnull"   => isNull += 1
        case "nullfz:agg"      => aggC += 1
        case m if m.startsWith("null:body:")   => body += 1
        case m if m.startsWith("null:window:") => win += 1
        case _ =>
      }
      // decorated queries are shared-dialect: one SQL text only
      if (q.mode.startsWith("null")) assert(q.sparkSqlOpt.isEmpty,
        s"v17 seed $seed: NULL-injected query should carry one SQL text")
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v17 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v17 seeds matched; $notIn NOT-IN, $inNull IN-with-NULL, " +
      s"$distinctFrom DISTINCT-FROM, $isNull IS-NULL, $aggC agg-contrast, " +
      s"$body nullable-body, $win nullable-window")
    assert(notIn >= 3, s"NOT IN shape under-drawn: $notIn")
    assert(inNull >= 3, s"IN-with-NULL shape under-drawn: $inNull")
    assert(distinctFrom >= 3, s"DISTINCT FROM shape under-drawn: $distinctFrom")
    assert(aggC >= 3, s"aggregate-contrast shape under-drawn: $aggC")
    assert(body >= 10, s"nullable body mode under-drawn: $body")
    assert(win >= 5, s"nullable window mode under-drawn: $win")
  }

  test("grammar v18 (NULL join keys: injected-FK joins / NULL-poisoned [NOT] IN subqueries / null-safe joins): 120 seeds, DF-API ≡ spark.sql") {
    views
    var njBody = 0; var njWin = 0; var sqNotIn = 0; var sqIn = 0; var nsafe = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 18)
      q.mode match {
        case m if m.startsWith("njoin:body:")   => njBody += 1
        case m if m.startsWith("njoin:window:") => njWin += 1
        case "nsubq:notin"                      => sqNotIn += 1
        case "nsubq:in"                         => sqIn += 1
        case m if m.startsWith("nsafe:")        => nsafe += 1
        case _ =>
      }
      // every v18 decoration is shared-dialect: one SQL text only
      if (q.mode.startsWith("njoin") || q.mode.startsWith("nsubq") ||
          q.mode.startsWith("nsafe"))
        assert(q.sparkSqlOpt.isEmpty,
          s"v18 seed $seed: NULL-join query should carry one SQL text")
      val df = q.build(spark, TestSpark.sf0001)
      if (q.mode.startsWith("nsafe")) {
        // IS NOT DISTINCT FROM must extract as an equi hash join (Spark
        // wraps EqualNullSafe keys in coalesce) — a nested loop here is
        // the scale bug this mode exists to catch
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"v18 seed $seed: null-safe join fell off the hash-join path:\n$p")
      }
      val a = df.collect().map(_.toString).toSeq
      val b = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      assert(a == b,
        s"v18 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.zipAll(b, "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v18 seeds matched; $njBody njoin-body, $njWin njoin-window, " +
      s"$sqNotIn subq-NOT-IN, $sqIn subq-IN, $nsafe null-safe-join")
    assert(njBody >= 20, s"njoin body mode under-drawn: $njBody")
    assert(njWin >= 8, s"njoin window mode under-drawn: $njWin")
    assert(sqNotIn >= 8, s"subquery NOT IN shape under-drawn: $sqNotIn")
    assert(sqIn >= 5, s"subquery IN shape under-drawn: $sqIn")
    assert(nsafe >= 12, s"null-safe join mode under-drawn: $nsafe")
  }

}
