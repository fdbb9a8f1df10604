package graft

import graft.fuzz.FuzzGen

/** Grammar slices v19-v30 (see FuzzSpecBase). */
class FuzzSpecMid extends FuzzSpecBase {
  test("grammar v19 (EXISTS-vs-IN quantifier contrast over a NULL-injected FK): 120 seeds, DF-API ≡ spark.sql") {
    views
    var ex = 0; var nex = 0; var in = 0; var nin = 0; var agg = 0
    var nullSurvivorSeeds = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 19)
      q.mode match {
        case m if m.startsWith("nexists:exists")    => ex += 1
        case m if m.startsWith("nexists:notexists") => nex += 1
        case m if m.startsWith("nexists:in")        => in += 1
        case m if m.startsWith("nexists:notin")     => nin += 1
        case _ =>
      }
      if (q.mode.startsWith("nexists") && q.mode.endsWith(":agg")) agg += 1
      if (q.mode.startsWith("nexists"))
        assert(q.sparkSqlOpt.isEmpty,
          s"v19 seed $seed: quantifier query should carry one SQL text")
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v19 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
      // the semantics the grammar exists for: NOT EXISTS output may carry
      // NULL keys (two-valued correlation) — count the seeds where it DID
      if (q.mode == "nexists:notexists" && a.exists(_.anyNull)) nullSurvivorSeeds += 1
    }
    info(s"120 v19 seeds matched; $ex EXISTS, $nex NOT-EXISTS, $in IN, " +
      s"$nin NOT-IN, $agg count-contrast; $nullSurvivorSeeds NOT-EXISTS " +
      "seeds with genuine NULL-key survivors")
    assert(ex >= 8, s"EXISTS under-drawn: $ex")
    assert(nex >= 8, s"NOT EXISTS under-drawn: $nex")
    assert(in >= 8, s"IN under-drawn: $in")
    assert(nin >= 8, s"NOT IN under-drawn: $nin")
    assert(agg >= 5, s"count-contrast shape under-drawn: $agg")
    assert(nullSurvivorSeeds >= 3,
      s"NOT EXISTS must keep NULL-key rows somewhere: $nullSurvivorSeeds")
  }

  test("grammar v20 (ROLLUP/CUBE over a NULL-injected group key, GROUPING() disambiguation): 120 seeds, DF-API ≡ spark.sql") {
    views
    var r1 = 0; var r2 = 0; var cu = 0; var bothSpecies = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 20)
      q.mode match {
        case "nrollup:rollup:1key" => r1 += 1
        case "nrollup:rollup:2key" => r2 += 1
        case "nrollup:cube:2key"   => cu += 1
        case _ =>
      }
      if (q.mode.startsWith("nrollup"))
        assert(q.sparkSqlOpt.isEmpty,
          s"v20 seed $seed: rollup-null query should carry one SQL text")
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v20 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
      // the collision the grammar exists for: k0 IS NULL rows of BOTH
      // species — the real NULL group (g0=0) and a super-aggregate (g0=1)
      if (q.mode.startsWith("nrollup")) {
        val gi = 0
        val ki = q.mode.split(":").last match { case "1key" => 1; case _ => 2 }
        val real = a.exists(row => row.getLong(gi) == 0L && row.isNullAt(ki))
        val synth = a.exists(row => row.getLong(gi) == 1L && row.isNullAt(ki))
        if (real && synth) bothSpecies += 1
      }
    }
    info(s"120 v20 seeds matched; $r1 rollup-1key, $r2 rollup-2key, $cu cube; " +
      s"$bothSpecies seeds with BOTH NULL species (real group + super-aggregate)")
    assert(r1 >= 20, s"1-key rollup under-drawn: $r1")
    assert(r2 >= 10, s"2-key rollup under-drawn: $r2")
    assert(cu >= 10, s"cube under-drawn: $cu")
    assert(bothSpecies >= 3,
      s"the NULL-species collision must actually occur: $bothSpecies")
  }

  test("grammar v21 (RANGE-valued window frames over non-unique orderings): 120 seeds, DF-API ≡ spark.sql") {
    views
    var pre = 0; var both = 0; var fol = 0; var dflt = 0; var descN = 0
    var tieSeeds = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 21)
      if (q.mode.startsWith("range")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v21 seed $seed: range-frame query should carry one SQL text")
        q.mode.split(":")(1) match {
          case "pre"     => pre += 1
          case "both"    => both += 1
          case "fol"     => fol += 1
          case "default" => dflt += 1
          case other     => fail(s"v21 seed $seed: unknown frame shape $other")
        }
        if (q.mode.contains(":desc")) descN += 1
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v21 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
      // the semantics the grammar exists for: peer groups must be REAL —
      // count the seeds whose output carries tied order values inside one
      // partition (a grammar drifting onto unique orderings would pass the
      // differential while testing nothing new)
      if (q.mode.startsWith("range") && a.nonEmpty) {
        val ki = a.head.fieldIndex("k0")
        val oi = a.head.fieldIndex("o0")
        val tied = a.groupBy(r =>
            (String.valueOf(r.get(ki)), String.valueOf(r.get(oi))))
          .exists(_._2.size >= 2)
        if (tied) tieSeeds += 1
      }
    }
    info(s"120 v21 seeds matched; $pre pre, $both both-sides, $fol following, " +
      s"$dflt default-frame, $descN DESC; $tieSeeds seeds with real peer groups")
    assert(pre >= 10, s"bounded-preceding frame under-drawn: $pre")
    assert(both >= 10, s"both-sides frame under-drawn: $both")
    assert(fol >= 10, s"bounded-following frame under-drawn: $fol")
    assert(dflt >= 10, s"default frame under-drawn: $dflt")
    assert(descN >= 8, s"DESC direction under-drawn: $descN")
    assert(tieSeeds >= 20,
      s"range frames must see real peer groups: $tieSeeds")
  }

  test("grammar v22 (temporal semantics: date_trunc keys, EXTRACT fields, INTERVAL shifts): 120 seeds, DF-API ≡ spark.sql") {
    views
    var trunc = 0; var extr = 0; var shift = 0; var twin = 0
    var minus = 0; var monthShift = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 22)
      if (q.mode.startsWith("temporal")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v22 seed $seed: temporal query should carry one SQL text")
        q.mode.split(":")(1) match {
          case "trunc"   => trunc += 1
          case "extract" => extr += 1
          case "shift"   => shift += 1
          case "twin"    => twin += 1
          case other     => fail(s"v22 seed $seed: unknown temporal shape $other")
        }
        if (q.mode.contains(":minus")) minus += 1
        if (q.mode.split(":")(1) == "shift" && q.sql.contains("MONTH"))
          monthShift += 1
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v22 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v22 seeds matched; $trunc trunc-group, $extr extract, " +
      s"$shift shift ($minus minus, $monthShift month-arithmetic), $twin trunc-window")
    assert(trunc >= 12, s"trunc-group shape under-drawn: $trunc")
    assert(extr >= 12, s"extract shape under-drawn: $extr")
    assert(shift >= 12, s"shift shape under-drawn: $shift")
    assert(twin >= 12, s"trunc-window shape under-drawn: $twin")
    assert(minus >= 5, s"minus-direction shifts under-drawn: $minus")
    assert(monthShift >= 3,
      s"month arithmetic (the clamping path) must be drawn: $monthShift")
  }

  test("grammar v23 (string scalars: computed projections, split_part keys, instr/length arithmetic): 120 seeds, DF-API ≡ spark.sql") {
    views
    var proj = 0; var splitk = 0; var poslen = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 23)
      if (q.mode.startsWith("str")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v23 seed $seed: string query should carry one SQL text")
        q.mode.split(":")(1) match {
          case "proj"     => proj += 1
          case "splitkey" => splitk += 1
          case "poslen"   => poslen += 1
          case other      => fail(s"v23 seed $seed: unknown string shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v23 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v23 seeds matched; $proj proj, $splitk split-key, $poslen pos/len")
    assert(proj >= 18, s"computed-projection shape under-drawn: $proj")
    assert(splitk >= 18, s"split_part-key shape under-drawn: $splitk")
    assert(poslen >= 18, s"instr/length shape under-drawn: $poslen")
  }

  test("grammar v24 (two-sided NULL-injection: fact FK + dim PK victims under ROLLUP/window/projection): 120 seeds, DF-API ≡ spark.sql") {
    views
    var rollup = 0; var win = 0; var proj = 0
    var left = 0; var inner = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 24)
      if (q.mode.startsWith("dualnull")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v24 seed $seed: dual-injection query should carry one SQL text")
        val parts = q.mode.split(":")
        parts(1) match {
          case "rollup"                   => rollup += 1
          case w if w.startsWith("window") => win += 1
          case "proj"                     => proj += 1
          case other => fail(s"v24 seed $seed: unknown dualnull shape $other")
        }
        if (parts(2) == "left") left += 1 else inner += 1
        // the dual-injection signature itself: BOTH derived fragments
        // carry a CASE … THEN NULL victim
        assert(q.sql.sliding("THEN NULL ELSE".length)
          .count(_ == "THEN NULL ELSE") >= 2,
          s"v24 seed $seed: expected victims on both join sides: ${q.sql}")
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v24 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v24 seeds matched; $rollup rollup, $win window, $proj proj; " +
      s"$inner inner / $left left")
    assert(rollup >= 15, s"rollup shape under-drawn: $rollup")
    assert(win >= 15, s"window shape under-drawn: $win")
    assert(proj >= 15, s"projection shape under-drawn: $proj")
    assert(left >= 15 && inner >= 15,
      s"join-kind draw skewed: $inner inner / $left left")
  }

  test("grammar v25 (explicit GROUPING SETS, multi-DISTINCT aggregates, FILTER clause): 120 seeds, DF-API ≡ spark.sql") {
    views
    var sets = 0; var multi = 0; var filt = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 25)
      if (q.mode.startsWith("gsets")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v25 seed $seed: grouping query should carry one SQL text")
        q.mode.split(":")(1) match {
          case "sets"          => sets += 1
          case "multidistinct" => multi += 1
          case "filter"        => filt += 1
          case other => fail(s"v25 seed $seed: unknown gsets shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v25 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v25 seeds matched; $sets grouping-sets, $multi multi-distinct, $filt filter")
    assert(sets >= 18, s"grouping-sets shape under-drawn: $sets")
    assert(multi >= 18, s"multi-distinct shape under-drawn: $multi")
    assert(filt >= 18, s"filter shape under-drawn: $filt")
  }

  test("grammar v26 (extended window family: percent_rank/cume_dist over ties, nth_value under drawn frames): 120 seeds, DF-API ≡ spark.sql") {
    views
    var relpos = 0; var nth = 0; var combo = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 26)
      if (q.mode.startsWith("extwin")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v26 seed $seed: extended-window query should carry one SQL text")
        // the NULLS FIRST portability pin: every OVER() ordering spells it
        assert(q.sql.contains("ASC NULLS FIRST)") ||
          q.sql.contains("ASC NULLS FIRST ROWS"),
          s"v26 seed $seed: window ORDER BY must pin NULLS FIRST: ${q.sql}")
        q.mode.split(":")(1) match {
          case "relpos" => relpos += 1
          case "nth"    => nth += 1
          case "combo"  => combo += 1
          case other => fail(s"v26 seed $seed: unknown extwin shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v26 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v26 seeds matched; $relpos relpos, $nth nth, $combo combo")
    assert(relpos >= 18, s"relative-position shape under-drawn: $relpos")
    assert(nth >= 18, s"nth_value shape under-drawn: $nth")
    assert(combo >= 18, s"combo shape under-drawn: $combo")
  }

  test("grammar v27 (exact DECIMAL semantics: typed view, pinned-scale arithmetic, tie-rounding scalars): 120 seeds, DF-API ≡ spark.sql") {
    views
    var agg = 0; var arith = 0; var sumprod = 0; var fns = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 27)
      if (q.mode.startsWith("dec")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v27 seed $seed: decimal query should carry one SQL text")
        // the typed-view signature: the FROM fragment casts to DECIMAL
        assert(q.sql.contains("AS DECIMAL("),
          s"v27 seed $seed: expected DECIMAL casts in: ${q.sql}")
        // r13 verdict #1: the RENDERED surface must never be DECIMAL-typed
        // — the driver's hasher renders trailing-zero decimals
        // asymmetrically. The DECIMAL exactness under test lives inside;
        // outputs are scale-preserving strings.
        assert(!q.build(spark, TestSpark.sf0001).schema
            .exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]),
          s"v27 seed $seed: DECIMAL-typed output column in: ${q.sql}")
        q.mode.split(":")(1) match {
          case "agg"     => agg += 1
          case "arith"   => arith += 1
          case "sumprod" => sumprod += 1
          case "fns"     => fns += 1
          case other => fail(s"v27 seed $seed: unknown dec shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v27 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v27 seeds matched; $agg agg, $arith arith, $sumprod sumprod, $fns fns")
    assert(agg >= 12, s"decimal-aggregation shape under-drawn: $agg")
    assert(arith >= 12, s"arithmetic shape under-drawn: $arith")
    assert(sumprod >= 12, s"sum-of-products shape under-drawn: $sumprod")
    assert(fns >= 12, s"scalar-fns shape under-drawn: $fns")
  }

  test("grammar v28 (NULL semantics in set operations: distinct-equality meets, literal NULL branches, UNION dedup): 120 seeds, DF-API ≡ spark.sql") {
    views
    var meet = 0; var nullbranch = 0; var dedup = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 28)
      if (q.mode.startsWith("nsetop")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v28 seed $seed: set-op query should carry one SQL text")
        // the NULL-injection signature: the view fragment carries a victim
        assert(q.sql.contains("THEN NULL ELSE"),
          s"v28 seed $seed: expected a NULL-injected view in: ${q.sql}")
        q.mode.split(":")(1) match {
          case "meet"       => meet += 1
          case "nullbranch" => nullbranch += 1
          case "dedupcount" => dedup += 1
          case other => fail(s"v28 seed $seed: unknown nsetop shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v28 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v28 seeds matched; $meet meet, $nullbranch null-branch, $dedup dedup-count")
    assert(meet >= 18, s"branch-meet shape under-drawn: $meet")
    assert(nullbranch >= 18, s"null-branch shape under-drawn: $nullbranch")
    assert(dedup >= 18, s"dedup-count shape under-drawn: $dedup")
  }

  test("grammar v29 (LATERAL correlated derived tables: per-group top-k LIMIT, aggregate laterals, LEFT JOIN LATERAL): 120 seeds, DF-API ≡ spark.sql") {
    views
    var topk = 0; var agg = 0; var leftk = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 29)
      if (q.mode.startsWith("lateral")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v29 seed $seed: lateral query should carry one SQL text")
        assert(q.sql.contains("LATERAL ("),
          s"v29 seed $seed: expected a LATERAL body in: ${q.sql}")
        q.mode.split(":")(1) match {
          case "topk"  => topk += 1
          case "agg"   => agg += 1
          case "leftk" => leftk += 1
          case other => fail(s"v29 seed $seed: unknown lateral shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v29 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v29 seeds matched; $topk topk, $agg agg, $leftk leftk")
    assert(topk >= 18, s"top-k shape under-drawn: $topk")
    assert(agg >= 18, s"aggregate-lateral shape under-drawn: $agg")
    assert(leftk >= 18, s"left-lateral shape under-drawn: $leftk")
  }

  test("grammar v30 (subqueries as projected values: three-valued IN/NOT IN flags, EXISTS booleans, CASE classifier keys): 120 seeds, DF-API ≡ spark.sql") {
    views
    var inflag = 0; var poison = 0; var exists = 0; var caseagg = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 30)
      if (q.mode.startsWith("psubq")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v30 seed $seed: projected-subquery query should carry one SQL text")
        q.mode.split(":")(1) match {
          case "inflag"  => inflag += 1; if (q.mode.contains(":poison")) poison += 1
          case "exists"  => exists += 1
          case "caseagg" => caseagg += 1
          case other => fail(s"v30 seed $seed: unknown psubq shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v30 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v30 seeds matched; $inflag inflag ($poison poisoned), $exists exists, $caseagg caseagg")
    assert(inflag >= 18, s"in-flag shape under-drawn: $inflag")
    assert(poison >= 3, s"poisoned-list draw under-drawn: $poison")
    assert(exists >= 18, s"exists-flag shape under-drawn: $exists")
    assert(caseagg >= 18, s"case-classifier shape under-drawn: $caseagg")
  }

  test("grammar v31 (DECIMAL at the typed boundaries: GROUP BY keys, JOIN keys, scale-pinned predicates): 120 seeds, DF-API ≡ spark.sql") {
    views
    var group = 0; var joinkey = 0; var pred = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 31)
      if (q.mode.startsWith("decb")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v31 seed $seed: decimal-boundary query should carry one SQL text")
        assert(q.sql.contains("AS DECIMAL("),
          s"v31 seed $seed: expected DECIMAL casts in: ${q.sql}")
        // same surface rule as v27 (r13 verdict #1): rendered columns are
        // never DECIMAL-typed
        assert(!q.build(spark, TestSpark.sf0001).schema
            .exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]),
          s"v31 seed $seed: DECIMAL-typed output column in: ${q.sql}")
        q.mode.split(":")(1) match {
          case "group"   => group += 1
          case "joinkey" => joinkey += 1
          case "pred"    => pred += 1
          case other => fail(s"v31 seed $seed: unknown decb shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v31 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v31 seeds matched; $group group, $joinkey joinkey, $pred pred")
    assert(group >= 15, s"decimal-group-key shape under-drawn: $group")
    assert(joinkey >= 15, s"decimal-join-key shape under-drawn: $joinkey")
    assert(pred >= 15, s"decimal-predicate shape under-drawn: $pred")
  }

  test("grammar v32 (documents ⋈ embeddings partial edge: projection, grouped contrast, coverage probe): 120 seeds, DF-API ≡ spark.sql") {
    views
    var proj = 0; var group = 0; var coverage = 0; var left = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 32)
      if (q.mode.startsWith("docemb")) {
        // the emb fragment is dual-dialect (array syntax differs), so a
        // distinct spark.sql rendering must exist
        assert(q.sparkSqlOpt.isDefined,
          s"v32 seed $seed: docemb query should carry a Spark-dialect SQL")
        assert(q.sql.contains("doc_id = vec_id"),
          s"v32 seed $seed: expected the corpus edge in: ${q.sql}")
        if (q.mode.endsWith(":left")) left += 1
        q.mode.split(":")(1) match {
          case "proj"     => proj += 1
          case "group"    => group += 1
          case "coverage" => coverage += 1
          case other => fail(s"v32 seed $seed: unknown docemb shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v32 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v32 seeds matched; $proj proj, $group group, $coverage coverage ($left LEFT)")
    assert(proj >= 15, s"projection shape under-drawn: $proj")
    assert(group >= 15, s"grouped-contrast shape under-drawn: $group")
    assert(coverage >= 15, s"coverage-probe shape under-drawn: $coverage")
    assert(left >= 25, s"LEFT form under-drawn: $left")
  }

  test("grammar v33 (DECIMAL x NULL: NULL-skipping aggregates, NULL decimal group keys, three-valued predicates + typed COALESCE): 120 seeds, DF-API ≡ spark.sql") {
    views
    var agg = 0; var group = 0; var pred = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 33)
      if (q.mode.startsWith("decn")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v33 seed $seed: decimal-null query should carry one SQL text")
        assert(q.sql.contains("THEN NULL ELSE CAST(") &&
            q.sql.contains("AS DECIMAL("),
          s"v33 seed $seed: expected the NULL-injected decimal view in: ${q.sql}")
        assert(!q.build(spark, TestSpark.sf0001).schema
            .exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]),
          s"v33 seed $seed: DECIMAL-typed output column in: ${q.sql}")
        q.mode.split(":")(1) match {
          case "agg"   => agg += 1
          case "group" => group += 1
          case "pred"  => pred += 1
          case other => fail(s"v33 seed $seed: unknown decn shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v33 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v33 seeds matched; $agg agg, $group group, $pred pred")
    assert(agg >= 15, s"aggregate-contrast shape under-drawn: $agg")
    assert(group >= 15, s"null-group-key shape under-drawn: $group")
    assert(pred >= 15, s"three-valued-predicate shape under-drawn: $pred")
  }

}
