package graft

import graft.fuzz.FuzzGen

/** Grammar slices v31-v39 + generator canaries (see FuzzSpecBase). */
class FuzzSpecLate extends FuzzSpecBase {
  test("grammar v34 (JSON-path extraction: props direct + constructed-JSON view, missing-key NULLs, extracted group keys/predicates): 120 seeds, DF-API ≡ spark.sql") {
    views
    var direct = 0; var proj = 0; var group = 0; var pred = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 34)
      if (q.mode.startsWith("json")) {
        // the extraction function name is the ONE dialect split: the duck
        // text must never leak get_json_object, the spark text never
        // json_extract_string
        assert(q.sparkSqlOpt.isDefined,
          s"v34 seed $seed: json query must carry a spark-dialect SQL")
        assert(q.sql.contains("json_extract_string") &&
            !q.sql.contains("get_json_object"),
          s"v34 seed $seed: duck text has the wrong extraction fn: ${q.sql}")
        assert(q.sparkSql.contains("get_json_object") &&
            !q.sparkSql.contains("json_extract_string"),
          s"v34 seed $seed: spark text has the wrong extraction fn")
        q.mode.split(":")(1) match {
          case "direct" => direct += 1
          case "proj"   => proj += 1
          case "group"  => group += 1
          case "pred"   => pred += 1
          case other    => fail(s"v34 seed $seed: unknown json shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v34 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v34 seeds matched; $direct direct, $proj proj, $group group, $pred pred")
    assert(direct >= 10, s"events.props direct source under-drawn: $direct")
    assert(proj >= 10, s"constructed projection shape under-drawn: $proj")
    assert(group >= 10, s"extracted-group-key shape under-drawn: $group")
    assert(pred >= 10, s"extracted-predicate shape under-drawn: $pred")
  }

  test("grammar v35 (collation: non-ASCII ORDER BY/GROUP BY/min-max/predicates, case folding): 120 seeds, DF-API ≡ spark.sql") {
    views
    var order = 0; var group = 0; var minmax = 0; var pred = 0; var fold = 0
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 35)
      if (q.mode.startsWith("coll")) {
        // shared-dialect grammar: ONE SQL text for both engines
        assert(q.sparkSqlOpt.isEmpty,
          s"v35 seed $seed: collation SQL must be dialect-shared")
        // every collation key is concat-DERIVED: a bare CASE-literal sort
        // key hits DuckDB 1.0.0's signed-byte dictionary-sort path (see
        // collationQuery doc) — pin the construction, not just the draws
        assert(q.sql.contains("END || ") || q.sql.contains(" || CASE"),
          s"v35 seed $seed: collation key must concat the CASE output: ${q.sql}")
        q.mode.split(":")(1) match {
          case "order"  => order += 1
          case "group"  => group += 1
          case "minmax" => minmax += 1
          case "pred"   => pred += 1
          case "fold" | "upper" => fold += 1
          case other    => fail(s"v35 seed $seed: unknown coll shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v35 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v35 seeds matched; $order order, $group group, $minmax minmax, " +
      s"$pred pred, $fold fold/upper")
    assert(order >= 8, s"total-order shape under-drawn: $order")
    assert(group >= 8, s"collation-group shape under-drawn: $group")
    assert(minmax >= 8, s"string-minmax shape under-drawn: $minmax")
    assert(pred >= 8, s"byte-order-predicate shape under-drawn: $pred")
    assert(fold >= 8, s"case-fold shape under-drawn: $fold")
  }

  test("grammar v36 (range/band joins: temporal + numeric BETWEEN refinements on equality anchors, INNER/LEFT): 120 seeds, DF-API ≡ spark.sql") {
    views
    var group = 0; var proj = 0; var leftK = 0
    val templates = scala.collection.mutable.Set.empty[String]
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 36)
      if (q.mode.startsWith("range")) {
        assert(q.sparkSqlOpt.isEmpty,
          s"v36 seed $seed: range-join SQL must be dialect-shared")
        // every band is anchored on an equality key — the plan must never
        // be a nested loop; pin the JOIN condition itself: the ON clause
        // must carry one of the three template key equalities, and the
        // BETWEEN band must follow it (template 1's parity filters also
        // contain " = ", so a bare contains(" = ") would not pin this)
        val anchorIdx = Seq("ON l_orderkey = o_orderkey AND",
          "ON r_uid = l_uid AND",
          "ON l_partkey = p_partkey AND").map(q.sql.indexOf).find(_ >= 0)
        assert(anchorIdx.nonEmpty,
          s"v36 seed $seed: ON clause lost its equality anchor: ${q.sql}")
        assert(q.sql.indexOf(" BETWEEN ", anchorIdx.get) > anchorIdx.get,
          s"v36 seed $seed: band does not follow the equality anchor: ${q.sql}")
        val parts = q.mode.split(":")
        parts(1) match {
          case "group" => group += 1
          case "proj"  => proj += 1
          case other   => fail(s"v36 seed $seed: unknown range shape $other")
        }
        templates += parts(2)
        if (parts(3) == "left") leftK += 1
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v36 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v36 seeds matched; $group group, $proj proj, $leftK LEFT, " +
      s"templates=${templates.toSeq.sorted.mkString(",")}")
    assert(group >= 20, s"grouped-count shape under-drawn: $group")
    assert(proj >= 20, s"projection shape under-drawn: $proj")
    assert(leftK >= 15, s"LEFT kind under-drawn: $leftK")
    assert(templates == Set("0", "1", "2"),
      s"chain templates starved: $templates")
  }

  test("grammar v37 (multimodal meta scalars: byte/frame/format derived view): 120 seeds, DF-API ≡ spark.sql") {
    views
    var group = 0; var hist = 0; var proj = 0
    val frames = scala.collection.mutable.Set.empty[String]
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 37)
      if (q.mode.startsWith("media")) {
        // the octet_length dialect split (DuckDB needs encode()) means a
        // media draw ALWAYS carries a distinct Spark rendering — and the
        // oracle text must carry the DuckDB-only encode() form
        assert(q.sparkSqlOpt.nonEmpty,
          s"v37 seed $seed: media draw lost its Spark rendering")
        assert(q.sql.contains("octet_length(encode(text))"),
          s"v37 seed $seed: oracle text lost the DuckDB encode() form: ${q.sql}")
        assert(q.sparkSql.contains("octet_length(text)") &&
          !q.sparkSql.contains("encode("),
          s"v37 seed $seed: Spark text carries the DuckDB-only encode(): ${q.sparkSql}")
        val parts = q.mode.split(":")
        parts(1) match {
          case "group" => group += 1
          case "hist"  => hist += 1
          case "proj"  => proj += 1
          case other   => fail(s"v37 seed $seed: unknown media shape $other")
        }
        frames += parts(2)
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v37 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v37 seeds matched; $group group, $hist hist, $proj proj, " +
      s"frame sizes=${frames.toSeq.sorted.mkString(",")}")
    assert(group >= 15, s"grouped shape under-drawn: $group")
    assert(hist >= 15, s"histogram shape under-drawn: $hist")
    assert(proj >= 15, s"projection shape under-drawn: $proj")
    assert(frames == Set("f32", "f64", "f128"),
      s"frame-size draws starved: $frames")
  }

  test("grammar v38 (VARIANT typed extraction: parse_json + variant_get derived view): 120 seeds, DF-API ≡ spark.sql") {
    views
    var direct = 0; var proj = 0; var group = 0; var pred = 0
    val gkeys = scala.collection.mutable.Set.empty[String]
    val tables = scala.collection.mutable.Set.empty[String]
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 38)
      if (q.mode.startsWith("variant")) {
        // the typed-extraction dialect split (variant_get vs
        // json_extract_string+CAST) means a variant draw ALWAYS carries a
        // distinct Spark rendering, and the two texts must not leak into
        // each other's dialect
        assert(q.sparkSqlOpt.nonEmpty,
          s"v38 seed $seed: variant draw lost its Spark rendering")
        assert(q.sparkSql.contains("variant_get(parse_json(") &&
          !q.sparkSql.contains("json_extract_string"),
          s"v38 seed $seed: Spark text lost the variant path: ${q.sparkSql}")
        assert(q.sql.contains("json_extract_string") &&
          !q.sql.contains("variant_get"),
          s"v38 seed $seed: oracle text carries Spark-only variant_get: ${q.sql}")
        val parts = q.mode.split(":")
        if (parts(1) == "direct") direct += 1
        else tables += parts(2)
        parts(1) match {
          case "direct" => ()
          case "proj"   => proj += 1
          case "group"  => group += 1; gkeys += parts(3)
          case "pred"   => pred += 1
          case other    => fail(s"v38 seed $seed: unknown variant shape $other")
        }
      }
      val a = q.build(spark, TestSpark.sf0001).collect()
      val b = spark.sql(q.sparkSql).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"v38 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
          s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
            .find { case (x, y) => x != y }}")
    }
    info(s"120 v38 seeds matched; $direct direct, $proj proj, $group group " +
      s"(keys=${gkeys.toSeq.sorted.mkString(",")}), $pred pred, " +
      s"tables=${tables.toSeq.sorted.mkString(",")}")
    assert(direct >= 10, s"direct events.props shape under-drawn: $direct")
    assert(proj >= 10, s"projection shape under-drawn: $proj")
    assert(group >= 10, s"group-by-extracted shape under-drawn: $group")
    assert(pred >= 10, s"predicate shape under-drawn: $pred")
    assert(gkeys.contains("j_f"),
      s"the BOOLEAN group key (the typed surface v34 never drew) starved: $gkeys")
    assert(tables.size >= 3, s"constructed-JSON base-table draws starved: $tables")
  }

  test("grammar v39 (XML round-trip: from_xml over a constructed document): 120 seeds, DF-API ≡ spark.sql") {
    views
    var proj = 0; var group = 0; var pred = 0
    var attr = 0; var elem = 0
    val gkeys = scala.collection.mutable.Set.empty[String]
    val tables = scala.collection.mutable.Set.empty[String]
    (1 to 120).foreach { seed =>
      val q = FuzzGen.query(seed, 39)
      if (q.mode.startsWith("xml")) {
        // the dialect split is structural: Spark parses the document it
        // just rendered (from_xml MUST appear), DuckDB has no XML so its
        // text computes from raw scalars (from_xml must NOT leak, nor
        // any XML tag text)
        assert(q.sparkSqlOpt.nonEmpty,
          s"v39 seed $seed: xml draw lost its Spark rendering")
        assert(q.sparkSql.contains("from_xml("),
          s"v39 seed $seed: Spark text lost the from_xml path: ${q.sparkSql}")
        assert(!q.sql.contains("from_xml") && !q.sql.contains("<rec"),
          s"v39 seed $seed: oracle text leaked the XML dialect: ${q.sql}")
        if (q.sparkSql.contains("_a BIGINT")) attr += 1 else elem += 1
        val parts = q.mode.split(":")
        tables += parts(2)
        parts(1) match {
          case "proj"  => proj += 1
          case "group" => group += 1; gkeys += parts(3)
          case "pred"  => pred += 1
          case other   => fail(s"v39 seed $seed: unknown xml shape $other")
        }
        val a = q.build(spark, TestSpark.sf0001).collect()
        val b = spark.sql(q.sparkSql).collect()
        assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
          s"v39 seed $seed diverged (${a.length} vs ${b.length} rows): ${q.sql}\n" +
            s"first diff: ${a.map(_.toString).zipAll(b.map(_.toString), "<missing>", "<missing>")
              .find { case (x, y) => x != y }}")
      }
    }
    info(s"v39 seeds matched; $proj proj, $group group " +
      s"(keys=${gkeys.toSeq.sorted.mkString(",")}), $pred pred, " +
      s"$attr attribute-form / $elem element-form, " +
      s"tables=${tables.toSeq.sorted.mkString(",")}")
    assert(proj >= 10, s"projection shape under-drawn: $proj")
    assert(group >= 10, s"group-by-extracted shape under-drawn: $group")
    assert(pred >= 10, s"predicate shape under-drawn: $pred")
    assert(attr >= 10 && elem >= 10,
      s"attribute/element draw starved: attr=$attr elem=$elem")
    assert(gkeys == Set("x_a", "x_s"), s"group-key draws starved: $gkeys")
    assert(tables.size >= 3, s"base-table draws starved: $tables")
  }

  test("v35 fragment pool: compiled literals carry the intended code points (encoding canary)") {
    // The pool is written as \u escapes so the POSIX-locale build cannot
    // corrupt it; this canary pins the COMPILED values' code points, so a
    // future re-encoding of the source file (e.g. an editor normalizing
    // escapes back to raw UTF-8 under a non-UTF-8 scalac charset) fails
    // loudly instead of silently shipping mojibake that both renderings
    // would agree on.
    val byFirstCp = FuzzGen.collationCanary
    assert(byFirstCp("latin1Upper") == 0x00C1, "A-acute fragment corrupted")
    assert(byFirstCp("decomposedSecondCp") == 0x0301,
      "decomposed combining-acute fragment corrupted")
    assert(byFirstCp("sharpS") == 0x00DF, "sharp-s fragment corrupted")
    assert(byFirstCp("cjk") == 0x4E2D, "CJK fragment corrupted")
    assert(byFirstCp("hangul") == 0xD55C, "Hangul fragment corrupted")
    assert(byFirstCp("emoji") == 0x1F389, "supplementary-plane fragment corrupted")
    assert(byFirstCp("fullwidth") == 0xFF11, "full-width fragment corrupted")
  }

  test("decSpec literal pools: every dLit value's scale fits its column's DECIMAL scale") {
    // ADVICE r14: decLit/vLit setScale(s, UNNECESSARY) throws
    // ArithmeticException AT GENERATION TIME if a future literal-pool edit
    // carries more decimals than the column's decSpec scale — which would
    // brick every seed that draws it. Lint the pools statically instead of
    // waiting for the sweep to explode.
    FuzzGen.catalog.values.flatten.filter(c => FuzzGen.decSpec.contains(c.name))
      .foreach { c =>
        val s = FuzzGen.decSpec(c.name)._2
        c.lits.foreach { l =>
          val litScale = new java.math.BigDecimal(l.sql).stripTrailingZeros.scale
          assert(litScale <= s,
            s"${c.name}: literal ${l.sql} has scale $litScale > decSpec scale $s — " +
              "setScale(RoundingMode.UNNECESSARY) will throw at generation time")
        }
      }
  }

  test("corpus preconditions the generators assume: 64-wide NULL-free embeddings, NULL-free join-edge keys") {
    views
    import org.apache.spark.sql.functions._
    // v16's element-index draws go 1..EmbeddingDim; under ANSI Spark throws
    // on an out-of-bounds element while DuckDB returns NULL — the two
    // renderings would fail DIFFERENTLY on a regenerated narrower corpus
    // (ADVICE r11). Pin the corpus fact loudly here instead.
    val dims = spark.table("embeddings")
      .agg(min(size(col("embedding"))).as("lo"), max(size(col("embedding"))).as("hi"),
        count(when(col("embedding").isNull, 1)).as("nulls"))
      .collect()(0)
    assert(dims.getInt(0) == FuzzGen.EmbeddingDim && dims.getInt(1) == FuzzGen.EmbeddingDim,
      s"embedding dim drifted from FuzzGen.EmbeddingDim=${FuzzGen.EmbeddingDim}: $dims")
    assert(dims.getLong(2) == 0L, s"embeddings carry NULL vectors: $dims")
    // fullOuterQuery derives its source tag from `fk IS NULL` / `pk IS
    // NULL`, which misclassifies a matched row if a corpus edge column were
    // ever naturally NULL (ADVICE r11). The v12 pinned SQL is frozen, so
    // enforce the precondition instead of re-rendering the tag.
    (FuzzGen.fkEdges :+ FuzzGen.eventsCustomerEdge).foreach {
      case (factT, fk, dimT, pk) =>
        val fNulls = spark.table(factT).where(col(fk).isNull).count()
        val dNulls = spark.table(dimT).where(col(pk).isNull).count()
        assert(fNulls == 0 && dNulls == 0,
          s"edge $factT.$fk -> $dimT.$pk carries NULL keys ($fNulls/$dNulls) — " +
            "fullOuterQuery's source-tag derivation would misclassify")
    }
    // Every catalog string-literal pool must stay quote-and-backslash free:
    // strScalarQuery's raw() splices the unquoted text UNESCAPED into
    // single-quoted shared SQL. raw() itself requires this at draw time,
    // but that only fires when a sweep happens to draw the bad literal —
    // assert the whole pool statically here instead (ADVICE r13).
    FuzzGen.catalog.foreach { case (t, fcols) =>
      fcols.filter(_.kind == 's').foreach { c =>
        c.lits.foreach { l =>
          val r = l.sql.substring(1, l.sql.length - 1)
          assert(!r.contains('\'') && !r.contains('\\'),
            s"$t.${c.name} sLit ${l.sql} carries a quote/backslash — " +
              "raw()'s unescaped splice into shared SQL would break")
        }
      }
    }
    // v27/v31 decimal modes render their outputs as scale-≤6 strings and
    // rely on every decSpec column carrying ≤2 corpus decimals (so any
    // product of two carries ≤4 and the rendered-scale cap never rounds).
    // DECIMAL(38,6) vs DECIMAL(38,2) casts compare numerically: unequal
    // means a value with >2 decimals exists.
    val decTable = Map(
      "c_acctbal" -> "customer", "s_acctbal" -> "supplier",
      "p_retailprice" -> "part", "o_totalprice" -> "orders",
      "l_quantity" -> "lineitem", "l_extendedprice" -> "lineitem",
      "l_discount" -> "lineitem", "l_tax" -> "lineitem",
      "value" -> "events")
    assert(FuzzGen.decSpec.keySet == decTable.keySet,
      s"decSpec drifted from the precondition's column set: ${FuzzGen.decSpec.keySet}")
    decTable.foreach { case (c, t) =>
      val n = spark.table(t)
        .where(col(c).cast("decimal(38,6)") =!= col(c).cast("decimal(38,2)"))
        .count()
      assert(n == 0L,
        s"$t.$c carries $n values with >2 decimals — v27/v31's rendered-" +
          "scale cap (and double-literal exactness) would round")
    }
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

  test("declared fz slice is frozen: every seed's generated SQL hash-pinned") {
    // A generator edit that shifts ANY draw silently re-points the oracle
    // SQL of the frozen catalog slice — rows would still hash-match (both
    // renderings move together), so only an explicit pin catches it. A
    // DELIBERATE grammar/slice change regenerates these via
    // Test/runMain graft.tools.FuzzPinGen.
    val pins = Map(
    "fz202" -> "224fe376",
    "fz204" -> "ddf3bf1c",
    "fz206" -> "33bb0783",
    "fz208" -> "25a325d9",
    "fz212" -> "851e3cfc",
    "fz215" -> "a7b3e9c1",
    "fz219" -> "e718339a",
    "fz227" -> "422756f3",
    "fz228" -> "9968f020",
    "fz241" -> "f9a0532f",
    "fz254" -> "ba1645a3",
    "fz260" -> "b0140c0b",
    "fz302" -> "acf5e111",
    "fz305" -> "69cceb95",
    "fz311" -> "29f1a64d",
    "fz312" -> "7f78dc02",
    "fz317" -> "f9a24f54",
    "fz327" -> "49977b45",
    "fz329" -> "fb92dff9",
    "fz338" -> "299cb889",
    "fz339" -> "8bd7b307",
    "fz343" -> "de8408a5",
    "fz361" -> "77128ae3",
    "fz363" -> "0cc292d3",
    "fz401" -> "b3ddd494",
    "fz409" -> "319feb47",
    "fz412" -> "d386454b",
    "fz414" -> "8474545d",
    "fz422" -> "6a52cb32",
    "fz426" -> "534115c8",
    "fz429" -> "f923c5c6",
    "fz431" -> "5ffae225",
    "fz432" -> "c8251065",
    "fz454" -> "e42848a4",
    "fz507" -> "034f5c44",
    "fz512" -> "8f55a597",
    "fz514" -> "3cf942fa",
    "fz525" -> "0abd237c",
    "fz533" -> "b6f234b8",
    "fz548" -> "0c037c23",
    "fz569" -> "20e64ea2",
    "fz584" -> "6c625a1b",
    "fz617" -> "0e082d49",
    "fz620" -> "74d1c6ae",
    "fz705" -> "06eeb2fd",
    "fz711" -> "17c18261",
    "fz712" -> "e8852c36",
    "fz716" -> "995fb1c8",
    "fz723" -> "03118c4e",
    "fz728" -> "03df45c6",
    "fz734" -> "0878bfa4",
    "fz747" -> "97b5e20d",
    "fz748" -> "629d0a76",
    "fz753" -> "366918f3",
    "fz768" -> "ee17c9d0",
    "fz772" -> "e5aa6edb",
    "fz793" -> "58493ec5",
    "fz795" -> "1eac6012",
    "fz797" -> "e1d152ae",
    "fz914" -> "f892d0ce",
    "fz13" -> "b70074d3",
    "fz19" -> "85fb8078",
    "fz35" -> "794065e9",
    "fz39" -> "ea552137",
    "fz40" -> "c47420f1",
    "fz46" -> "4b42e2fa",
    "fz66" -> "b92488ae",
    "fz69" -> "18152750",
    "fz73" -> "8b58c6d3",
    "fz87" -> "2f4d018e",
    "fz91" -> "5db52542",
    "fz94" -> "81aead4f",
    "fz101" -> "279b8ca0",
    "fz121" -> "dbf31537",
    "fz132" -> "ed97cbf2",
    "fz141" -> "e076301d",
    "fz147" -> "44033cd2",
    "fz165" -> "02e1b2d1",
    "fz180" -> "b662d239",
    "fz197" -> "1884f823",
    "fz1" -> "612d5049",
    "fz10" -> "2a4e1ea9",
    "fz14" -> "9d9acebf",
    "fz16" -> "e183cb80",
    "fz100" -> "00402040",
    "fz102" -> "5b0625fa",
    "fz109" -> "5a22ae7b",
    "fz111" -> "2c8f9121",
    "fz114" -> "7bda4cd0",
    "fz127" -> "143fa975",
    "fz131" -> "431fbc66",
    "fz134" -> "c5b120c9",
    "fz143" -> "29e4f733",
    "fz150" -> "63f6758f",
    "fz153" -> "909aaac2",
    "fz159" -> "469a6c9b",
    "fz163" -> "4113fbce",
    "fz174" -> "85592648",
    "fz190" -> "125a183d",
    "fz192" -> "6b413171",
    "fz105" -> "9d79446d",
    "fz107" -> "a5a602c7",
    "fz112" -> "b28fb079",
    "fz117" -> "999ad9cd",
    "fz118" -> "eb913aab",
    "fz119" -> "f8f860a7",
    "fz123" -> "708f28ad",
    "fz124" -> "7fe7b02d",
    "fz129" -> "8b49338e",
    "fz136" -> "84cffcdf",
    "fz144" -> "da1e6728",
    "fz148" -> "8c1c1466",
    "fz152" -> "b6055c5a",
    "fz157" -> "ea378fcb",
    "fz167" -> "2796ab81",
    "fz177" -> "02a49113",
    "fz1001" -> "45f88e06",
    "fz1005" -> "199ce6f1",
    "fz1007" -> "a5b4f4bd",
    "fz1011" -> "6f3d16ee",
    "fz1014" -> "272cf1d2",
    "fz1017" -> "459ec504",
    "fz1018" -> "11635aa3",
    "fz1026" -> "7346bee7",
    "fz1030" -> "f4a21306",
    "fz1036" -> "bca8056c",
    "fz1045" -> "920effef",
    "fz1052" -> "6390ca30",
    "fz1065" -> "7fcff81c",
    "fz1077" -> "b015e6ca",
    "fz1082" -> "bb0f39fd",
    "fz1086" -> "5606deb7",
    "fz1087" -> "5ee75976",
    "fz1089" -> "fa2820db",
    "fz1092" -> "03393468",
    "fz2001" -> "8520447f",
    "fz2003" -> "ce2ce70d",
    "fz2008" -> "c9312b5a",
    "fz2014" -> "50d0d2ff",
    "fz2015" -> "33f85b29",
    "fz2016" -> "a5ccaf3d",
    "fz2017" -> "35b4962e",
    "fz2025" -> "8bea2ecf",
    "fz2030" -> "2ca1807c",
    "fz2035" -> "58214b1e",
    "fz2037" -> "f919836c",
    "fz2039" -> "9875d4a5",
    "fz2042" -> "67bde232",
    "fz2046" -> "c60cbe91",
    "fz2050" -> "f1a4b7a8",
    "fz2052" -> "7f00adfc",
    "fz2053" -> "485281aa",
    "fz2054" -> "c3d8dd4f",
    "fz2055" -> "3f5dc77a",
    "fz2060" -> "c729eeec",
    "fz3002" -> "93fa53dd",
    "fz3003" -> "5b52d46c",
    "fz3005" -> "c1a68bdb",
    "fz3007" -> "9e4e298b",
    "fz3009" -> "b601fb01",
    "fz3011" -> "124caa7f",
    "fz3012" -> "70e28691",
    "fz3013" -> "092108a8",
    "fz3016" -> "ebf57b6a",
    "fz3018" -> "29b7429c",
    "fz3020" -> "d24303e5",
    "fz3021" -> "ea90b262",
    "fz3025" -> "e9572254",
    "fz3027" -> "024dfee9",
    "fz3036" -> "907e20cd",
    "fz3037" -> "b23766d4",
    "fz3045" -> "e03d4548",
    "fz3051" -> "a1ab1adc",
    "fz3059" -> "0ab82eb9",
    "fz3060" -> "855b688e",
    "fz3069" -> "3b9cd998",
    "fz4001" -> "3f23956a",
    "fz4002" -> "63e591d8",
    "fz4004" -> "377112f3",
    "fz4005" -> "ead08c1c",
    "fz4007" -> "c9447cc0",
    "fz4009" -> "baa9652c",
    "fz4011" -> "9f3d591f",
    "fz4012" -> "5e39a0f6",
    "fz4014" -> "e34814e1",
    "fz4015" -> "087f2443",
    "fz4021" -> "bf88776d",
    "fz4023" -> "61ba63b2",
    "fz4025" -> "089379e5",
    "fz4032" -> "4de5abf3",
    "fz4034" -> "8ba1cf5e",
    "fz4035" -> "638c5bf7",
    "fz4036" -> "63bf2f67",
    "fz4040" -> "06a90352",
    "fz4046" -> "70c8723a",
    "fz4058" -> "e6566004",
    "fz5003" -> "3fcc1a35",
    "fz5006" -> "f382f519",
    "fz5008" -> "e681ea71",
    "fz5016" -> "4f97d6e4",
    "fz5017" -> "d01e3554",
    "fz5018" -> "743af697",
    "fz5020" -> "92f1517e",
    "fz5023" -> "b3a324f7",
    "fz5025" -> "65aa4f7f",
    "fz5029" -> "411faf5e",
    "fz5031" -> "19526965",
    "fz5035" -> "d10244c5",
    "fz5038" -> "6ff5b452",
    "fz5041" -> "ef2d4d50",
    "fz5042" -> "b1d063d2",
    "fz5045" -> "d6577124",
    "fz5050" -> "8043cada",
    "fz5057" -> "d331cc4c",
    "fz5060" -> "2a639f90",
    "fz5074" -> "7a4b6085",
    "fz6001" -> "a9e95cb5",
    "fz6002" -> "1a715904",
    "fz6004" -> "c840b506",
    "fz6005" -> "02de7c32",
    "fz6007" -> "c0b85be9",
    "fz6009" -> "33b3abca",
    "fz6012" -> "126421ce",
    "fz6013" -> "0108fba6",
    "fz6014" -> "ac7277ea",
    "fz6015" -> "c5e981a8",
    "fz6016" -> "b3b314d3",
    "fz6017" -> "9c622182",
    "fz6022" -> "8858bd30",
    "fz6032" -> "f2080732",
    "fz6034" -> "3f8605db",
    "fz6041" -> "31fd57c2",
    "fz6042" -> "a519d128",
    "fz6043" -> "c790f9c0",
    "fz6047" -> "427acf62",
    "fz6049" -> "4efe474f",
    "fz7002" -> "1ab24b23",
    "fz7004" -> "667fe50b",
    "fz7005" -> "3ca526ac",
    "fz7007" -> "7ab22414",
    "fz7009" -> "a041e1aa",
    "fz7010" -> "15e9054f",
    "fz7011" -> "bed2f651",
    "fz7015" -> "ef519170",
    "fz7016" -> "dd4c5c6b",
    "fz7017" -> "aa66610e",
    "fz7019" -> "486db9f8",
    "fz7020" -> "fe676146",
    "fz7023" -> "f556589a",
    "fz7024" -> "2a0f5fb5",
    "fz7027" -> "130ccec7",
    "fz7028" -> "99f54108",
    "fz7029" -> "754b81d0",
    "fz7033" -> "4efdf41f",
    "fz7035" -> "63178ac8",
    "fz7042" -> "78e29f18",
    "fz8001" -> "28c07ad2",
    "fz8002" -> "5d4d1977",
    "fz8003" -> "558fdbf3",
    "fz8008" -> "a695564f",
    "fz8014" -> "5f413326",
    "fz8016" -> "8b2dd657",
    "fz8018" -> "bac49dd1",
    "fz8020" -> "9d4fe341",
    "fz8025" -> "4ffe5657",
    "fz8081" -> "a0d54c41",
    "fz8088" -> "2e4fcb1a",
    "fz8091" -> "d25bb32a",
    "fz8098" -> "bb5f26db",
    "fz8107" -> "8793070f",
    "fz8124" -> "479e318a",
    "fz8125" -> "716253f5",
    "fz8126" -> "d0e560f8",
    "fz8130" -> "e299220c",
    "fz8142" -> "081aae6b",
    "fz8144" -> "7c975943",
    "fz8170" -> "fdf09f0b",
    "fz8174" -> "546cfd99",
    "fz8188" -> "4dba7850",
    "fz9002" -> "ece4feb1",
    "fz9003" -> "bf764e35",
    "fz9006" -> "4089e55c",
    "fz9010" -> "2b15811e",
    "fz9011" -> "005e511c",
    "fz9013" -> "666f5829",
    "fz9014" -> "252dfcf7",
    "fz9019" -> "e6a25046",
    "fz9023" -> "bcbf7fd8",
    "fz9025" -> "ce107b39",
    "fz9027" -> "35530202",
    "fz9028" -> "0f64008d",
    "fz9029" -> "9ec28f1f",
    "fz9032" -> "24f4e0ec",
    "fz9034" -> "480a726c",
    "fz9037" -> "f2c028af",
    "fz9039" -> "0e6b8eb3",
    "fz9040" -> "f45c7d35",
    "fz9041" -> "4b63d8aa",
    "fz9050" -> "71944807",
    "fz9054" -> "29db2d67",
    "fz9056" -> "1a34ee1e",
    "fz9063" -> "ef40fc61",
    "fz9073" -> "dac134b0",
    "fz9085" -> "b8d37986",
    "fz9113" -> "9d0128ed",
    "fz9134" -> "629af908",
    "fz10001" -> "0dafbaa3",
    "fz10002" -> "9850edaa",
    "fz10008" -> "745153cb",
    "fz10010" -> "bba41192",
    "fz10011" -> "98938260",
    "fz10012" -> "d8bdc9cf",
    "fz10013" -> "238ef48d",
    "fz10014" -> "589b3a34",
    "fz10027" -> "723c91ce",
    "fz10028" -> "cb3f5fa4",
    "fz10029" -> "69413022",
    "fz10031" -> "6de8b10c",
    "fz10034" -> "18cbbd77",
    "fz10035" -> "52561967",
    "fz10037" -> "cd9b7826",
    "fz10040" -> "40b2708e",
    "fz10043" -> "bd728a32",
    "fz10047" -> "a8ab5499",
    "fz10048" -> "69e23470",
    "fz10049" -> "10642050",
    "fz10054" -> "5c536b1c",
    "fz10064" -> "873e3c7f",
    "fz10066" -> "1448521a",
    "fz10068" -> "3c9afaae",
    "fz10069" -> "19e3fd8d",
    "fz10071" -> "6236cfeb",
    "fz11003" -> "58c05845",
    "fz11004" -> "409d68ef",
    "fz11005" -> "4d3cb4f8",
    "fz11007" -> "49dd91c6",
    "fz11009" -> "0e96049f",
    "fz11011" -> "7a106e6c",
    "fz11014" -> "bb6eba77",
    "fz11015" -> "1e100bff",
    "fz11021" -> "4d2a24ae",
    "fz11023" -> "32936dac",
    "fz11024" -> "156d9fe6",
    "fz11038" -> "0c6fd330",
    "fz11039" -> "e82220b3",
    "fz11041" -> "62450364",
    "fz11043" -> "9011de6a",
    "fz11045" -> "cad4fe77",
    "fz11048" -> "154f3c5b",
    "fz11051" -> "faf73f64",
    "fz11054" -> "ca943fe5",
    "fz11063" -> "f170b5e3",
    "fz12002" -> "44e76fa0",
    "fz12003" -> "76449105",
    "fz12005" -> "091630c2",
    "fz12007" -> "c36cea80",
    "fz12009" -> "63859f1f",
    "fz12014" -> "b2678546",
    "fz12017" -> "e64e9c3c",
    "fz12018" -> "2b1fa312",
    "fz12019" -> "45340d43",
    "fz12023" -> "86091fb8",
    "fz12027" -> "4c592ac1",
    "fz12032" -> "33cb1ec0",
    "fz12034" -> "23333293",
    "fz12042" -> "a54f7988",
    "fz12048" -> "f83f6440",
    "fz12054" -> "e005b32b",
    "fz12055" -> "2982818b",
    "fz12057" -> "6c20eb60",
    "fz13002" -> "3d13c680",
    "fz13004" -> "2263481f",
    "fz13005" -> "50dbff64",
    "fz13006" -> "2a065656",
    "fz13007" -> "bb9eec49",
    "fz13011" -> "389daffd",
    "fz13012" -> "3f752e84",
    "fz13016" -> "dcc80a23",
    "fz13022" -> "1543b3a9",
    "fz13024" -> "5a65bc22",
    "fz13029" -> "564809f4",
    "fz13036" -> "42231592",
    "fz13041" -> "d83d108d",
    "fz13047" -> "cbafd576",
    "fz13063" -> "0d980422",
    "fz13066" -> "804ee803",
    "fz13081" -> "8c8362f8",
    "fz13097" -> "b5eac00e",
    "fz13102" -> "236a9b7f",
    "fz13108" -> "c38bb6b4",
    "fz13117" -> "886e30e8",
    "fz13127" -> "ec99f912",
    "fz13149" -> "42ad73e4",
    "fz14001" -> "91422c75",
    "fz14002" -> "18dc9c54",
    "fz14003" -> "07b13a3f",
    "fz14008" -> "d3e10c3f",
    "fz14009" -> "17191cb9",
    "fz14012" -> "fbec5836",
    "fz14015" -> "e275fa86",
    "fz14016" -> "ad262e9d",
    "fz14018" -> "d8e8c3cc",
    "fz14024" -> "d650085e",
    "fz14026" -> "e358ea30",
    "fz14041" -> "f09d97c6",
    "fz14042" -> "430d119c",
    "fz14054" -> "a75ff914",
    "fz14070" -> "c68dac9c",
    "fz14077" -> "74dd6716",
    "fz14080" -> "0803b5a0",
    "fz14082" -> "ec4bc5cf",
    "fz14089" -> "d4007a22",
    "fz14098" -> "d6216116",
    "fz14101" -> "562f48ea",
    "fz14108" -> "8ef84d5a",
    "fz14119" -> "a6351710",
    "fz15002" -> "ecef6a7b",
    "fz15005" -> "585c32de",
    "fz15006" -> "53e0014d",
    "fz15014" -> "512bde47",
    "fz15019" -> "df335c88",
    "fz15020" -> "95f226a7",
    "fz15022" -> "85dbf3b7",
    "fz15023" -> "7d20d332",
    "fz15026" -> "47b7d52d",
    "fz15027" -> "c6fae824",
    "fz15038" -> "caf2de05",
    "fz15042" -> "6b4157d8",
    "fz15044" -> "a005bea6",
    "fz15049" -> "9e523940",
    "fz15051" -> "8753459a",
    "fz15053" -> "ad533d20",
    "fz15060" -> "beb17ed1",
    "fz15079" -> "130dfe86",
    "fz15084" -> "92208e1f",
    "fz15091" -> "7f04bd19",
    "fz15092" -> "6f774923",
    "fz15098" -> "01156975",
    "fz15106" -> "e7e043c7",
    "fz15114" -> "78ffa34e",
    "fz16001" -> "1c53acdc",
    "fz16003" -> "bda5d11d",
    "fz16004" -> "3d8a27c3",
    "fz16009" -> "acd7d9b3",
    "fz16010" -> "f93921fb",
    "fz16013" -> "2613695d",
    "fz16014" -> "c85dce65",
    "fz16016" -> "440c397c",
    "fz16018" -> "b76578b8",
    "fz16019" -> "ed312735",
    "fz16024" -> "e9fe6ee2",
    "fz16026" -> "52829c29",
    "fz16031" -> "cf1e5552",
    "fz16039" -> "55d67ea1",
    "fz16044" -> "ce0f6e0b",
    "fz16046" -> "d78929c5",
    "fz16049" -> "1bd6f7b5",
    "fz16055" -> "1f62a11b",
    "fz16062" -> "0e3fd116",
    "fz16063" -> "f44715e6",
    "fz16081" -> "8bbc9a98",
    "fz16092" -> "f61efbda",
    "fz16106" -> "3dfa5cb6",
    "fz16109" -> "67112fcf",
    "fz16125" -> "8aef5e26",
    "fz16136" -> "7974c37c",
    "fz16165" -> "3f34c982",
    "fz17001" -> "e66a4d84",
    "fz17003" -> "11985765",
    "fz17005" -> "29d63054",
    "fz17008" -> "38469be2",
    "fz17012" -> "eb5172db",
    "fz17015" -> "070df827",
    "fz17019" -> "34c9ae21",
    "fz17023" -> "e38c4c18",
    "fz17025" -> "a5f23af0",
    "fz17028" -> "f19f12e7",
    "fz17040" -> "be0becb9",
    "fz17049" -> "9fc1c81c",
    "fz17054" -> "a3823192",
    "fz17064" -> "c1fad151",
    "fz17066" -> "bddcbcb8",
    "fz17088" -> "3bb094fa",
    "fz17094" -> "9b0c3fd9",
    "fz17096" -> "381ba049",
    "fz17097" -> "b9aa4ba2",
    "fz17105" -> "80ef7da4",
    "fz17129" -> "aa00c1c3",
    "fz17136" -> "76a914e3",
    "fz17138" -> "8b8de109",
    "fz17146" -> "064dea17",
    "fz17160" -> "d6813c67",
    "fz17171" -> "e5241cec",
    "fz17181" -> "b0762eee",
    "fz17183" -> "6adc5d0d",
    "fz17192" -> "27bde5c8",
    "fz18001" -> "b76d8ff8",
    "fz18003" -> "fba45399",
    "fz18007" -> "52b0ee10",
    "fz18008" -> "6604f858",
    "fz18010" -> "889182df",
    "fz18014" -> "f2f2c03d",
    "fz18016" -> "6ba405aa",
    "fz18018" -> "97fa3df2",
    "fz18024" -> "8211fe1f",
    "fz18027" -> "65201803",
    "fz18037" -> "d113f430",
    "fz18046" -> "8edc34dd",
    "fz18053" -> "accd0125",
    "fz18077" -> "a53d9b3a",
    "fz18080" -> "8782241a",
    "fz18086" -> "4e9a2d1b",
    "fz18087" -> "7c4bcb22",
    "fz18092" -> "7d7a451f",
    "fz18096" -> "0391732b",
    "fz18105" -> "427ac02a",
    "fz18107" -> "b9df217c",
    "fz18117" -> "c7105273",
    "fz18140" -> "b626e40d",
    "fz18144" -> "f1eb26ec",
    "fz18151" -> "ed578c32",
    "fz18155" -> "a6015317",
    "fz18162" -> "03bfd9a9",
    "fz18192" -> "c7d27e50",
    "fz18196" -> "10019c41",
    "fz19002" -> "511f72ac",
    "fz19003" -> "68f27959",
    "fz19005" -> "9a9fb10c",
    "fz19011" -> "0d145da6",
    "fz19013" -> "d347c078",
    "fz19015" -> "8594d1cc",
    "fz19016" -> "59c50b95",
    "fz19022" -> "0bd56fcf",
    "fz19024" -> "a69ce31f",
    "fz19028" -> "edaf390e",
    "fz19030" -> "47e7a9f5",
    "fz19034" -> "e2fb054d",
    "fz19036" -> "3aa09448",
    "fz19040" -> "6d616413",
    "fz19043" -> "f9a6b879",
    "fz19057" -> "337dca7a",
    "fz19070" -> "e0cc501d",
    "fz19072" -> "bb0539be",
    "fz19083" -> "3a761d23",
    "fz19093" -> "0bbaa38e",
    "fz19104" -> "1436e366",
    "fz19112" -> "bb724aa1",
    "fz19119" -> "6a33f247",
    "fz19122" -> "939fdba7",
    "fz19133" -> "01a74835",
    "fz19144" -> "2a813d35",
    "fz19195" -> "455f3212",
    "fz19200" -> "5d1ce36f",
    "fz20002" -> "3c118887",
    "fz20004" -> "3da770ae",
    "fz20005" -> "e25fb896",
    "fz20009" -> "f55088c6",
    "fz20011" -> "fba10926",
    "fz20012" -> "93662d8e",
    "fz20013" -> "9e9dbeb1",
    "fz20015" -> "08066cb7",
    "fz20021" -> "5ea876b0",
    "fz20023" -> "c4e9d035",
    "fz20024" -> "6a49af63",
    "fz20025" -> "185ff9f5",
    "fz20028" -> "12ddebbf",
    "fz20030" -> "fd37ff0c",
    "fz20043" -> "b8cf3e98",
    "fz20061" -> "5dfd93bc",
    "fz20065" -> "1518d996",
    "fz20072" -> "670f78f6",
    "fz20079" -> "c5cde4ab",
    "fz20083" -> "4b1bf3f6",
    "fz20094" -> "c8edb3fc",
    "fz20099" -> "ac830b55",
    "fz20101" -> "0778938f",
    "fz20103" -> "c81e8a08",
    "fz20107" -> "4c9f948a",
    "fz20115" -> "cf68ca5f",
    "fz20128" -> "cd2755b5",
    "fz20144" -> "08a63658",
    "fz20181" -> "94a995b5",
    "fz21002" -> "680a96c7",
    "fz21004" -> "7e56b3ed",
    "fz21006" -> "3b98255c",
    "fz21009" -> "15f03a34",
    "fz21011" -> "7605953d",
    "fz21012" -> "23caedba",
    "fz21018" -> "2724557f",
    "fz21020" -> "c3261f91",
    "fz21021" -> "6ebe69c5",
    "fz21025" -> "ade02255",
    "fz21035" -> "973f2aa1",
    "fz21040" -> "ad4e9e2c",
    "fz21041" -> "4f36676a",
    "fz21043" -> "4c697b82",
    "fz21056" -> "6bb7a529",
    "fz21058" -> "8f4f2860",
    "fz21064" -> "5ac58574",
    "fz21074" -> "0e4dd0f9",
    "fz21088" -> "a8520a9d",
    "fz21097" -> "65fe2e9a",
    "fz21115" -> "744b7ef1",
    "fz21122" -> "1b2f409c",
    "fz21128" -> "c5050a52",
    "fz21141" -> "234e0bde",
    "fz21143" -> "257cb045",
    "fz21180" -> "f3137ba3",
    "fz21187" -> "30399d6f",
    "fz21195" -> "736e423e",
    "fz21199" -> "20b6db2c",
    "fz22002" -> "426df622",
    "fz22003" -> "59f76349",
    "fz22004" -> "1b94205a",
    "fz22006" -> "d1074031",
    "fz22008" -> "1cc2fab8",
    "fz22009" -> "b44de449",
    "fz22010" -> "02cc8464",
    "fz22011" -> "c3fa95e4",
    "fz22013" -> "8c4ceddf",
    "fz22016" -> "ef1b8af2",
    "fz22019" -> "8607a173",
    "fz22024" -> "efc08f41",
    "fz22030" -> "48eca95d",
    "fz22049" -> "1660a8b3",
    "fz22068" -> "8fa24708",
    "fz22074" -> "9601995a",
    "fz22078" -> "97b69756",
    "fz22079" -> "286bb1a1",
    "fz22085" -> "c53d7981",
    "fz22097" -> "5028f732",
    "fz22098" -> "df91c272",
    "fz22103" -> "0c61e59e",
    "fz22107" -> "e0ae6cad",
    "fz22108" -> "c67511d0",
    "fz22127" -> "e849bb51",
    "fz22142" -> "fb7b3999",
    "fz22159" -> "15a061ae",
    "fz22170" -> "25b0168e",
    "fz23001" -> "568c5efa",
    "fz23003" -> "dbbca52b",
    "fz23004" -> "1d9c35ae",
    "fz23007" -> "a1da1c4c",
    "fz23008" -> "11fa6730",
    "fz23009" -> "a0f0abb9",
    "fz23011" -> "38841ced",
    "fz23012" -> "75636b8c",
    "fz23014" -> "de305d9c",
    "fz23021" -> "918b2755",
    "fz23022" -> "1a561992",
    "fz23023" -> "9d4b4d0a",
    "fz23033" -> "c76eebda",
    "fz23034" -> "84bd4f80",
    "fz23041" -> "07c56f7f",
    "fz23048" -> "c97abf45",
    "fz23062" -> "0bb3ede9",
    "fz23071" -> "2c676c19",
    "fz23075" -> "eb4910b1",
    "fz23080" -> "17b8210c",
    "fz23113" -> "ce14305b",
    "fz23121" -> "8f75e903",
    "fz23122" -> "1faed1d1",
    "fz23123" -> "5f49d627",
    "fz23136" -> "bf258bdb",
    "fz23147" -> "3f36a1f9",
    "fz23152" -> "c3bebe1d",
    "fz23183" -> "78d107b4",
    "fz23190" -> "f23434e6",
    "fz24001" -> "9baa5b94",
    "fz24002" -> "54d23ef6",
    "fz24003" -> "356636a5",
    "fz24007" -> "f69e88b3",
    "fz24009" -> "4c3dcdfc",
    "fz24012" -> "f166600c",
    "fz24014" -> "cab4617d",
    "fz24018" -> "6f33b15c",
    "fz24026" -> "c270333b",
    "fz24032" -> "81b7e89e",
    "fz24036" -> "6fbdf078",
    "fz24043" -> "0234bf68",
    "fz24050" -> "163d85fd",
    "fz24057" -> "627172a8",
    "fz24068" -> "bc174c6d",
    "fz24079" -> "ac33bf6b",
    "fz24081" -> "3119a134",
    "fz24092" -> "b3359c40",
    "fz24094" -> "4be3e25d",
    "fz24099" -> "1b89a870",
    "fz24104" -> "92245057",
    "fz24106" -> "4f02d2ae",
    "fz24116" -> "6259a300",
    "fz24118" -> "1ec88d5a",
    "fz24122" -> "cab18818",
    "fz24127" -> "73957560",
    "fz24141" -> "839e9888",
    "fz24168" -> "ffe2b293",
    "fz24180" -> "d7348f27",
    "fz25002" -> "fefc81ad",
    "fz25003" -> "8a0d1a47",
    "fz25004" -> "87e7cc61",
    "fz25005" -> "f1664cd6",
    "fz25006" -> "e2982531",
    "fz25009" -> "b47b475b",
    "fz25012" -> "9da475aa",
    "fz25013" -> "710a4c9b",
    "fz25014" -> "5a204e5a",
    "fz25015" -> "0216dc13",
    "fz25020" -> "785540bb",
    "fz25022" -> "80953f50",
    "fz25023" -> "822311e4",
    "fz25029" -> "efedfe81",
    "fz25030" -> "878cf479",
    "fz25031" -> "4e0b086f",
    "fz25035" -> "98630aaa",
    "fz25036" -> "45cf5728",
    "fz25038" -> "3268c510",
    "fz25042" -> "f96ac4b5",
    "fz25043" -> "3169684b",
    "fz25061" -> "bcad9c99",
    "fz25062" -> "e428ad72",
    "fz25069" -> "213981df",
    "fz25094" -> "988e0bf2",
    "fz25108" -> "52ad929c",
    "fz25110" -> "d7e3d19b",
    "fz25126" -> "4daef32b",
    "fz26001" -> "3d3989fc",
    "fz26004" -> "f3bcff7d",
    "fz26005" -> "796d8c31",
    "fz26006" -> "9e7a3044",
    "fz26009" -> "4c679736",
    "fz26011" -> "8a265a3a",
    "fz26012" -> "f1a7dd50",
    "fz26013" -> "3d31d926",
    "fz26018" -> "c1812b15",
    "fz26020" -> "f8b87626",
    "fz26025" -> "cb1d89f9",
    "fz26029" -> "5b46992b",
    "fz26030" -> "70214967",
    "fz26035" -> "908525af",
    "fz26038" -> "812b7f30",
    "fz26041" -> "b5de2bbc",
    "fz26042" -> "b347c7d0",
    "fz26043" -> "1f8dffe2",
    "fz26045" -> "ac38c047",
    "fz26049" -> "5abbcd5e",
    "fz26053" -> "9075a1b1",
    "fz26055" -> "4c679736",
    "fz26061" -> "43dac331",
    "fz26078" -> "069f1519",
    "fz26089" -> "96f7376c",
    "fz26119" -> "e94ebf00",
    "fz26126" -> "6f904310",
    "fz26133" -> "4886904c",
    "fz26144" -> "051f2bfb",
    "fz26197" -> "0a320041",
    "fz27002" -> "59d7f876",
    "fz27004" -> "8f922004",
    "fz27005" -> "3369264e",
    "fz27006" -> "75147f36",
    "fz27008" -> "22d782cf",
    "fz27012" -> "88d18208",
    "fz27015" -> "7b7b8a59",
    "fz27017" -> "2d33da12",
    "fz27021" -> "dfc7d521",
    "fz27023" -> "b1164d06",
    "fz27024" -> "38c93e0a",
    "fz27025" -> "6a18d7dc",
    "fz27026" -> "4c9ed846",
    "fz27029" -> "b550ef0b",
    "fz27030" -> "85a896c2",
    "fz27031" -> "3d5f5659",
    "fz27033" -> "b9c0e437",
    "fz27036" -> "e470b2e4",
    "fz27038" -> "89ffe094",
    "fz27042" -> "79e8163e",
    "fz27046" -> "f056c6fa",
    "fz27061" -> "c2d8192a",
    "fz27062" -> "32fc1236",
    "fz27066" -> "c7705be5",
    "fz27069" -> "01a46fe1",
    "fz27071" -> "96c8465c",
    "fz27094" -> "3c8988e2",
    "fz27114" -> "cf8f4a65",
    "fz27150" -> "834fe749",
    "fz27187" -> "f4ff1080",
    "fz28001" -> "4ff56e96",
    "fz28003" -> "19129e3b",
    "fz28004" -> "4f8f7b48",
    "fz28006" -> "e7d031c7",
    "fz28008" -> "e3139874",
    "fz28009" -> "9793cf9e",
    "fz28010" -> "f9495d1a",
    "fz28013" -> "2a0d5f81",
    "fz28014" -> "1dcb18bb",
    "fz28015" -> "068c7b7e",
    "fz28016" -> "d4b9e1dd",
    "fz28018" -> "d3ca9fd2",
    "fz28019" -> "aa66d70e",
    "fz28020" -> "8699c537",
    "fz28022" -> "72cae031",
    "fz28024" -> "38d483a7",
    "fz28026" -> "21f5a85f",
    "fz28027" -> "813399e5",
    "fz28033" -> "c3838f17",
    "fz28035" -> "7406cf69",
    "fz28039" -> "da9413ff",
    "fz28049" -> "9e2f8d8c",
    "fz28051" -> "055b29c7",
    "fz28052" -> "b68020bc",
    "fz29001" -> "290ebb08",
    "fz29002" -> "a2e13eab",
    "fz29003" -> "aa4c7d02",
    "fz29005" -> "d602ba6b",
    "fz29007" -> "d6c378d3",
    "fz29008" -> "f09195fe",
    "fz29009" -> "535a95e3",
    "fz29010" -> "38841598",
    "fz29019" -> "2c634810",
    "fz29020" -> "1dc96178",
    "fz29022" -> "9c86336e",
    "fz29024" -> "e25abb0a",
    "fz29025" -> "b62d8270",
    "fz29027" -> "6777315b",
    "fz29030" -> "4aeec86c",
    "fz29033" -> "127d3727",
    "fz29037" -> "b2ef8605",
    "fz29038" -> "8f375a2f",
    "fz29040" -> "0a18766c",
    "fz29043" -> "8777ad07",
    "fz29063" -> "2aaedf9e",
    "fz29084" -> "05004a38",
    "fz29087" -> "5cbd487b",
    "fz29102" -> "42825990",
    "fz29106" -> "e00da38f",
    "fz29147" -> "bd7d8171",
    "fz30001" -> "a3331582",
    "fz30003" -> "0704147d",
    "fz30004" -> "478a6e7f",
    "fz30006" -> "1dc25ae6",
    "fz30007" -> "b660d518",
    "fz30008" -> "a002a46b",
    "fz30012" -> "35cce0d5",
    "fz30013" -> "c278dbff",
    "fz30014" -> "e33909f8",
    "fz30015" -> "aa333e90",
    "fz30016" -> "0aea3a13",
    "fz30021" -> "76e851f0",
    "fz30023" -> "2651102f",
    "fz30030" -> "90f727f3",
    "fz30033" -> "dc976645",
    "fz30040" -> "fa056795",
    "fz30042" -> "92cf92ff",
    "fz30046" -> "fa466f03",
    "fz30055" -> "9e0868bb",
    "fz30061" -> "c8de3dbf",
    "fz30065" -> "310a2d28",
    "fz30075" -> "2b78a767",
    "fz30079" -> "e60fad05",
    "fz30099" -> "12804704",
    "fz30129" -> "b20a23af",
    "fz30132" -> "b39677f5",
    "fz31001" -> "2b727101",
    "fz31003" -> "15032477",
    "fz31004" -> "cca7f5ac",
    "fz31006" -> "349940f1",
    "fz31007" -> "35c67890",
    "fz31010" -> "39674e4c",
    "fz31011" -> "a27af9d1",
    "fz31012" -> "8bbcb439",
    "fz31016" -> "106024af",
    "fz31017" -> "0bc0d84f",
    "fz31019" -> "47f6d718",
    "fz31026" -> "667fb420",
    "fz31028" -> "e4ca7a30",
    "fz31030" -> "bf3d2df4",
    "fz31033" -> "c7b1a06a",
    "fz31039" -> "557ffa8d",
    "fz31043" -> "8dbe83d1",
    "fz31044" -> "38a06516",
    "fz31046" -> "ce8b0e55",
    "fz31048" -> "d9c9fe93",
    "fz31055" -> "f61117a6",
    "fz31075" -> "6c3af7b7")
    val defs = graft.queries.FuzzQueries.defs
    assert(defs.map(_.name).toSet == pins.keySet, "declared slice changed")
    defs.foreach { q =>
      assert(graft.tools.FuzzPinGen.sqlHash(q.oracle.get) == pins(q.name),
        s"${q.name}: generated SQL drifted from its pin — generator draws " +
          "moved for a frozen seed")
    }
  }
}
