package graft.queries

import graft.fuzz.FuzzGen

/** The cross-engine slice of the fuzz tier (SURVEY §2.11 FZ): fixed seeds
  * from the FuzzGen grammar declared as ordinary catalog entries, so the
  * DRIVER's DuckDB differential exercises randomly-generated plans — not
  * just the hand-written inventory. FuzzSpec separately checks 120 seeds
  * for DF-API ≡ spark.sql equivalence inside Spark; these ten pin the
  * same grammar against a second engine.
  *
  * The seeds are arbitrary but FROZEN: changing one changes the query and
  * its oracle together (both render from the same draw), so a hash mismatch
  * can only ever mean an engine-semantics divergence, never drift between
  * the two renderings.
  */
object FuzzQueries {

  // Chosen from a scanned seed range for shape diversity AND non-empty
  // results at BOTH sf0.001 and sf0.01 (an empty differential is weak
  // evidence, and the catalog spec requires rows > 0): LEFT + 3-table
  // chains (227, 241), grouped aggregates with sum/count DISTINCT (202,
  // 204, 260), HAVING (212, 227), global agg (215), CASE projection over a
  // join (254), OR + modulo predicates (208), LEFT-join NULL ordering
  // (219), timestamp projection (228). All 12 verified against DuckDB at
  // sf0.01 and sf0.001 before freezing.
  val declaredSeeds: Seq[Int] =
    Seq(202, 204, 206, 208, 212, 215, 219, 227, 228, 241, 254, 260)

  // Grammar-v2 slice (windows + set ops), same selection rules: rank on a
  // lineitem-headed chain (302 — exercises the duplicate-PK remap onto
  // value-deterministic functions), lag over a join (312), dense_rank
  // ordered by a TIED column (317), running sum under LEFT join (327),
  // row_number with a modulo filter (339) and over a join (363),
  // whole-partition sum (343), rank over a 3-table chain (361); UNION ALL
  // (305), EXCEPT (311), INTERSECT (329), INTERSECT on a timestamp column
  // (338). Rendered with query(seed, 2); v1 seeds above stay frozen.
  val declaredSeedsV2: Seq[Int] =
    Seq(302, 305, 311, 312, 317, 327, 329, 338, 339, 343, 361, 363)

  // Grammar-v3 slice (IN/BETWEEN/DISTINCT/avg/DESC), same selection rules:
  // IN + timestamp-BETWEEN projection (401), avg beside IN in a grouped agg
  // (409), all-DESC ordering (412), mixed DESC/ASC group keys (414),
  // IN-inside-OR (422), timestamp BETWEEN + CASE-on-IN projection (426),
  // SELECT DISTINCT + CASE (429), avg over a LEFT 3-table chain (431),
  // global agg over IN + BETWEEN + modulo (432), double-typed BETWEEN with
  // count DISTINCT (454). Rendered with query(seed, 3).
  val declaredSeedsV3: Seq[Int] =
    Seq(401, 409, 412, 414, 422, 426, 429, 431, 432, 454)

  // Grammar-v4 slice (new window functions, multi-key partitions, distinct
  // UNION): last_value over a two-column partition (507), first_value under
  // LEFT join (512), ntile over a 3-table chain (514), UNION-distinct with
  // IN (525) and at projection scale (617), rank on a two-column partition
  // of a lineitem-headed chain (533), lag of a timestamp over a two-column
  // partition (548), running sum over a two-column partition (569),
  // whole-partition sum over a two-column partition (584), lead (620).
  // Rendered with query(seed, 4).
  val declaredSeedsV4: Seq[Int] =
    Seq(507, 512, 514, 525, 533, 548, 569, 584, 617, 620)

  // Grammar-v5 slice (subqueries + derived-table joins), same selection
  // rules (non-empty at sf0.001 AND sf0.01; whole 701-800 and 801-1000
  // ranges verified against DuckDB at both SFs before freezing). IN
  // subquery: grouped with BETWEEN (716), projection (753), avg beside IN
  // (795); correlated EXISTS: grouped (705), projection at LIMIT scale
  // (723), modulo outer filter (793); NOT EXISTS (anti): grouped (712),
  // projection (748), count-DISTINCT grouped (768); scalar subquery:
  // avg-scalar under a grouped outer (728), max-scalar projection (747),
  // min-scalar with a genuinely selective predicate — keeps ~9% of lineitem
  // at sf0.001 (914; replaced 784, whose max-scalar comparison was
  // vacuously true — ADVICE r8); derived-table join: nation→region dim
  // (711), customer→nation with two aggregates (734), HAVING inside the
  // derived table (772), sum + count over supplier→nation (797). Rendered
  // with query(seed, 5).
  val declaredSeedsV5: Seq[Int] =
    Seq(705, 711, 712, 716, 723, 728, 734, 747, 748, 753, 768, 772,
      793, 795, 797, 914)

  // Grammar-v6 slice (events table — the differential cover the r9 ts
  // re-encode regression showed was missing). Whole 1-200 range verified
  // against DuckDB at sf0.001 AND sf0.01 (200/200 pass both, r10); frozen
  // picks are events-bearing and non-empty at both SFs. Windows over
  // events: lag(ts) through a window fn (147), rank ORDER BY ts (66),
  // row_number under BETWEEN+IN (19), ntile beside ts+props preds (91),
  // last_value(props) (73), running sum under a ts pred (165),
  // whole-partition sum under a selective value pred (39). Grouped: the
  // canonical count-by-type (35), ts-BETWEEN + DISTINCT + props multi-agg
  // (40), count(DISTINCT props) + HAVING (46), user_id IN + ts + HAVING
  // (121), LIKE + min (69), late-ts + value filter (197). Global: ts
  // BETWEEN + count/min/avg (87), max(ts) (132), DISTINCT props under
  // double IN (180). Projections: selective props equality (13), DISTINCT
  // over ts+props (101), OR-of-BETWEEN/IN + ts BETWEEN (141), props cmp +
  // ts CASE (94). Rendered with query(seed, 6).
  val declaredSeedsV6: Seq[Int] =
    Seq(13, 19, 35, 39, 40, 46, 66, 69, 73, 87, 91, 94, 101, 121, 132,
      141, 147, 165, 180, 197)

  // Grammar-v7 slice (documents table — completes per-table fuzz cover:
  // every scalar-typed corpus table is now drawn by some grammar version).
  // Whole 1-200 range verified against DuckDB at sf0.001 AND sf0.01
  // (200/200 pass both, r10); picks are documents-bearing, non-empty at
  // both SFs, and DISJOINT from declaredSeedsV6's seed numbers (fz names
  // collide otherwise). Windows: text BETWEEN pred under last_value (1,
  // 14), src+nchars partitions (109), LIKE+BETWEEN multi-pred (127),
  // selective text+IN (131), 3-row selective partition (100), BETWEEN over
  // lang+nchars (192). Grouped: LIKE by source (10), text+HAVING (102,
  // 143), count-DISTINCT text (159), 3-agg DISTINCT (163). Global: 4-col
  // multi-agg (111), DISTINCT text (150), IN+nchars (174). Projections:
  // all-features (114), LIKE+IN+BETWEEN+DISTINCT (134), text+IN+nchars
  // (153), LIKE+DISTINCT (16), text BETWEEN (190). Rendered query(seed, 7).
  val declaredSeedsV7: Seq[Int] =
    Seq(1, 10, 14, 16, 100, 102, 109, 111, 114, 127, 131, 134, 143, 150,
      153, 159, 163, 174, 190, 192)

  // Grammar-v8 slice (set-ops + self-scalar subqueries over events/
  // documents — the shapes the v6/v7 body+window dispatch can't reach).
  // Whole 1-200 range verified against DuckDB at sf0.001 AND sf0.01
  // (200/200 both, r10); picks non-empty at both SFs, disjoint from every
  // older slice's seed numbers. Set-ops — events: INTERSECT (107), EXCEPT
  // (117), UNION ALL (124), UNION distinct (157); documents: INTERSECT
  // (105), EXCEPT (119), UNION ALL (123), small-side EXCEPT (144).
  // Self-scalar — events: max proj (118), min grouped (129), avg proj
  // keeping 8/1000 (136), min grouped keeping 3/1000 (167), avg grouped
  // (177); documents: min proj (112), max grouped (152), min proj keeping
  // 4/500 (148). Rendered with query(seed, 8).
  val declaredSeedsV8: Seq[Int] =
    Seq(105, 107, 112, 117, 118, 119, 123, 124, 129, 136, 144, 148, 152,
      157, 167, 177)

  // Grammar-v9 slice (the events⋈customer cross-family edge — until v9 no
  // generated query joined an analytics table to a TPC-H dim). Whole
  // 1001-1200 range verified against DuckDB at sf0.001 AND sf0.01 (200/200
  // pass both, r10); picks non-empty at both SFs, and the 1001+ seed range
  // is disjoint from every older slice by construction. Body joins:
  // LEFT + LIKE projection (1007), grouped ts-BETWEEN + modulo (1014),
  // selective grouped (1092), global count/avg over the join (1045);
  // three-way with nation: LEFT grouped min(ts) (1018), sum by n_name
  // (1026). Windows over the join: running sum (1001), first_value (1030),
  // two-column-partition ntile (1036), dense_rank ORDER BY a tied dim
  // column (1065), last_value of c_acctbal under a selective pred (1082),
  // lead over a two-column partition (1087). Subqueries through the edge:
  // grouped EXISTS (1086), grouped NOT EXISTS + sum (1005), scalar
  // projection (1077), selective scalar (1089). Derived-table (per-user
  // event aggregates ⋈ customer): two aggregates (1011), HAVING + max props
  // (1017), HAVING count > 2 (1052). Rendered with query(seed, 9).
  val declaredSeedsV9: Seq[Int] =
    Seq(1001, 1005, 1007, 1011, 1014, 1017, 1018, 1026, 1030, 1036, 1045,
      1052, 1065, 1077, 1082, 1086, 1087, 1089, 1092)

  // Grammar-v10 slice (compositional shapes: conditional aggregates,
  // set-ops over joined projections, aggregate-of-aggregate). Whole
  // 2001-2200 range verified against DuckDB at sf0.001 AND sf0.01 (200/200
  // pass both, r10); picks non-empty at both SFs, seed range 2001+ disjoint
  // from every older slice by construction. Conditional aggregates:
  // multi-guard min/max over part (2015, 2042), CASE-count + guarded max
  // over a lineitem join (2017), three-table orders⋈customer⋈nation (2030),
  // dual CASE-counts by region (2035), guarded min/max over supplier⋈nation
  // (2040 dropped: ties 2040's shape with 2030 — 2055 orders⋈customer and
  // the events-edge guards 2050/2053/2060 taken instead). Set-ops over
  // joins: UNION ALL orders⋈customer (2003), LEFT nation⋈region (2008),
  // EXCEPT lineitem⋈orders (2039), UNION ALL over the v9 events⋈customer
  // edge (2046), INTERSECT orders⋈customer (2054). Aggregate-of-aggregate:
  // modulo-grouped over supplier (2001), lineitem per-order (2025),
  // orders-per-customer (2037), lineitem-per-supplier (2052); global
  // summaries (2014, 2016). Rendered with query(seed, 10).
  val declaredSeedsV10: Seq[Int] =
    Seq(2001, 2003, 2008, 2014, 2015, 2016, 2017, 2025, 2030, 2035, 2037,
      2039, 2042, 2046, 2050, 2052, 2053, 2054, 2055, 2060)

  // Grammar-v11 slice (grouping sets, LEFT joins that actually miss, top-N
  // groups — the NULL/multi-level-grouping shapes no older mode draws).
  // Whole 3001-3200 range verified against DuckDB at sf0.001 AND sf0.01
  // (200/200 pass both, r10 — after the soak surfaced Spark-vs-DuckDB
  // empty-input grand-total divergence now guarded by HAVING count(*) > 0);
  // picks non-empty at both SFs, seed range 3001+ disjoint from every older
  // slice by construction. ROLLUP: supplier⋈nation dim keys (3018),
  // max(double) over lineitem⋈supplier (3021), three-table LEFT chain with
  // min-string (3037), orders under a selective price pred (3059). CUBE:
  // sum+max multi-agg over lineitem (3003), count-DISTINCT under LEFT join
  // (3012), count(col)+min over customer (3060), small dims (3069).
  // IS NULL anti: lineitem⋈orders with LIKE in the ON (3005),
  // supplier⋈nation (3020), the events⋈customer edge (3051). COALESCE
  // repair + matched flag: customer⋈nation (3007), lineitem⋈part with a ts
  // output column (3011), events⋈customer (3027). Matched-flag GROUP BY:
  // contradictory ON preds = all-miss (3009), supplier⋈nation (3016),
  // min-string agg (3045). Top-N groups: sum-ordered (3002), avg-ordered
  // two-key (3013), two aggregates under IN (3025), two-key over a join
  // (3036). Rendered with query(seed, 11).
  val declaredSeedsV11: Seq[Int] =
    Seq(3002, 3003, 3005, 3007, 3009, 3011, 3012, 3013, 3016, 3018, 3020,
      3021, 3025, 3027, 3036, 3037, 3045, 3051, 3059, 3060, 3069)

  // Grammar-v12 slice (FULL OUTER joins, bag-semantics set ops,
  // aggregate⋈aggregate cohort joins). Whole 4001-4200 range verified
  // against DuckDB at sf0.001 AND sf0.01 (200/200 pass both, r10, zero
  // divergence first sweep); picks non-empty at both SFs, seed range 4001+
  // disjoint from every older slice by construction. FULL OUTER projection
  // (COALESCE'd key + source tag — all picks carry ALL THREE tags
  // both/fact/dim at sf0.001, so both NULL-extension directions are in the
  // differential): supplier⋈nation (4001), lineitem⋈orders (4014), the
  // events⋈customer edge (4032), orders⋈customer (4034). FULL OUTER
  // grouped by tag: sum (4005), min (4007), avg (4012), events⋈customer
  // count-DISTINCT multi-agg (4023). INTERSECT ALL: supplier (4002),
  // events with ts output (4009), lineitem doubles (4015). EXCEPT ALL:
  // lineitem (4011), documents long-text (4021), region small-side (4036).
  // Agg⋈agg cohorts: lineitem-by-partkey min (4004), orders-by-custkey max
  // (4025), customer-vs-supplier on the shared nation key (4035, 4046,
  // 4058), min-double measure (4040). Rendered with query(seed, 12).
  val declaredSeedsV12: Seq[Int] =
    Seq(4001, 4002, 4004, 4005, 4007, 4009, 4011, 4012, 4014, 4015, 4021,
      4023, 4025, 4032, 4034, 4035, 4036, 4040, 4046, 4058)

  // Grammar-v13 slice (scalar-expression semantics: computed projections,
  // bounded sliding window frames, CASE group keys). Whole 5001-5200 range
  // verified against DuckDB at sf0.001 AND sf0.01 (200/200 pass both, r10,
  // zero divergence first sweep); picks non-empty at both SFs, seed range
  // 5001+ disjoint from every older slice by construction. Computed
  // projections: day + BIGINT-add over orders (5017), upper + doubling
  // over events (5023), substr + add over nation (5025), substr + day over
  // a lineitem chain (5038), upper + year (5050), length + add (5008),
  // substr + doubling over part (5057). Sliding frames (ROWS BETWEEN k
  // PRECEDING AND CURRENT ROW on unique-key order): sum over customer
  // (5029), events (5031), documents (5041); min over orders (5018); max
  // over part (5074); count over events (5016) and supplier (5006). CASE
  // group keys: max+count supplier (5003), min events (5020), sum+min
  // nation (5035), min+count lineitem (5042), count documents (5060), sum
  // lineitem (5045). Rendered with query(seed, 13).
  val declaredSeedsV13: Seq[Int] =
    Seq(5003, 5006, 5008, 5016, 5017, 5018, 5020, 5023, 5025, 5029, 5031,
      5035, 5038, 5041, 5042, 5045, 5050, 5057, 5060, 5074)

  // Grammar-v14 slice (correlated scalar subqueries, non-count HAVING,
  // three-branch UNION ALL). Whole 6001-6200 range verified against DuckDB
  // at sf0.001 AND sf0.01 (200/200 pass both, r10, zero divergence first
  // sweep); picks non-empty at both SFs, seed range 6001+ disjoint from
  // every older slice by construction. Correlated scalar in the PROJECTION
  // (NULL where no inner row qualifies — both engines must decorrelate;
  // the DF side is the decorrelated LEFT-join-on-per-key-aggregate):
  // max (6005), min (6007), max over orders⋈customer (6014), avg (6016),
  // min (6034), avg (6047). Correlated scalar in WHERE (NULL comparison
  // drops the row): avg over lineitem (6001), min filtering events through
  // customer (6012), min (6022), max (6032), max over events (6041), avg
  // (6043). HAVING over max/min aggregates: lineitem (6002, 6042),
  // supplier (6009), part (6049). Three-branch UNION ALL: part (6004),
  // events (6013), documents (6015), customer (6017). Rendered with
  // query(seed, 14).
  val declaredSeedsV14: Seq[Int] =
    Seq(6001, 6002, 6004, 6005, 6007, 6009, 6012, 6013, 6014, 6015, 6016,
      6017, 6022, 6032, 6034, 6041, 6042, 6043, 6047, 6049)

  // Grammar-v15 slice (window-over-aggregate, OFFSET pagination, NULLIF /
  // IS DISTINCT FROM scalars). Whole 7001-7200 range verified against
  // DuckDB at sf0.001 AND sf0.01 (200/200 pass both, r10, zero divergence
  // first sweep); picks non-empty at both SFs, seed range 7001+ disjoint
  // from every older slice by construction. Window-over-aggregate (rank
  // the groups by their measure inside the grouped SELECT): dense_rank
  // (7007, 7011, 7016), rank (7027, 7028, 7042), row_number (7005, 7009).
  // OFFSET under a total ORDER BY: 7002, 7010, 7015, 7019, 7020, 7029.
  // NULLIF + IS DISTINCT FROM projections: 7004, 7017, 7023, 7024, 7033,
  // 7035. Rendered with query(seed, 15).
  val declaredSeedsV15: Seq[Int] =
    Seq(7002, 7004, 7005, 7007, 7009, 7010, 7011, 7015, 7016, 7017, 7019,
      7020, 7023, 7024, 7027, 7028, 7029, 7033, 7035, 7042)

  // Grammar-v16 slice (the embeddings table — the last corpus table with
  // zero generated coverage; each seed derives integer-exact array/HOF
  // scalars and is rendered THREE ways: DF-API, Spark-dialect SQL, and
  // DuckDB-dialect SQL — see FuzzGen.drawEmbOverride). Whole 8001-8200
  // range verified against DuckDB at sf0.001 AND sf0.01 (200/200 pass
  // both, r11, zero divergence first sweep); picks emb-bearing, non-empty
  // at both SFs, seed range 8001+ disjoint from every older slice by
  // construction. Windows over the derived view: rank+dense_rank by
  // positive-count (8001), last_value under a fold BETWEEN pred (8003),
  // first_value of the head sum (8008), per-label sum of folds (8014),
  // lag (8020), lead at 26-row selectivity (8091), rank+dense_rank
  // selective (8125), lag of the squared fold (8142), ntile (8188).
  // Grouped: max fold + count-DISTINCT element (8002), sum of squared
  // folds (8016), avg under a squared-fold pred — 2 groups survive
  // (8088), count-DISTINCT + head-sum pred (8098), avg by label (8124),
  // sum at 2-row selectivity (8174). Projections: all-three derived cols
  // (8018), fold BETWEEN + CASE (8025), IN + CASE 3-row selective (8081),
  // SELECT DISTINCT over four derived cols (8107), modulo over folds
  // (8130), DISTINCT + modulo (8144). Global: sum + count-DISTINCT fold
  // (8126), avg of squared fold + positive count (8170). Rendered with
  // query(seed, 16).
  val declaredSeedsV16: Seq[Int] =
    Seq(8001, 8002, 8003, 8008, 8014, 8016, 8018, 8020, 8025, 8081, 8088,
      8091, 8098, 8107, 8124, 8125, 8126, 8130, 8142, 8144, 8170, 8174,
      8188)

  // Grammar-v17 slice (NULL-injection: a deterministic nullable derived
  // view — CASE WHEN (pk % m) = r THEN NULL — under dedicated
  // NULL-semantics predicates, the shared body, and the window generator;
  // the round-11 verdict's top coverage asymmetry, since base-table columns
  // are never NULL). Whole 9001-9200 range verified against DuckDB at
  // sf0.001, sf0.01 AND sf0.1 (200/200 pass at each, r12, zero divergence
  // first sweep); picks non-empty at sf0.001 and sf0.01, seed range 9001+
  // disjoint from every older slice by construction. NOT IN over the
  // nullable column — the all-rows-vanish trap (9019 orders, 9027 part,
  // 9037 documents with BOTH text+n_chars NULLed, 9050 two-victim
  // customer). IN-lists containing NULL (9023 orders, 9028 documents,
  // 9073 events with user_id+props NULLed). IS [NOT] DISTINCT FROM (9010
  // events, 9032 documents, 9063 orders). IS [NOT] NULL filters (9014
  // events props, 9034 customer, 9039 part two-victim). NULL-skipping
  // aggregate contrast count(*)/count(c)/count(DISTINCT c)/sum|min/max
  // (9003 part, 9013 supplier doubles, 9040 documents text, 9085 global
  // sum over nullable int). Shared body over the nullable view: CASE proj
  // (9002), grouped with NULL group keys (9025 two-key documents, 9041
  // customer, 9054 sum+avg over ints), DESC NULLS LAST projection (9113).
  // Windows over the nullable view: ntile (9006), rank ORDER BY a NULLed
  // value column (9011), lag over a NULL-bearing partition column (9029),
  // first_value (9056), whole-partition sum of a NULLed int (9134).
  // Rendered with query(seed, 17).
  val declaredSeedsV17: Seq[Int] =
    Seq(9002, 9003, 9006, 9010, 9011, 9013, 9014, 9019, 9023, 9025, 9027,
      9028, 9029, 9032, 9034, 9037, 9039, 9040, 9041, 9050, 9054, 9056,
      9063, 9073, 9085, 9113, 9134)

  // Grammar-v18 slice (NULL JOIN KEYS — the semantics v17's single-table
  // victims cannot reach: a NULL key matches nothing under `=`, while
  // IS NOT DISTINCT FROM makes NULL meet NULL). Whole 10001-10200 range
  // verified against DuckDB at sf0.001, sf0.01 AND sf0.1 (200/200 pass at
  // each, r12, zero divergence first sweep); picks non-empty at sf0.001
  // and sf0.01 EXCEPT fz10012 — the deliberate subquery-level
  // all-rows-vanish pin (`o_custkey NOT IN (SELECT <NULL-poisoned pk>
  // FROM customer)` with no dim predicate: the subquery always contains a
  // NULL, so both engines must return ZERO rows forever); seed range
  // 10001+ disjoint from every older slice by construction.
  // Injected-FK windows: first_value over orders⋈customer (10001),
  // row_number partitioned by a LEFT-missed n_name (10014), supplier
  // first_value (10027), dense_rank PARTITIONED BY the NULL-injected
  // user_id itself — the NULL partition group (10037), running sum over a
  // 2-key dim partition (10054), orders row_number by c_mktsegment
  // (10064). Injected-FK body: INNER proj losing the 1-in-m NULL-key rows
  // (10010, 10013 with a modulo computed column), SELECT DISTINCT over
  // dim-extended columns (10066), grouped with the NULLed key in the
  // group keys (10028 events 2-key, 10035 count-DISTINCT, 10069, 10071
  // count of the nullable user_id), global LEFT-join aggregate contrast
  // count(value) vs count(c_acctbal) (10008) and NULL-skipping
  // sum/min/count (10040, 10048). NULL-poisoned membership subqueries:
  // the vanish pin (10012), the dim-predicate-saved NOT IN that keeps 135
  // rows (10043), plain IN dropping only the NULL-fk rows (10031 supplier,
  // 10034 events, 10068 orders). Null-safe joins (both sides injected, ON
  // fk IS NOT DISTINCT FROM pkx, plan-pinned hash join): grouped by dim
  // payload (10002, 10049), by the NULLABLE key itself — one NULL group
  // (10011, 10029), and global with the count(*)/count(pkx) contrast
  // (10047). Rendered with query(seed, 18).
  val declaredSeedsV18: Seq[Int] =
    Seq(10001, 10002, 10008, 10010, 10011, 10012, 10013, 10014, 10027,
      10028, 10029, 10031, 10034, 10035, 10037, 10040, 10043, 10047,
      10048, 10049, 10054, 10064, 10066, 10068, 10069, 10071)

  // Grammar-v19 slice (the EXISTS-vs-IN quantifier contrast over a
  // NULL-injected FK: correlated [NOT] EXISTS is two-valued — a NULL key
  // never correlates, so NOT EXISTS KEEPS the NULL-key rows — while
  // uncorrelated [NOT] IN is three-valued and drops them; the classic
  // anti-join-vs-NOT-IN migration trap, frozen as a differential). Whole
  // 11001-11200 range verified against DuckDB at sf0.001, sf0.01 AND
  // sf0.1 (200/200 pass at each, r12, zero divergence first sweep); picks
  // non-empty at sf0.001 and sf0.01, seed range 11001+ disjoint from
  // every older slice by construction. NOT EXISTS keeping genuine NULL-fk
  // survivors through the ORDER BY (11015 — ALL 250 sf0.01 survivors are
  // the NULL-key rows, 11024, 11048, 11054, 11063) + the count contrast
  // count(*) > count(fk) (11007, 11041). EXISTS (11003, 11004, 11009,
  // 11038) + contrast (11043). IN dropping only NULL-fk rows (11005,
  // 11014, 11039) + contrast (11045). NOT IN with a clean dim subquery —
  // drops the NULL-fk rows a NOT EXISTS would keep (11011, 11021, 11051)
  // + contrast (11023). Rendered with query(seed, 19).
  val declaredSeedsV19: Seq[Int] =
    Seq(11003, 11004, 11005, 11007, 11009, 11011, 11014, 11015, 11021,
      11023, 11024, 11038, 11039, 11041, 11043, 11045, 11048, 11051,
      11054, 11063)

  // Grammar-v20 slice (the two NULL species collide: ROLLUP/CUBE over a
  // NULL-INJECTED group key, where k IS NULL for two different reasons —
  // the genuine NULL group aggregating the injected rows, and the
  // super-aggregate rows the engine pins to NULL — distinguishable ONLY
  // by the GROUPING() flag; both species verified PRESENT side-by-side in
  // every pick below at sf0.01 except noted). Whole 12001-12200 range
  // verified against DuckDB at sf0.001, sf0.01 AND sf0.1 (200/200 pass at
  // each, r12, zero divergence first sweep); picks non-empty at sf0.001
  // and sf0.01, seed range 12001+ disjoint from every older slice by
  // construction. Single-key ROLLUP — one real-NULL-group row beside the
  // grand total (12005 sum over the victim itself, 12009, 12014, 12017,
  // 12027, 12034, 12048 orders, 12057). Two-key ROLLUP with the victim
  // first — per-(NULL,k1) sub-rows (12002 events 151 real-NULL rows,
  // 12019, 12023 26 real-NULL rows, 12042, 12054). CUBE — the victim
  // NULLed in every grouping-set combination (12003 events 142+151,
  // 12007, 12018, 12032, 12055). Rendered with query(seed, 20).
  val declaredSeedsV20: Seq[Int] =
    Seq(12002, 12003, 12005, 12007, 12009, 12014, 12017, 12018, 12019,
      12023, 12027, 12032, 12034, 12042, 12048, 12054, 12055, 12057)

  // Grammar-v21 slice (RANGE-valued window frames — value-distance frames
  // over NON-unique integer orderings, where ties form real peer groups
  // and the result stays deterministic because the frame depends on the
  // ORDER VALUE, not the peer order; every older frame mode is ROWS-based
  // over the unique head key for exactly that reason). Whole 13001-13200
  // range verified against DuckDB at sf0.001, sf0.01 AND sf0.1 (200/200
  // pass at each, r12, zero divergence first sweep); picks non-empty at
  // sf0.001 and sf0.01, seed range 13001+ disjoint from every older slice
  // by construction. Bounded-preceding: 1-PRECEDING max-string DESC over
  // customer (13004), lineitem-headed min(ts) ordered by the non-unique
  // l_suppkey — the head the order-sensitive modes must exclude, legal
  // here (13007), adjacent-nationkey sum k=1 (13012), events⋈customer
  // min(ts) at 20000-offset (13006). Both-sides: lineitem min(quantity)
  // by suppkey (13011), 3-chain supplier partitioned by r_name (13016),
  // orders⋈customer⋈nation sum (13102), documents count over doc_id ±1000
  // (13149). Bounded-following: part running-ahead sum at value-gap 1
  // (13002), DESC min over part (13005), customer ordered by the
  // 25-value c_nationkey — maximal peer groups (13024), selective
  // lineitem⋈part count (13041), lineitem max ordered by the duplicated
  // l_orderkey (13097), per-user event sum at 1000-following (13108),
  // documents sum over tied n_chars (13127). Default frame (bare ORDER
  // BY = the standard's RANGE UNBOUNDED..CURRENT with peers INCLUDED —
  // the DF side spells it explicitly, pinning both engines' implicit
  // frame): nation⋈region DESC count (13022), events⋈customer max by
  // tied user_id (13029), customer⋈nation min-string (13047), modulo-
  // filtered part (13063), events LEFT customer min over NULL-extended
  // dim strings (13066), selective lineitem⋈part DESC count (13081),
  // customer LEFT nation DESC sum (13117). DESC frame direction: 13004,
  // 13005, 13022, 13036 (20000-FOLLOWING events sum), 13081, 13117.
  // Rendered with query(seed, 21).
  val declaredSeedsV21: Seq[Int] =
    Seq(13002, 13004, 13005, 13006, 13007, 13011, 13012, 13016, 13022,
      13024, 13029, 13036, 13041, 13047, 13063, 13066, 13081, 13097,
      13102, 13108, 13117, 13127, 13149)

  // Grammar-v22 slice (temporal semantics: date_trunc group/window keys,
  // EXTRACT field projections, ± INTERVAL shifts — the calendar arithmetic
  // no older mode computes; every seed also pins the portability rules the
  // grammar is built on: CAST(date_trunc AS TIMESTAMP) against DuckDB's
  // DATE return type for day-and-coarser units, CAST(EXTRACT AS BIGINT),
  // shared unquoted `INTERVAL k unit`, identical month-end clamping).
  // Whole 14001-14200 range verified against DuckDB at sf0.001, sf0.01 AND
  // sf0.1 (200/200 pass at each, r12, zero divergence first sweep); picks
  // non-empty at sf0.001 and sf0.01, seed range 14001+ disjoint from every
  // older slice by construction. Calendar-bucket GROUP BY: month×flag over
  // a lineitem join (14002), quarter×type over events (14003), year with a
  // LEFT-joined dim key + count DISTINCT (14012), week min over a join
  // (14024), quarter under LEFT join (14041), hour — orders carry real
  // time components, 2399 sf0.01 buckets (14080), day×status avg (14082).
  // EXTRACT projections: MONTH + YYYYMM under a day-band pred (14008),
  // MINUTE over events (14015), YEAR beside YYYYMM (14026), MINUTE over
  // lineitem with a day-band (14054), YEAR/YYYYMM over filtered events
  // (14070). INTERVAL shifts: +26 MONTH over a lineitem join — the
  // clamping path (14001), -15 HOUR over orders (14016), +12 HOUR over
  // events under a shifted comparison (14018), +22 MONTH under LEFT join
  // (14077), +6 HOUR at 2-row selectivity (14089), -2 HOUR with a shifted
  // BETWEEN (14101). Windows PARTITIONED BY the calendar bucket: rank by
  // value within week (14009), row_number within quarter (14042) and year
  // (14098), whole-partition sum within day (14108), rank within quarter
  // over events (14119). Rendered with query(seed, 22).
  val declaredSeedsV22: Seq[Int] =
    Seq(14001, 14002, 14003, 14008, 14009, 14012, 14015, 14016, 14018,
      14024, 14026, 14041, 14042, 14054, 14070, 14077, 14080, 14082,
      14089, 14098, 14101, 14108, 14119)

  // Grammar-v23 slice (string scalars beyond v13's upper/substr/length:
  // computed projections with corpus-profiled search literals, split_part
  // as a computed GROUP BY key, instr/length integer arithmetic — each
  // seed pins shared 1-based/0-when-absent/empty-when-out-of-range/
  // truncate-when-longer/NULL-propagating semantics across the engines).
  // Whole 15001-15200 range verified against DuckDB at sf0.001, sf0.01
  // AND sf0.1 (200/200 pass at each, r12, zero divergence first sweep);
  // picks non-empty at sf0.001 and sf0.01, seed range 15001+ disjoint
  // from every older slice by construction. Projections: reverse (15014),
  // lpad truncate-when-longer over lineitem (15019) and pad-when-shorter
  // over customer (15022), right (15023), left over nation (15049) and
  // JSON-shaped props (15060), replace hitting a full c_name under a join
  // (15092) and an event_type under preds (15098). split_part keys:
  // dim name by ' ' through the events⋈customer edge (15002), no-space
  // inputs collapsing to one part-1 group (15026 part-3 → '', 15027,
  // 15044 under LEFT join, 15102-like shapes dropped as duplicates),
  // o_orderpriority by '#' — separator absent, whole-string key (15051),
  // s_name by ' ' → 10-then-25 real groups (15084), props by '-' (15091,
  // 15106 part-4 under IS NOT NULL). instr/length arithmetic: source hit
  // at varying positions over documents (15005), full-string match over
  // part types (15006), JSON props literal (15020), single-char flags
  // (15038, 15053), dim-side name through a join (15079), miss→0 pins
  // (15042 instr=0 band, 15114). Rendered with query(seed, 23).
  val declaredSeedsV23: Seq[Int] =
    Seq(15002, 15005, 15006, 15014, 15019, 15020, 15022, 15023, 15026,
      15027, 15038, 15042, 15044, 15049, 15051, 15053, 15060, 15079,
      15084, 15091, 15092, 15098, 15106, 15114)

  // Grammar-v24 slice (TWO-SIDED NULL-injection — fact FK AND dim PK both
  // carry injected NULLs, the r12 verdict's remaining three-valued blind
  // corner: an injected dim PK orphans its fact children — dropped by
  // INNER, NULL-extended by LEFT — while NULL never meets NULL; optional
  // extra victims make a fact AGGREGATE INPUT and a dim GROUP KEY
  // nullable too). Whole 16001-16200 range verified against DuckDB at
  // sf0.001, sf0.01 AND sf0.1 (200/200 pass at each, r13, zero divergence
  // first sweep); picks non-empty at sf0.001 and sf0.01, all verified
  // genuine dual-injection draws (not v22/v23 fall-throughs), seed range
  // 16001+ disjoint from every older slice by construction. Every shape ×
  // join kind × all four FK edges covered: ROLLUP + GROUPING() flag over
  // a dim key with genAgg over both sides — INNER (16016 customer⋈nation,
  // 16001 events⋈customer, 16009 orders⋈customer, 16055 supplier⋈nation)
  // and LEFT (16044, 16026, 16106, 16092 same edges, super-aggregate NULL
  // vs injected NULL vs LEFT-miss NULL in one output); windows
  // partitioned by the NULL-bearing dim payload ordered by the
  // never-injected fact head key — row_number (16024, 16109 inner; 16003,
  // 16165 left), running sum CAST BIGINT over a possibly-injected fact
  // int (16010, 16046 inner; 16049, 16125 left), lag (16031, 16063 inner;
  // 16013, 16136, 16081 left — 16081's events row count SHRINKS sf0.001→
  // sf0.01, 210→201, a predicate-selectivity artifact worth pinning);
  // projections with the orphan classifier CASE WHEN fk IS NULL / pk IS
  // NULL (16018, 16019, 16062 inner; 16014, 16004, 16039 left). Rendered
  // with query(seed, 24).
  val declaredSeedsV24: Seq[Int] =
    Seq(16001, 16003, 16004, 16009, 16010, 16013, 16014, 16016, 16018,
      16019, 16024, 16026, 16031, 16039, 16044, 16046, 16049, 16055,
      16062, 16063, 16081, 16092, 16106, 16109, 16125, 16136, 16165)

  // Grammar-v25 slice (explicit GROUPING SETS + multi-DISTINCT aggregates
  // + FILTER clause — the grouping surfaces ROLLUP/CUBE can't express:
  // set lists that skip lattice levels, and aggregate plans with several
  // DISTINCT argument columns, which Spark executes via Expand). Whole
  // 17001-17200 range verified against DuckDB at sf0.001, sf0.01 AND
  // sf0.1 (200/200 pass at each, r13, zero divergence first sweep); picks
  // non-empty at sf0.001 and sf0.01, all genuine v25 draws (not
  // fall-throughs), seed range 17001+ disjoint from every older slice by
  // construction. GROUPING SETS: disjoint single-key sets over documents
  // (17008), LEFT + grand-total-only-beside-full-set over events⋈customer
  // (17012), asymmetric 3-key lattice skip (17023 customer⋈nation⋈region),
  // LEFT 4-set with () (17025, 17040), two overlapping 2-key sets +
  // sum(DISTINCT) (17049), 3-key region/nation (17064), (p_brand,
  // l_linenumber) beside () (17105), (p_brand) vs (p_size, p_brand) at
  // 1013-row sf0.01 scale (17129), events 4-set full lattice + two
  // distinct aggs (17136), LEFT + () + sum(DISTINCT) (17160), lineitem
  // 4-set + sum(DISTINCT) (17181). Multi-DISTINCT (the Expand plan):
  // 4-distinct with sum(DISTINCT) (17003, 17088, 17138), 3-distinct
  // (17015, 17028), global 3-distinct one-row (17019), single-distinct at
  // 357 output groups (17096), LEFT 3-distinct + sum(DISTINCT) (17171),
  // 4-distinct growing 15→150 groups across SFs (17192). FILTER clause:
  // count(*)/count(DISTINCT)/sum each FILTERed beside unfiltered
  // contrasts (17001, 17097, 17146), under LEFT join (17005, 17094),
  // sum(DISTINCT …) FILTER (17054, 17066, 17183). Rendered with
  // query(seed, 25).
  val declaredSeedsV25: Seq[Int] =
    Seq(17001, 17003, 17005, 17008, 17012, 17015, 17019, 17023, 17025,
      17028, 17040, 17049, 17054, 17064, 17066, 17088, 17094, 17096,
      17097, 17105, 17129, 17136, 17138, 17146, 17160, 17171, 17181,
      17183, 17192)

  // Grammar-v26 slice (extended window family: percent_rank / cume_dist
  // over genuinely TIED orderings — results depend only on the order
  // VALUE, one exact IEEE division — and nth_value ordered by the unique
  // head key under three frames; every OVER() pins ASC NULLS FIRST, the
  // Spark-vs-DuckDB default-null-order divergence). Whole 18001-18200
  // range verified against DuckDB at sf0.001, sf0.01 AND sf0.1 (200/200
  // pass at each, r13, zero divergence first sweep); picks non-empty at
  // sf0.001 and sf0.01, all genuine v26 draws, seed range 18001+ disjoint
  // from every older slice by construction. Relative-position only:
  // cume_dist over nation (18001), part at 200→1000 rows (18096),
  // customer (18037), LEFT supplier (18092); percent_rank over customer
  // (18010), the 500-row documents corpus (18018), events (18107), LEFT
  // events at full projection scale (18144). nth_value only — k × frame
  // × payload type coverage: k=2 string fullframe (18008 s_name), k=3
  // default frame (18014 o_orderpriority), k=2 TIMESTAMP default (18016
  // ts), k=2 int default over documents (18053), k=1 default (18086),
  // k=2 rowsframe LEFT (18105), k=3 rowsframe (18117), k=1 rowsframe
  // over part (18140), k=3 DATE-typed default (18151 o_orderdate), k=1
  // default LEFT (18155). Combo — one relative-position + one nth_value
  // under DIFFERENT window specs: events pctrank+nth1 fullframe (18003),
  // LEFT orders pctrank+nth2 default (18007), customer cumedist+nth2
  // fullframe (18024), nation pctrank+nth3 fullframe (18027), nation
  // cumedist+nth3 rowsframe (18046), customer pctrank+nth3 rowsframe at
  // 75→750 rows (18077), LEFT events cumedist+nth3 fullframe (18080),
  // nation pctrank+nth2 default (18087), orders cumedist+nth1 rowsframe
  // (18162), events cumedist+nth2 over the double value column (18192),
  // LEFT nation cumedist+nth3 default (18196). Rendered query(seed, 26).
  val declaredSeedsV26: Seq[Int] =
    Seq(18001, 18003, 18007, 18008, 18010, 18014, 18016, 18018, 18024,
      18027, 18037, 18046, 18053, 18077, 18080, 18086, 18087, 18092,
      18096, 18105, 18107, 18117, 18140, 18144, 18151, 18155, 18162,
      18192, 18196)

  // Grammar-v27 slice (exact DECIMAL semantics — the corpus carries only
  // doubles, so each seed derives a typed view casting every double
  // column to its fixed DECIMAL(p,s) target inside the FROM fragments;
  // all aggregate/arithmetic outputs are CAST to explicit DECIMAL(38,s)
  // because the engines' decimal result-TYPE rules differ while the
  // values are exact integers underneath). REFROZEN r14: the r13 slice
  // declared raw DECIMAL output columns and 27/28 seeds failed the
  // driver's typed hasher, which renders trailing-zero decimals
  // (`134821.00`) through a shortest-repr float path on one side and a
  // scale-preserving path on the other — values were engine-identical
  // (r13 verdict #1, same hasher-rendering class as r12's tpch_q12
  // HUGEINT). The generator now wraps every decimal-typed output item in
  // CAST(… AS STRING) — both engines render DECIMAL→VARCHAR scale-
  // preserving, exact by construction, no float anywhere — with the
  // rendered scale capped at 6 (Java BigDecimal goes scientific, "0E-8",
  // below 1e-6 at scale>6 where DuckDB stays plain; the cap recast never
  // rounds because decSpec columns carry ≤2 corpus decimals), and WHERE
  // predicates draw from non-decimal columns only (ADVICE r13: double
  // literals vs DECIMAL-cast columns relied on identical coercion).
  // Whole 19001-19200 range re-verified against DuckDB at sf0.001,
  // sf0.01 AND sf0.1 (200/200 pass at each, r14, zero divergence);
  // picks non-empty at sf0.001 and sf0.01, all genuine v27 draws, seed
  // range 19001+ disjoint from every older slice by construction.
  // Grouped decimal aggregation (sum/min/max/count over the typed view):
  // lineitem⋈orders grouped by priority (19002) and status (19024),
  // customer 3-chain to region (19030) / by nation (19083), events
  // value@(12,4) (19043), part by size at 50 groups (19057), supplier
  // 1→5 groups (19070), orders⋈customer (19122), orders 3-chain by
  // n_name (19133). Arithmetic projections with pinned result scales
  // (a*b at sa+sb, a±b at max, a*(1-d)): cross-table o_totalprice*
  // l_quantity (19011), o_totalprice*l_extendedprice (19022), the
  // square l_extendedprice² (19028), events value² at scale 8 — the
  // rendered-scale cap path (19072), orders⋈customer c_acctbal² (19200).
  // Sum-of-products (the TPC-H revenue shape on exact money): part
  // p_retailprice*(1-p_retailprice) (19005), events value*(1-value) at
  // inner scale 8 — cap path (19013), orders⋈customer⋈nation (19016),
  // customer⋈nation (19036), o_totalprice self-product (19119), cross
  // p_retailprice*(1-l_discount) at (38,6) (19195). Decimal scalar
  // functions incl. round(x, s-1) over REAL half-way ties: the
  // negative-value c_acctbal@1 ties — away from zero both directions
  // (19003, 19104), l_extendedprice@1 at 1000-row projection scale
  // (19015), value@3 over events (19034), p_retailprice@1 (19040),
  // integral l_quantity@1 (19093, 19112), l_discount@3 (19144).
  // Rendered with query(seed, 27).
  val declaredSeedsV27: Seq[Int] =
    Seq(19002, 19003, 19005, 19011, 19013, 19015, 19016, 19022, 19024,
      19028, 19030, 19034, 19036, 19040, 19043, 19057, 19070, 19072,
      19083, 19093, 19104, 19112, 19119, 19122, 19133, 19144, 19195,
      19200)

  // Grammar-v28 slice (NULL semantics in SET OPERATIONS — the one
  // relational surface where SQL compares NULLs as EQUAL: joins,
  // predicates and [NOT] IN are three-valued, but INTERSECT/EXCEPT/UNION
  // and their ALL forms use distinct-equality, so a NULL row in both
  // branches of v17's nullable derived view MEETS itself; branch
  // predicates draw from non-victim columns only — a three-valued WHERE
  // over the victim would drop the NULL rows before the set op sees
  // them). Whole 20001-20200 range verified against DuckDB at sf0.001,
  // sf0.01 AND sf0.1 (200/200 pass at each, r13, zero divergence first
  // sweep); picks non-empty at sf0.001 and sf0.01, all genuine v28 draws,
  // seed range 20001+ disjoint from every older slice by construction.
  // Branch-meet, all five ops × tables: INTERSECT (20023 part two-victim,
  // 20061 events, 20099 orders at 6 rows, 20115 supplier), INTERSECT ALL
  // — bag multiplicity of the NULL rows (20013 events 223→1450, 20024
  // documents, 20072 customer), EXCEPT — NULL rows deleted by matching
  // NULL rows (20030 part, 20043 orders, 20065 customer), EXCEPT ALL
  // (20009 orders, 20144 customer), UNION dedup (20015 supplier, 20083
  // orders at 1201→12000 output rows). Literal-NULL-branch membership:
  // UNION contributing the NULL value (20002 part, 20025 customer, 20101
  // events at 822→5948), EXCEPT deleting exactly the NULL rows (20012
  // events, 20079 documents, 20107 orders), INTERSECT keeping exactly
  // one NULL row iff any exists (20103 orders one-row, 20128 documents,
  // 20181 customer). Dedup-count contrast — count(*) vs count(victim)
  // over (A UNION B) proves the NULL rows collapsed to ONE row while
  // count(victim) skips it (20004 events, 20005 orders two-victim ×
  // two-sided, 20011 supplier, 20021 customer, 20028 documents, 20094
  // part). Plan note: the EXCEPT/INTERSECT null-branch seeds pin
  // BroadcastNestedLoopJoinExec=1 — Catalyst constant-folds the
  // null-safe-equality condition against the literal NULL into a pure
  // `isnull(c0)` anti/semi predicate (probed: `BroadcastNestedLoopJoin
  // BuildRight, LeftAnti, isnull(c0)`), and the build side is the
  // one-row literal relation BY CONSTRUCTION — O(fact × 1), linear at
  // any scale, the same class as the 1-row scalar-subquery broadcasts.
  // Rendered with query(seed, 28).
  val declaredSeedsV28: Seq[Int] =
    Seq(20002, 20004, 20005, 20009, 20011, 20012, 20013, 20015, 20021,
      20023, 20024, 20025, 20028, 20030, 20043, 20061, 20065, 20072,
      20079, 20083, 20094, 20099, 20101, 20103, 20107, 20115, 20128,
      20144, 20181)

  // Grammar-v29 slice (LATERAL correlated derived tables — the FROM
  // clause's correlation surface: per-group TOP-K via correlated ORDER BY
  // + LIMIT inside `dim, LATERAL (…)` with the fact's verified-unique key
  // as tiebreak (the DF rendering is the row_number-over-PARTITION-BY
  // window decorrelation Spark itself produces), the always-one-row
  // correlated AGGREGATE lateral (DF = LEFT-join-on-per-key-aggregate
  // with COALESCE(n, 0) — the q17-style decorrelation), and LEFT JOIN
  // LATERAL ON true keeping zero-fact dims NULL-extended). Whole
  // 21001-21200 range verified against DuckDB at sf0.001, sf0.01 AND
  // sf0.1 (200/200 pass at each, r13, zero divergence first sweep);
  // picks non-empty at sf0.001 and sf0.01, all genuine v29 draws, seed
  // range 21001+ disjoint from every older slice by construction.
  // Top-k: k=1 priority DESC under dim+fact preds (21006), events k=2
  // value DESC (21018), supplier k=3 name ASC (21021), customer k=2
  // acctbal DESC (21025), orders k=2 totalprice DESC (21041), k=3 status
  // DESC at 449→4492 output rows — maximal tie pressure on the unique-key
  // tiebreak (21058), events k=1 ts DESC (21064), customer k=3 name ASC
  // (21088), supplier 1→9 rows (21143), orders 1→2 rows (21199).
  // Aggregate laterals: dim+fact preds at 2 dims (21009), the full
  // 150→1500 customer sweep (21012), events factpred (21035), supplier
  // dimpred (21040), events dimpred 77→780 (21115), customer 7 dims
  // (21122), orders dimpred 17→243 (21141), supplier dim+fact (21180),
  // orders dim+fact 139→1378 (21195). LEFT JOIN LATERAL: orders k=2 ASC
  // dimpred (21002), supplier k=1 — all 25 dims flat (21004), events k=2
  // props factpred at 165→1650 — the edge with GENUINE zero-fact dims
  // NULL-extended (21011), customer k=2 two-dim (21020), customer k=3
  // acctbal DESC factpred 50→75 (21043), supplier k=2 dim+fact (21056),
  // events k=3 event_type dimpred (21074), supplier k=3 name DESC
  // dim+fact (21097), orders k=2 dimpred 2→6 (21128), events k=3 ts DESC
  // dim+fact 171→1723 (21187). Plan note: every lateral top-k pins
  // WindowGroupLimitExec=2 — Spark's rank-limit pushdown runs a PARTIAL
  // group-limit before the shuffle and a FINAL one after, so each
  // executor forwards at most k rows per key instead of its whole
  // partition; at 100 TB that is the difference between shuffling k·dims
  // rows and shuffling the fact table. Rendered with query(seed, 29).
  val declaredSeedsV29: Seq[Int] =
    Seq(21002, 21004, 21006, 21009, 21011, 21012, 21018, 21020, 21021,
      21025, 21035, 21040, 21041, 21043, 21056, 21058, 21064, 21074,
      21088, 21097, 21115, 21122, 21128, 21141, 21143, 21180, 21187,
      21195, 21199)

  // Grammar-v30 slice (subqueries as projected VALUES — IN/EXISTS in the
  // SELECT list, where the older WHERE-context quantifier modes can't see
  // the NULL/FALSE distinction because both drop the row. The grammar's
  // first probe FOUND a genuine engine divergence here: Spark 4.1.2 plans
  // a projected InSubquery as an ExistenceJoin and returns FALSE in every
  // NULL case (NULL fk against a non-empty list; no-match against a
  // NULL-poisoned list) where the SQL standard and DuckDB return NULL —
  // so the shared IN/NOT IN flags are rendered COALESCE(…, FALSE), the
  // normalized two-valued surface both engines agree on, and the raw
  // three-valued projection is deliberately NOT drawn; the generator
  // scaladoc documents the deviation). Whole 22001-22200 range verified
  // against DuckDB at sf0.001, sf0.01 AND sf0.1 (200/200 pass at each,
  // r13, zero divergence first sweep); picks non-empty at sf0.001 and
  // sf0.01, all genuine v30 draws, seed range 22001+ disjoint from every
  // older slice by construction. IN/NOT-IN flags over the NULL-injected
  // fact fk: clean lists (22008 supplier, 22013 events at full projection
  // scale, 22016 one-row, 22074, 22079 orders, 22098 customer, 22107),
  // NULL-poisoned lists — the case Spark's ExistenceJoin and DuckDB's
  // three-valued NULL disagree on before normalization (22009 events
  // full-scale, 22030 supplier, 22049, 22103 2→17 rows, 22108 orders,
  // 22142, 22159 customer). Correlated EXISTS/NOT EXISTS booleans —
  // two-valued even for NULL fk (22003 orders, 22011 customer⋈nation,
  // 22024 full-scale, 22078 events, 22085 1→2 rows, 22127 supplier,
  // 22170). EXISTS inside a CASE classifier as the GROUP BY key with the
  // count(*)-vs-count(fk) contrast — 'null'/'hit'/'miss' classes (22002,
  // 22004 all three classes, 22006, 22010, 22019, 22068, 22097).
  // Rendered with query(seed, 30).
  val declaredSeedsV30: Seq[Int] =
    Seq(22002, 22003, 22004, 22006, 22008, 22009, 22010, 22011, 22013,
      22016, 22019, 22024, 22030, 22049, 22068, 22074, 22078, 22079,
      22085, 22097, 22098, 22103, 22107, 22108, 22127, 22142, 22159,
      22170)

  // Grammar-v31 slice (DECIMAL at the TYPED BOUNDARIES — v27 only
  // aggregates/projects decimal values, and its r13 trailing-zero
  // rendering bug proved typed boundaries are where engines diverge, so
  // v31 pushes DECIMAL into the three surfaces v27 never draws: GROUP BY
  // keys, JOIN keys, and comparison predicates. Same typed derived view
  // and same rendered-surface rule as the refrozen v27: no declared
  // output column is DECIMAL-typed — keys/aggregates surface as
  // scale-preserving strings. Predicate literals are generated AT THE
  // COLUMN'S decSpec SCALE (plain decimal literals parse as DECIMAL in
  // both dialects), closing ADVICE r13's double-literal coercion
  // fragility by construction. r15 ADVICE refinement: predicate columns
  // draw only from tables NOT NULL-extended by a LEFT join — a
  // three-valued WHERE over the extended side silently reduced LEFT to
  // INNER — falling back to all-INNER kinds when no inner-side decimal
  // exists; the three affected frozen seeds (23121, 23152, and 23095 →
  // replaced by 23183, the re-draw left it empty) were re-rendered and
  // the whole range re-swept). Whole 23001-23200 range verified against
  // DuckDB at sf0.001, sf0.01 AND sf0.1 (200/200 pass at each, r14;
  // re-swept 200/200 at each after the r15 refreeze, zero divergence
  // both times); picks non-empty at sf0.001 and sf0.01, all
  // genuine v31 draws, seed range 23001+ disjoint from every older slice
  // by construction. Decimal GROUP BY keys — decimal distinct-equality
  // in the hash aggregate, key rendered STRING: l_tax@(8,4) 9 groups
  // (23004), LEFT orders⋈customer on c_acctbal (23008), p_retailprice
  // 200→1000 (23012), l_quantity with cross-table sum(o_totalprice)
  // (23033), o_totalprice at full projection scale (23071), col-vs-col
  // predicate feeding the group (23075), LEFT lineitem⋈orders grouping
  // on the NULL-EXTENDED side's o_totalprice with a head-side pred — the
  // post-restriction shape the r15 refreeze exists to test (23183),
  // events value@(12,4) (23122), BETWEEN-
  // filtered c_acctbal 22→149 (23123), BETWEEN supplier growing 1→13
  // groups (23147). Decimal JOIN keys — every FK→PK edge CAST to
  // DECIMAL(18,s) with s drawn independently per side from {0,2,4}, so
  // cross-scale decimal equality exercises comparison coercion: same-
  // scale (4,4) (23003), orders 3-chain at scales 0/2/2/2 (23007),
  // supplier 3-chain 0/2/2/4 growing 1→20 (23011), cross-scale 4/0
  // (23014), LEFT customer 3-chain all-2s (23022), lineitem 3-chain
  // 4/0/4/0 (23023), BETWEEN + scale-2 edge (23041), scale-0/0 — the
  // integer-rendered decimal key (23062), head-side IN-list + LEFT +
  // 0/4 edge (23121), LEFT lineitem⋈part at 0/0 (23190). Decimal comparison
  // predicates at pinned scale: supplier >= literal (23001), two decimal
  // projections under one pred (23009), BETWEEN across the
  // orders⋈customer join (23021), BETWEEN + LEFT customer⋈nation
  // (23034), BETWEEN narrowing 38→612 (23048), events value 1→23 —
  // maximal selectivity pressure (23080), column-vs-column
  // o_totalprice vs c_acctbal cross-scale compare (23113), BETWEEN on
  // lineitem with two rendered decimals (23136), LEFT lineitem⋈orders
  // with two head-side decimal preds at 59→575 (23152). Rendered with
  // query(seed, 31).
  val declaredSeedsV31: Seq[Int] =
    Seq(23001, 23003, 23004, 23007, 23008, 23009, 23011, 23012, 23014,
      23021, 23022, 23023, 23033, 23034, 23041, 23048, 23062, 23071,
      23075, 23080, 23113, 23121, 23122, 23123, 23136, 23147,
      23152, 23183, 23190)

  // Grammar-v32 slice (the documents ⋈ embeddings corpus edge — the one
  // table pair no other generated mode draws together: documents joins
  // nothing by FK, embeddings only appears through v16's single-table
  // derived view. doc_id = vec_id is 1:≤1 and PARTIAL at sf0.1 — 5000
  // documents vs 2000 vectors — so LEFT forms carry genuine NULL-extended
  // derived columns, a coverage edge no TPC-H FK chain exhibits. The
  // embeddings side is the v16 dual-dialect derived-scalar fragment;
  // everything outside stays one shared SQL text). Whole 24001-24200
  // range verified against DuckDB at sf0.001, sf0.01 AND sf0.1 (200/200
  // pass at each, r14, zero divergence first sweep); picks non-empty at
  // sf0.001 and sf0.01, all genuine v32 draws, seed range 24001+ disjoint
  // from every older slice by construction. doc_id-keyed projections
  // across the edge: INNER with LIKE pred (24012), IN-list narrowing to 3
  // rows (24043), full 500-row inner (24079), BETWEEN at 52 rows (24116),
  // IN at 152 (24168); LEFT with doc-side pred 72 rows (24001), all-500
  // NULL-extended (24018), BETWEEN 110→109 (24036), 102→93 (24099),
  // IN-list at 2 rows (24122), 193→201 — the sf-growing pick (24141).
  // Grouped count(*)-vs-count(e_a) contrasts: INNER plain (24002),
  // BETWEEN (24007), 7→8 groups (24026), LIKE (24057), IN at 2→1 groups
  // — groups VANISH between sfs (24106), IN 13→7 (24180); LEFT plain
  // label groups incl. the NULL-extension group (24009), pred at 2
  // groups (24050), single-group edge (24094), BETWEEN (24104), LIKE
  // (24118), emb-IN (24127). Forced-LEFT coverage probes — per-dim
  // count(*) / count(vec_id) / sum(CASE WHEN vec_id IS NULL) decomposing
  // the partial edge: plain (24003), BETWEEN at 5 sources (24014), pred
  // narrowing to 3 rows (24032), LIKE (24068), BETWEEN at 20 langs
  // (24081), 20→19 — a group disappears at sf0.01 (24092). Rendered with
  // query(seed, 32).
  val declaredSeedsV32: Seq[Int] =
    Seq(24001, 24002, 24003, 24007, 24009, 24012, 24014, 24018, 24026,
      24032, 24036, 24043, 24050, 24057, 24068, 24079, 24081, 24092,
      24094, 24099, 24104, 24106, 24116, 24118, 24122, 24127, 24141,
      24168, 24180)

  // Grammar-v33 slice (DECIMAL × NULL — the composition of the two
  // semantics tiers that bit hardest: v27/v31's exact-decimal typed view
  // and v17's deterministic NULL injection. Each seed NULLs ONE decimal
  // victim on a (uniquekey % m) = r stripe inside the DECIMAL-cast view
  // (one shared SQL text) and drives it through the NULL surfaces:
  // NULL-skipping aggregates, decimal GROUP BY keys with a genuine NULL
  // group, three-valued comparisons that silently drop the stripe, and
  // COALESCE repair CAST to the victim's exact DECIMAL type so the
  // coalesced rendering is scale-stable. Rendered surface is strings/
  // counts — never DECIMAL-typed). Whole 25001-25200 range verified
  // against DuckDB at sf0.001, sf0.01 AND sf0.1 (200/200 pass at each,
  // r14, zero divergence first sweep); picks non-empty at sf0.001 and
  // sf0.01, all genuine v33 draws, seed range 25001+ disjoint from every
  // older slice by construction. NULL-skipping aggregate contrasts —
  // count(*) vs count(v) beside sum/min/max over the NULL-bearing
  // decimal: part p_retailprice by brand (25002) and by size at 50
  // groups (25069), orders by priority (25004) and status (25038),
  // supplier (25015), events value@(12,4) (25023), customer by segment
  // (25036) and nation (25042), events 15→150 groups (25062). The
  // victim AS the GROUP BY key — injected rows collect into ONE genuine
  // NULL group ordered NULLS FIRST: supplier 10→85 (25006), orders at
  // full projection scale (25012), part 173→1000 (25013), events
  // 821→1000 (25014), customer 134→1000 (25022), customer (25031),
  // part 176→876 — groups vanish between SFs (25094), supplier 9→84
  // (25110). Three-valued predicates + typed COALESCE repair: < literal
  // drops the stripe (customer 25003, supplier 25020, orders 10→98
  // 25108), IS NULL selects exactly the stripe (part 25005, events
  // 25009, supplier 1→16 25029), >= literal (part 25030, orders 25061,
  // customer 89→979 25126), IS NOT NULL (orders 25035, events 25043).
  // Rendered with query(seed, 33).
  val declaredSeedsV33: Seq[Int] =
    Seq(25002, 25003, 25004, 25005, 25006, 25009, 25012, 25013, 25014,
      25015, 25020, 25022, 25023, 25029, 25030, 25031, 25035, 25036,
      25038, 25042, 25043, 25061, 25062, 25069, 25094, 25108, 25110,
      25126)

  // Grammar-v34 slice (JSON-path extraction — the one typed corpus surface
  // with zero generated coverage until r15: events.props rode only the
  // fixed f9/x5/f15/f28 entries. The get_json_object-vs-json_extract_string
  // function-name split lives inside a v16-style dual-dialect FROM
  // fragment; extracted values surface as plain STRING / TRY_CAST BIGINT
  // columns so everything outside the fragment is ONE shared SQL text.
  // Two sources: events.props DIRECT ({"k": int} — $.k int-cast plus a
  // drawn absent key → NULL) and a CONSTRUCTED json view (string-concat
  // document from corpus ints/enum strings with key "b" / array "e"
  // missing on a (pk % m) = r stripe — genuine row-dependent missing-key
  // NULLs; doubles never enter the text). Whole 26001-26200 range verified
  // against DuckDB at sf0.001, sf0.01 AND sf0.1 (200/200 pass at each,
  // r15, zero divergence first sweep); picks non-empty at sf0.001 and
  // sf0.01, all genuine v34 draws, seed range 26001+ disjoint from every
  // older slice by construction. Direct props: $.k grouped (26006), keyed
  // projections with $.zz/$.kk absent-key NULLs (26009, 26030, 26055),
  // extracted-k IN-list predicates (26025, 26053). Constructed-events:
  // nested j_d predicates (26001), full projection (26011), j_b IS NOT
  // NULL + j_d (26012), array-element j_e AS GROUP key (26013 at 858
  // groups, 26119 16→151 — sf-growing), string-vs-enum equality + nested
  // pred (26144). Customer: projection (26004), j_e group keys with the
  // genuine NULL group (26043), stripe selection j_e IS NULL AND j_b IS
  // NULL (26045), j_b group key (26049), j_a >= lit AND j_b IS NULL
  // (26078), j_a group key (26089), j_b = 'FURNITURE' (26197). Part:
  // extracted-int pred (26005), projection (26018), j_b IS NOT NULL
  // (26020), j_b >= 'Brand#44' string-range over extracted text (26038),
  // two-pred IS-NOT-NULL + range (26041), j_e group (26061), j_a group
  // (26133). Orders: projection (26029), j_e group (26035), j_a group at
  // 150→1000 groups (26042), missing-key stripe j_b IS NULL (26126).
  // Rendered with query(seed, 34).
  val declaredSeedsV34: Seq[Int] =
    Seq(26001, 26004, 26005, 26006, 26009, 26011, 26012, 26013, 26018,
      26020, 26025, 26029, 26030, 26035, 26038, 26041, 26042, 26043,
      26045, 26049, 26053, 26055, 26061, 26078, 26089, 26119, 26126,
      26133, 26144, 26197)

  // Grammar-v35 slice (collation portability — string ORDERING as data:
  // non-ASCII / mixed-case / decomposed-combining / full-width /
  // supplementary-plane fragments concatenated onto corpus columns, then
  // pushed through every ordering surface: total ORDER BY ± direction,
  // GROUP BY keys, min/max/count-DISTINCT aggregates, byte-order
  // predicates (>= / < / BETWEEN with generation-time UTF-8-ordered
  // bounds / LIKE / IS [NOT] NULL), and case folding (lower() group
  // merges, upper() orderings — the sharp-s frag is excluded from case
  // draws: Spark upper() gives 'SS', DuckDB U+1E9E). Keys are always
  // concat-DERIVED, never a bare CASE-literal output (DuckDB 1.0.0 sorts
  // those in SIGNED-byte order — see collationQuery's doc; FuzzSpec pins
  // the construction). ONE shared SQL text — no dialect split. Whole
  // 27001-27200 range verified against DuckDB at sf0.001, sf0.01 AND
  // sf0.1 (200/200 at each, r15, zero divergence first sweep); picks
  // non-empty at sf0.001+sf0.01, one per shape × table (30, at the
  // r15 freeze budget): case-fold groups (27187, 27031, 27061, 27094,
  // 27026), collation GROUP BY keys (27021, 27062, 27024, 27030, 27002
  // part at 147→324 sf-growing groups), grouped min/max/count-DISTINCT
  // (27012, 27038, 27025, 27017, 27029), total orderings ± direction
  // with length/substr (27046 DESC + NULL stripe, 27004, 27069, 27008,
  // 27005), predicates (27071 >= A-acute, 27114 IS NULL stripe, 27066
  // IS NOT NULL, 27006 LIKE %Alpha%, 27015 BETWEEN A-acute..E-acute,
  // 27033 BETWEEN leading-space..sharp-s), upper() orderings (27023,
  // 27150, 27042, 27036). Rendered with query(seed, 35).
  val declaredSeedsV35: Seq[Int] =
    Seq(27002, 27004, 27005, 27006, 27008, 27012, 27015, 27017, 27021,
      27023, 27024, 27025, 27026, 27029, 27030, 27031, 27033, 27036,
      27038, 27042, 27046, 27061, 27062, 27066, 27069, 27071, 27094,
      27114, 27150, 27187)

  // Grammar-v36 slice (range/band joins — the one JOIN-condition class no
  // older grammar draws: every generated join was pure FK equality, the
  // fixed j8 form being the only range coverage. Every draw anchors the
  // band on an EQUALITY key so both engines plan a hash/sort-merge join
  // with the band as a join filter — never a nested loop (plan-signature
  // pinned). Templates: orders⋈lineitem temporal day band over the
  // shared INTERVAL syntax, events self-join two-sided hour band on
  // user_id (the batch analogue of streaming fuzz v5), part⋈lineitem
  // numeric multiple band (one IEEE multiply, exact both engines). INNER
  // and LEFT kinds — LEFT misses are genuine band misses, a NULL source
  // no older LEFT draw had without injection. Whole 28001-28200 range
  // verified against DuckDB at sf0.001, sf0.01 AND sf0.1 (200/200 each,
  // r15, zero divergence first sweep); picks non-empty at both smaller
  // SFs, two per shape × template × kind (24): grouped count contrasts
  // (orders 28013/28022 inner, 28001/28009 left; events 28033/28052
  // inner, 28008/28027 left; part 28006/28019 inner, 28026/28051 left),
  // keyed projections (orders 28020/28024 inner, 28018/28049 left;
  // events 28004/28016 inner, 28003/28015 left; part 28010/28035 inner,
  // 28014/28039 left). Rendered with query(seed, 36).
  val declaredSeedsV36: Seq[Int] =
    Seq(28001, 28003, 28004, 28006, 28008, 28009, 28010, 28013, 28014,
      28015, 28016, 28018, 28019, 28020, 28022, 28024, 28026, 28027,
      28033, 28035, 28039, 28049, 28051, 28052)

  // Grammar-v37 slice (multimodal META scalars — the documents table as
  // the derived media-metadata view the multimodal suite's fixed queries
  // consume: octet byte length (the one dialect split — DuckDB needs
  // encode() first), ascii first byte, frame count at drawn frame size
  // F ∈ {32,64,128}, stride-S kept-frame count, and a modulus format tag.
  // The last table-family edge with zero generated coverage (the v32
  // lesson). Whole 29001-29200 range verified against DuckDB at sf0.001,
  // sf0.01 AND sf0.1 (200/200 each, r16, zero divergence first sweep);
  // picks non-empty at both smaller SFs, stride-diverse per shape × frame
  // size (26): per-format grouped aggregates (f32 29019/29038/29063, f64
  // 29001/29010/29030, f128 29007/29040), first_byte histograms (f32
  // 29002/29027/29033, f64 29005/29020/29037, f128 29008/29024/29043),
  // keyed meta projections (f32 29022/29102/29147, f64 29009/29025/29106,
  // f128 29003/29084/29087). Rendered with query(seed, 37).
  val declaredSeedsV37: Seq[Int] =
    Seq(29001, 29002, 29003, 29005, 29007, 29008, 29009, 29010, 29019,
      29020, 29022, 29024, 29025, 29027, 29030, 29033, 29037, 29038,
      29040, 29043, 29063, 29084, 29087, 29102, 29106, 29147)

  // Grammar-v38 slice (VARIANT typed extraction — parse_json + variant_get
  // with per-use target types, the Spark-4 semi-structured surface whose
  // only coverage was the single fixed f28_variant entry; the v32/v34
  // lesson again: single-entry surfaces hide dialect boundaries. The
  // typed-extraction split renders variant_get for Spark and
  // json_extract_string + CAST for DuckDB inside a dual-dialect FROM
  // fragment; see FuzzGen.variantQuery). Whole 30001-30200 range verified
  // against DuckDB at sf0.001, sf0.01 AND sf0.1 (200/200 each, r17, zero
  // divergence first sweep); extended 30201-30600 soak at sf0.001 AND
  // sf0.01 = 800/800 (r17, zero divergence); picks non-empty at both
  // smaller SFs,
  // SQL-distinct (the direct branch draws only the missing-key name, so
  // same-shape direct seeds can render identical SQL — duplicates were
  // swapped for constructed draws), shape × source diverse (26):
  // events.props direct projections (30012, 30040), direct extracted-key
  // groups (30013, 30033), direct predicates (30003 IS-NULL full, 30021
  // selective 27→309, 30061 range), constructed-JSON projections one per
  // base table (30008 events, 30016 part, 30075 customer, 30099 orders),
  // BOOLEAN group keys — the typed surface v34 never drew,
  // true/false/NULL three-group splits — across all four tables (30001
  // part, 30023 orders, 30030 customer, 30129 events), string group keys
  // with stripe-NULL groups (30007 events, 30015 customer), int group
  // keys (30004 orders, 30055 part, 30065 customer), and extracted-value
  // predicates per table (30014 + 30079 orders, 30006 + 30042 events,
  // 30046 part, 30132 customer). Rendered with query(seed, 38).
  val declaredSeedsV38: Seq[Int] =
    Seq(30001, 30003, 30004, 30006, 30007, 30008, 30012, 30013, 30014,
      30015, 30016, 30021, 30023, 30030, 30033, 30040, 30042, 30046,
      30055, 30061, 30065, 30075, 30079, 30099, 30129, 30132)

  // Grammar-v39 slice (XML round-trip extraction — from_xml over a
  // CONSTRUCTED document with drawn shape: int-as-attribute vs element,
  // nested element, repeated-element ARRAY indexing, and a 1-in-m
  // missing-optional stripe giving typed NULLs; DuckDB has no XML so the
  // oracle computes the same values from the RAW scalars — the f26
  // lossless-parse differential, seeded. The r17 verdict #5 item: f26 was
  // the last Spark-4 semi-structured surface with one fixed entry). Whole
  // 31001-31200 range verified against DuckDB at sf0.001, sf0.01 AND
  // sf0.1 (200/200 each, r18, zero divergence first sweep); picks
  // non-empty at both smaller SFs, covering all 16 mode × table
  // combinations: projections (31004/31026/31030 part, 31028/31044/31048
  // orders, 31007 customer, 31055 events), extracted-key groups — string
  // key (31017 events, 31039 orders, 31046 part, 31075 customer) and
  // attribute/element int key (31003 customer, 31010 events, 31011
  // orders, 31043 part), extracted-field predicates (31001 events, 31006
  // orders, 31012/31019/31033 customer, 31016 part). Rendered with
  // query(seed, 39).
  val declaredSeedsV39: Seq[Int] =
    Seq(31001, 31003, 31004, 31006, 31007, 31010, 31011, 31012, 31016,
      31017, 31019, 31026, 31028, 31030, 31033, 31039, 31043, 31044,
      31046, 31048, 31055, 31075)

  /** The grammar-v1..v16 frozen slices, rotated to SOAK-ONLY bench coverage
    * (BASELINE bench-budget policy: v1-v8 rotated at r15 when the per-round
    * bench window crossed the 12-minute rotation trigger at 942 queries ×
    * min-of-2; v9-v12 rotated at r16 after the r15 driver window confirmed
    * the 15-minute budget overage at 15.2 min; v13-v15 rotated at r17 after
    * the r16 driver window read 15.3 min; v16 rotated at r18 to buy
    * headroom for the new fz31xxx XML slice — each time the next-oldest
    * slices, stable for ≥6 rounds). Rotation affects the BENCH artifact
    * only: every seed here still runs through Verify and the driver's
    * DuckDB oracle each round (correctness coverage unchanged), still
    * carries its SQL-hash pin and plan signature, and still rides the
    * FuzzDump mass soaks. Bench includes them again under an explicit
    * SPARK_GRAFT_BENCH_QUERIES filter or SPARK_GRAFT_BENCH_ALL=1.
    */
  val soakOnlySeeds: Seq[Int] =
    declaredSeeds ++ declaredSeedsV2 ++ declaredSeedsV3 ++ declaredSeedsV4 ++
      declaredSeedsV5 ++ declaredSeedsV6 ++ declaredSeedsV7 ++ declaredSeedsV8 ++
      declaredSeedsV9 ++ declaredSeedsV10 ++ declaredSeedsV11 ++ declaredSeedsV12 ++
      declaredSeedsV13 ++ declaredSeedsV14 ++ declaredSeedsV15 ++ declaredSeedsV16

  val defs: Seq[Q] =
    (declaredSeeds.map(s => s -> FuzzGen.query(s)) ++
      declaredSeedsV2.map(s => s -> FuzzGen.query(s, 2)) ++
      declaredSeedsV3.map(s => s -> FuzzGen.query(s, 3)) ++
      declaredSeedsV4.map(s => s -> FuzzGen.query(s, 4)) ++
      declaredSeedsV5.map(s => s -> FuzzGen.query(s, 5)) ++
      declaredSeedsV6.map(s => s -> FuzzGen.query(s, 6)) ++
      declaredSeedsV7.map(s => s -> FuzzGen.query(s, 7)) ++
      declaredSeedsV8.map(s => s -> FuzzGen.query(s, 8)) ++
      declaredSeedsV9.map(s => s -> FuzzGen.query(s, 9)) ++
      declaredSeedsV10.map(s => s -> FuzzGen.query(s, 10)) ++
      declaredSeedsV11.map(s => s -> FuzzGen.query(s, 11)) ++
      declaredSeedsV12.map(s => s -> FuzzGen.query(s, 12)) ++
      declaredSeedsV13.map(s => s -> FuzzGen.query(s, 13)) ++
      declaredSeedsV14.map(s => s -> FuzzGen.query(s, 14)) ++
      declaredSeedsV15.map(s => s -> FuzzGen.query(s, 15)) ++
      declaredSeedsV16.map(s => s -> FuzzGen.query(s, 16)) ++
      declaredSeedsV17.map(s => s -> FuzzGen.query(s, 17)) ++
      declaredSeedsV18.map(s => s -> FuzzGen.query(s, 18)) ++
      declaredSeedsV19.map(s => s -> FuzzGen.query(s, 19)) ++
      declaredSeedsV20.map(s => s -> FuzzGen.query(s, 20)) ++
      declaredSeedsV21.map(s => s -> FuzzGen.query(s, 21)) ++
      declaredSeedsV22.map(s => s -> FuzzGen.query(s, 22)) ++
      declaredSeedsV23.map(s => s -> FuzzGen.query(s, 23)) ++
      declaredSeedsV24.map(s => s -> FuzzGen.query(s, 24)) ++
      declaredSeedsV25.map(s => s -> FuzzGen.query(s, 25)) ++
      declaredSeedsV26.map(s => s -> FuzzGen.query(s, 26)) ++
      declaredSeedsV27.map(s => s -> FuzzGen.query(s, 27)) ++
      declaredSeedsV28.map(s => s -> FuzzGen.query(s, 28)) ++
      declaredSeedsV29.map(s => s -> FuzzGen.query(s, 29)) ++
      declaredSeedsV30.map(s => s -> FuzzGen.query(s, 30)) ++
      declaredSeedsV31.map(s => s -> FuzzGen.query(s, 31)) ++
      declaredSeedsV32.map(s => s -> FuzzGen.query(s, 32)) ++
      declaredSeedsV33.map(s => s -> FuzzGen.query(s, 33)) ++
      declaredSeedsV34.map(s => s -> FuzzGen.query(s, 34)) ++
      declaredSeedsV35.map(s => s -> FuzzGen.query(s, 35)) ++
      declaredSeedsV36.map(s => s -> FuzzGen.query(s, 36)) ++
      declaredSeedsV37.map(s => s -> FuzzGen.query(s, 37)) ++
      declaredSeedsV38.map(s => s -> FuzzGen.query(s, 38)) ++
      declaredSeedsV39.map(s => s -> FuzzGen.query(s, 39))).map { case (seed, g) =>
      Q(
        s"fz$seed",
        s"Generated differential query (FuzzGen seed $seed): " +
          s"DataFrame-API build vs DuckDB running the identically-drawn SQL. " +
          s"SQL: ${g.sql.take(160)}",
        g.build,
        Some(g.sql))
    }
}
