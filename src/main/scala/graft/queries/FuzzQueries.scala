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
  // rules (non-empty at sf0.001 AND sf0.01; whole 701-800 range verified
  // against DuckDB at both SFs before freezing). IN subquery: grouped with
  // BETWEEN (716), projection (753), avg beside IN (795); correlated
  // EXISTS: grouped (705), projection at LIMIT scale (723), modulo outer
  // filter (793); NOT EXISTS (anti): grouped (712), projection (748),
  // count-DISTINCT grouped (768); scalar subquery: avg-scalar under a
  // grouped outer (728), max-scalar projection (747), min-agg grouped
  // (784); derived-table join: nation→region dim (711), customer→nation
  // with two aggregates (734), HAVING inside the derived table (772),
  // sum + count over supplier→nation (797). Rendered with query(seed, 5).
  val declaredSeedsV5: Seq[Int] =
    Seq(705, 711, 712, 716, 723, 728, 734, 747, 748, 753, 768, 772, 784,
      793, 795, 797)

  val defs: Seq[Q] =
    (declaredSeeds.map(s => s -> FuzzGen.query(s)) ++
      declaredSeedsV2.map(s => s -> FuzzGen.query(s, 2)) ++
      declaredSeedsV3.map(s => s -> FuzzGen.query(s, 3)) ++
      declaredSeedsV4.map(s => s -> FuzzGen.query(s, 4)) ++
      declaredSeedsV5.map(s => s -> FuzzGen.query(s, 5))).map { case (seed, g) =>
      Q(
        s"fz$seed",
        s"Generated differential query (FuzzGen seed $seed): " +
          s"DataFrame-API build vs DuckDB running the identically-drawn SQL. " +
          s"SQL: ${g.sql.take(160)}",
        g.build,
        Some(g.sql))
    }
}
