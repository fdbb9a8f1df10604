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

  // Chosen from a scanned seed range for shape diversity with non-trivial
  // row counts: LEFT + 3-table chains (201, 206, 227), grouped aggregates
  // with sum/count DISTINCT (202, 204, 224), HAVING (212, 224, 227), global
  // agg (215), CASE projection (205), OR + modulo predicates (208), LEFT-
  // join NULL ordering (219), timestamp projection (228). All 12 verified
  // against DuckDB at sf0.01 and sf0.001 before freezing.
  val declaredSeeds: Seq[Int] =
    Seq(201, 202, 204, 205, 206, 208, 212, 215, 219, 224, 227, 228)

  val defs: Seq[Q] = declaredSeeds.map { seed =>
    val g = FuzzGen.query(seed)
    Q(
      s"fz$seed",
      s"Generated differential query (FuzzGen seed $seed): " +
        s"DataFrame-API build vs DuckDB running the identically-drawn SQL. " +
        s"SQL: ${g.sql.take(160)}",
      g.build,
      Some(g.sql))
  }
}
