package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Custom optimizer rule — the `Rule[LogicalPlan]` extension tier, beside
  * the native expressions (tier b) and the as-of physical operator (tier c).
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (deleting/inserting one char changes the length by one, so the distance
  * is at least the length gap). The guard costs two O(1) length reads
  * against levenshtein's O(|a|·|b|) dynamic program, and `And` short-
  * circuits: rows outside the band never run the DP at all. On a fuzzy
  * match over long near-unique strings the band eliminates most of the
  * quadratic work — the standard pre-filter every record-linkage engine
  * applies, expressed here as an automatic plan rewrite so query authors
  * write only the intent.
  *
  * Soundness with NULLs: if either side is NULL, the guard is NULL and the
  * original predicate is NULL — `And(NULL, NULL) = NULL`, identical filter
  * outcome. If the guard is TRUE the conjunction reduces to the original;
  * guard FALSE with original TRUE is impossible (the implication above).
  *
  * Convergence: optimizer batches run to fixpoint, so the rule must not
  * re-guard its own output — it skips any comparison already conjoined
  * with a structurally-equal guard (checked condition-wide: a guard in a
  * different OR branch suppresses a second injection — conservative, never
  * wrong, occasionally misses a branch).
  *
  * Scope, deliberately narrow: FILTER conditions with the two-argument
  * levenshtein on either side of an integer literal. The THRESHOLD form
  * `levenshtein(a, b, t)` is explicitly excluded — it returns -1 past the
  * threshold, so `-1 <= k` can be TRUE for rows the length band excludes
  * and the guard would wrongly drop them. Join conditions and cast-wrapped
  * literals are future work (missed optimization only, never wrong
  * results).
  */
object LevenshteinBandRule extends Rule[LogicalPlan] {

  private def guardFor(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)

  private def alreadyGuarded(cond: Expression, lev: Levenshtein,
                             k: Expression): Boolean = {
    val g = guardFor(lev, k)
    cond.exists(_.semanticEquals(g))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      // threshold-form levenshtein(a, b, t) returns -1 past t — the band
      // implication does NOT hold for it (see scaladoc); two-arg form only
      def eligible(lev: Levenshtein, k: Expression): Boolean =
        lev.threshold.isEmpty && lev.deterministic && !alreadyGuarded(cond, lev, k)
      val newCond = cond transformUp {
        case orig @ LessThanOrEqual(lev: Levenshtein, k @ Literal(_, IntegerType))
            if eligible(lev, k) =>
          And(guardFor(lev, k), orig)
        case orig @ LessThan(lev: Levenshtein, k @ Literal(_, IntegerType))
            if eligible(lev, k) =>
          And(guardFor(lev, k), orig)
        case orig @ GreaterThanOrEqual(k @ Literal(_, IntegerType), lev: Levenshtein)
            if eligible(lev, k) =>
          And(guardFor(lev, k), orig)
        case orig @ GreaterThan(k @ Literal(_, IntegerType), lev: Levenshtein)
            if eligible(lev, k) =>
          And(guardFor(lev, k), orig)
      }
      if (newCond fastEquals cond) f else f.copy(condition = newCond)
  }

  /** Runtime installation for an already-built session (the
    * `experimental.extraOptimizations` path GraftSession uses); idempotent.
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(LevenshteinBandRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinBandRule
    }
  }
}
