package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan signature for the plan-regression gate: counts of the
  * operator classes that determine a query's cost shape at scale. A
  * signature change is not necessarily a bug — but it must be a conscious
  * decision (regenerate the golden file), never an accident. Class-name
  * counts (not full plan text) keep the signature stable across
  * expression ids, temp names, and cosmetic plan-text changes.
  */
object PlanSignature {

  /** Node classes that matter for scale posture: every shuffle, every join
    * strategy, aggregation mode, window, sort, generate.
    */
  private val tracked: Seq[String] = Seq(
    "ShuffleExchangeExec",        // a real shuffle — THE scale currency
    "BroadcastExchangeExec",
    "SortMergeJoinExec",
    "BroadcastHashJoinExec",
    "ShuffledHashJoinExec",
    "BroadcastNestedLoopJoinExec",
    "CartesianProductExec",
    "HashAggregateExec",
    "ObjectHashAggregateExec",
    "SortAggregateExec",
    "WindowExec",
    "WindowGroupLimitExec",
    "SortExec",
    "GenerateExec",
    "ExpandExec",
    "AsofJoinNativeExec")

  def of(df: DataFrame): String = {
    // sparkPlan = the strategy-selected physical plan BEFORE adaptive
    // re-planning: deterministic for a fixed session + corpus, which is
    // what a golden-file comparison needs (AQE's final plan depends on
    // runtime stats and would flap).
    val plan = df.queryExecution.sparkPlan
    val counts = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    def walk(p: SparkPlan): Unit = {
      val n = p.getClass.getSimpleName
      if (tracked.contains(n)) counts(n) += 1
      p.children.foreach(walk)
      // Subqueries (scalar/IN) carry their own plans — but before the
      // preparation phase (PlanSubqueries) runs, the expression may still
      // hold the LOGICAL subquery plan despite `subqueries`' erased
      // Seq[SparkPlan] type. Guard: count physical subquery plans, skip
      // unplanned logical ones (deterministically — same build, same skip).
      (p.subqueries: Seq[Any]).foreach {
        case sp: SparkPlan => walk(sp)
        case _             => () // widened to Any: the erased Seq[SparkPlan]
        // would otherwise cast-fail on a logical plan before the match runs
      }
    }
    walk(plan)
    tracked.filter(counts(_) > 0).map(n => s"$n=${counts(n)}").mkString(",")
  }
}
