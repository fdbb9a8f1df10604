package graft.tools

import graft.GraftSession
import graft.queries.QueryCatalog

/** Throwaway debug main for the ParseReuse rules (r18): prints the
  * optimized logical plan for the named queries so rule firing can be
  * inspected without the physical-plan noise.
  */
object RuleDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-rule-debug")
    args.drop(1).foreach { n =>
      println(s"\n========== $n (optimized logical) ==========")
      val df = QueryCatalog.byName(n).build(spark, sfDir)
      println(df.queryExecution.optimizedPlan.treeString)
    }
    spark.stop()
  }
}
