package graft

import graft.queries.QueryCatalog

/** Plan auditor: prints `explain("formatted")` for the named queries (or a
  * representative default set) so pushdown (`PushedFilters`), column pruning
  * (`ReadSchema`), join strategies, and WholeStageCodegen spans can be
  * inspected per round. Usage: runMain graft.Explain <sfDir> [names...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("j1_join_inner", "j2_join_broadcast", "j3_join_multiway",
        "a1_agg_pricing", "o1_top10_orders", "x1_exact_dedup")
    val spark = GraftSession.getOrCreate("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      QueryCatalog.byName(n).build(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
