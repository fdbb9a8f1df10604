package graft.tools
import graft.GraftSession
import graft.queries.QueryCatalog
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("plan-probe", defaultCpus = "4")
    for (n <- args) {
      val p = QueryCatalog.byName(n).build(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"=== $n ===")
      println(p.linesIterator.filter(l => l.contains("Join") || l.contains("Aggregate") || l.contains("Cartesian")).mkString("\n"))
    }
    spark.stop()
  }
}
