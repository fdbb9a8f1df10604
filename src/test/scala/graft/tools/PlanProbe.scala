package graft.tools
import graft.GraftSession
import graft.queries.QueryCatalog
object PlanProbe {
  def main(args: Array[String]): Unit = {
    // Optional first arg `--sf=<dir>` overrides the data directory (r12
    // advice: the hardcoded path made the tool machine-specific).
    val (sfDir, names) = args.partition(_.startsWith("--sf=")) match {
      case (sf, rest) =>
        (sf.lastOption.map(_.stripPrefix("--sf="))
          .getOrElse("/root/testdata/sf0.001"), rest)
    }
    val spark = GraftSession.getOrCreate("plan-probe", defaultCpus = "4")
    for (n <- names) {
      val p = QueryCatalog.byName(n).build(spark, sfDir)
        .queryExecution.executedPlan.toString
      println(s"=== $n ===")
      println(p.linesIterator.filter(l => l.contains("Join") || l.contains("Aggregate") || l.contains("Cartesian")).mkString("\n"))
    }
    spark.stop()
  }
}
