package graft

import org.apache.spark.sql.SparkSession

import graft.queries.QueryCatalog

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Runs every declared query on SPARK_GRAFT_SF_DIR with a full materialize
  * (noop sink — forces all columns/rows through the plan, unlike count()
  * which lets Catalyst prune the world), prints ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-bench")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        QueryCatalog.byName(name).build(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
    }

    val names = QueryCatalog.all.map(_.name)
    // JVM/codegen warmup on a representative query (parquet scan + shuffle
    // join) so the first measured query doesn't absorb classloading costs.
    runOnce("j1_join_inner")

    val results = names.map(n => n -> runOnce(n))
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total_query_sec","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
