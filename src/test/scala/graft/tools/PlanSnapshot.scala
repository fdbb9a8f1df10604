package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.TestSpark
import graft.queries.QueryCatalog

/** Regenerates the golden plan-signature file PlanSignatureSpec compares
  * against. Run after a DELIBERATE plan change:
  *
  *   sbt "Test/runMain graft.tools.PlanSnapshot"
  *
  * then review the git diff of the golden file — every changed line is a
  * query whose physical plan shape changed, and the diff review IS the
  * point of the gate.
  */
object PlanSnapshot {
  val goldenPath = "src/test/resources/plan_signatures.tsv"

  /** Queries with build-time side effects (real ingest runs) whose plans
    * are not pure functions of the corpus — excluded from the gate.
    */
  val excluded: Set[String] = Set("r13_ingest_report")

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.catalog.clearCache() // signatures are defined over uncached plans
    val lines = QueryCatalog.all
      .filterNot(q => excluded.contains(q.name))
      .map(q => s"${q.name}\t${PlanSignature.of(q.build(spark, TestSpark.sf0001))}")
    Files.createDirectories(Paths.get(goldenPath).getParent)
    Files.write(Paths.get(goldenPath),
      (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${lines.size} signatures to $goldenPath")
    spark.stop()
  }
}
