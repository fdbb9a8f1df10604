package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QueryCatalog
import graft.tools.{PlanSignature, PlanSnapshot}

/** Plan-regression gate: the physical-plan shape of every declared query is
  * pinned in a golden file. A broadcast join silently degrading to a
  * sort-merge shuffle, an extra Exchange sneaking into a pipeline, an
  * aggregate falling from hash to sort mode — all are invisible to the
  * correctness oracle (same rows) and usually invisible at sf0.01 bench
  * noise, but they are exactly what decides cost at 100 TB. Any signature
  * drift fails here; a DELIBERATE plan change is acknowledged by
  * regenerating the golden file (Test/runMain graft.tools.PlanSnapshot)
  * and reviewing its git diff.
  */
class PlanSignatureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Suites sharing this JVM may have left corpus-derived frames cached
    * (e.g. the per-corpus component-label cache); cache substitution swaps
    * InMemoryRelation into plans and shifts signatures. Signatures are
    * defined over the UNCACHED plan (what a fresh cluster would run), so
    * clear once before the first comparison. Suites are sequential in the
    * forked test JVM, and later suites lazily repopulate what they need.
    */
  lazy val uncached: Unit = spark.catalog.clearCache()

  lazy val golden: Map[String, String] = {
    val src = Source.fromFile(PlanSnapshot.goldenPath)
    try src.getLines().filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      line.substring(0, i) -> line.substring(i + 1)
    }.toMap
    finally src.close()
  }

  test("golden file covers the whole catalog (no unpinned queries)") {
    val names = QueryCatalog.all.map(_.name)
      .filterNot(PlanSnapshot.excluded.contains).toSet
    assert(names.diff(golden.keySet).isEmpty,
      s"queries missing from golden file (run PlanSnapshot): ${names.diff(golden.keySet)}")
    assert(golden.keySet.diff(names).isEmpty,
      s"stale golden entries for removed queries: ${golden.keySet.diff(names)}")
  }

  QueryCatalog.all.filterNot(q => PlanSnapshot.excluded.contains(q.name)).foreach { q =>
    test(s"${q.name}: physical plan signature unchanged") {
      uncached
      val sig = PlanSignature.of(q.build(spark, TestSpark.sf0001))
      assert(golden.get(q.name).contains(sig),
        s"plan shape drifted\n  golden: ${golden.getOrElse(q.name, "<absent>")}\n" +
          s"  actual: $sig\nIf deliberate: sbt 'Test/runMain graft.tools.PlanSnapshot' " +
          "and review the golden diff.")
    }
  }
}
