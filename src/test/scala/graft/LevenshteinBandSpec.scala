package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.LevenshteinBandRule

/** The custom optimizer rule: a length-difference band guard auto-injected
  * ahead of `levenshtein(a, b) <= k` filter predicates.
  */
class LevenshteinBandSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def filtered = Tables.part(spark, TestSpark.sf0001)
    .where(levenshtein(col("p_name"), col("p_type")) <= 5)
    .select("p_partkey")

  test("rule injects the band guard into the optimized plan") {
    // install here (idempotent) — TestSpark's session registers functions
    // but not the rule; after this the rule stays active for suites sharing
    // the session, which mirrors every GraftSession-built production session
    LevenshteinBandRule.install(spark)
    val plan = filtered.queryExecution.optimizedPlan.toString
    assert(plan.contains("levenshtein"), s"original predicate must survive:\n$plan")
    assert(plan.contains("abs((length(") || plan.contains("abs(length("),
      s"expected the length-band guard:\n$plan")
  }

  test("rule converges: guard injected exactly once, plan stable") {
    val once = LevenshteinBandRule(filtered.queryExecution.optimizedPlan)
    assert(once fastEquals LevenshteinBandRule(once),
      "re-applying the rule must be a no-op on already-guarded plans")
    val plan = filtered.queryExecution.optimizedPlan.toString
    assert("levenshtein".r.findAllIn(plan).length == 1,
      s"exactly one levenshtein evaluation expected:\n$plan")
  }

  test("guarded filter returns exactly the unguarded rows (incl. null edge)") {
    import spark.implicits._
    val df = Seq(
      ("abc", "abd"), ("abc", "abcdefghij"), ("same", "same"),
      (null.asInstanceOf[String], "x"), ("x", null.asInstanceOf[String]))
      .toDF("a", "b")
    val got = df.where(levenshtein(col("a"), col("b")) <= 2).collect()
    // manual expectation: distance <= 2 and non-null sides only
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("abc", "abd"), ("same", "same")))
  }
}
