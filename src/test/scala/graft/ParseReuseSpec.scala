package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{ParseCost, ParseReuseRules}
import graft.queries.QueryCatalog

/** The r18 parse-reuse optimizer rules (graft.plans.ParseReuse): plan-shape
  * assertions for each rule's target pattern plus row-identity against the
  * un-optimized plans. The DuckDB oracle re-checks the same queries
  * end-to-end every round; this spec pins the MECHANISM (how many parses
  * the optimized plan evaluates, and where) so a rules regression is
  * caught at test time, not as a bench regression two rounds later.
  */
class ParseReuseSpec extends AnyFunSuite {

  /** Session WITH the rules (a child session of the shared test session so
    * the golden plan-signature file, generated rule-free, is unaffected).
    */
  lazy val optimized: SparkSession = {
    val s = TestSpark.spark.newSession()
    graft.expressions.GraftFunctions.register(s)
    ParseReuseRules.install(s)
    s
  }
  /** Session WITHOUT the rules — the shared plain test session. */
  lazy val vanilla: SparkSession = TestSpark.spark

  private def optimizedPlan(s: SparkSession, name: String): LogicalPlan =
    QueryCatalog.byName(name).build(s, TestSpark.sf0001)
      .queryExecution.optimizedPlan

  /** Total parse-family expression occurrences in a logical plan. */
  private def parseCount(p: LogicalPlan): Int = {
    var n = 0
    p.foreach { node =>
      node.expressions.foreach(_.foreach(e => if (ParseCost.isParse(e)) n += 1))
    }
    n
  }

  /** Parse occurrences strictly BELOW the topmost GlobalLimit (i.e. work
    * done on the full table rather than on the limited row set).
    */
  private def parseCountBelowLimit(p: LogicalPlan): Int = {
    var n = -1
    p.foreach {
      case gl: GlobalLimit if n < 0 => n = parseCount(gl)
      case _                        => ()
    }
    math.max(n, 0)
  }

  private def rows(s: SparkSession, name: String): Seq[String] =
    QueryCatalog.byName(name).build(s, TestSpark.sf0001)
      .collect().map(_.toString).toSeq

  // --- DeferParsePastTopK: projection-shape extraction queries ----------

  test("fz26029 (v34 proj): 5 JSON extractions deferred past the top-k") {
    val before = optimizedPlan(vanilla, "fz26029")
    val after = optimizedPlan(optimized, "fz26029")
    assert(parseCountBelowLimit(before) == 5, "un-optimized plan parses below the limit")
    assert(parseCountBelowLimit(after) == 0, "rules must defer every parse past the limit")
    // r19: FactorPathExtraction additionally merges the 5 distinct-path
    // get_json_object calls into ONE shared json_paths_extract evaluation
    assert(parseCount(after) == 1,
      "the 5 relocated extractions share one multi-path parse")
  }

  test("fz31044 (v39 proj): from_xml deferred past the top-k") {
    val after = optimizedPlan(optimized, "fz31044")
    assert(parseCountBelowLimit(after) == 0)
    assert(parseCount(after) >= 1)
  }

  // --- PullFilterAboveParseProject: predicate-shape queries --------------

  test("fz31006 (v39 pred, 1 filter parse): 2 parses/row collapse to 1") {
    assert(parseCount(optimizedPlan(vanilla, "fz31006")) == 2)
    assert(parseCount(optimizedPlan(optimized, "fz31006")) == 1)
  }

  test("fz31001 (v39 pred, 2 filter parses): 3 parses/row collapse to 1") {
    assert(parseCount(optimizedPlan(vanilla, "fz31001")) == 3)
    assert(parseCount(optimizedPlan(optimized, "fz31001")) == 1)
  }

  // --- FactorParse: repeated canonical parse inside one operator ---------

  test("fz30014 (v38 pred): 5 parse_json evaluations collapse to 2 (one " +
    "shared below the filter, one shared above the limit)") {
    def parseJsonCount(p: LogicalPlan): Int = {
      var n = 0
      p.foreach(_.expressions.foreach(_.foreach {
        case s: org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
            if s.functionName == "parseJson" => n += 1
        case _ => ()
      }))
      n
    }
    assert(parseJsonCount(optimizedPlan(vanilla, "fz30014")) == 5)
    assert(parseJsonCount(optimizedPlan(optimized, "fz30014")) == 2)
  }

  test("f26_from_xml: 3 from_xml evaluations per row collapse to 1") {
    assert(parseCount(optimizedPlan(vanilla, "f26_from_xml")) == 3)
    assert(parseCount(optimizedPlan(optimized, "f26_from_xml")) == 1)
  }

  // --- Row identity: the rules move work, never change it ----------------

  for (name <- Seq("fz26029", "fz26025", "fz31006", "fz31001", "fz31044",
    "fz31010", "fz30014", "fz30099", "fz30004", "f26_from_xml",
    "f9_json_extract", "x5_json_struct", "f28_variant")) {
    test(s"$name: identical rows with and without the parse-reuse rules") {
      assert(rows(optimized, name) == rows(vanilla, name))
    }
  }

  // --- Safety: a computed (non-pass-through) sort key blocks deferral ----

  test("DeferParsePastTopK bails when the sort key is the parsed value") {
    import optimized.implicits._
    val df = Seq((1L, """{"a": 7}"""), (2L, """{"a": 3}"""))
      .toDF("id", "js")
      .selectExpr("id", "get_json_object(js, '$.a') AS a")
      .orderBy("a").limit(1)
    val plan = df.queryExecution.optimizedPlan
    assert(parseCountBelowLimit(plan) == parseCount(plan),
      "sorting BY the parsed value must keep the parse below the limit")
    assert(df.collect().map(_.getString(1)).toSeq == Seq("3"))
  }
}
