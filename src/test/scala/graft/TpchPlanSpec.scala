package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QueryCatalog

/** Plan-shape assertions for the TPC-H block — the `.explain("formatted")`
  * contract, pinned: filters reach the scans, tiny dims broadcast, no
  * nested loops, and the scan-only query stays shuffle-free until its
  * 1-row combine.
  */
class TpchPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def plan(name: String): String =
    QueryCatalog.byName(name).build(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString

  test("tpch_q6: pure scan-filter-aggregate — no join, filters pushed") {
    val p = plan("tpch_q6")
    assert(!p.contains("Join"), s"q6 must not join:\n$p")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      s"shipdate bounds must reach the parquet scan:\n$p")
  }

  test("tpch_q3: both date filters pushed to their scans") {
    val p = plan("tpch_q3")
    assert(p.contains("LessThan(o_orderdate") || p.contains("lt(o_orderdate"),
      s"orders date filter not pushed:\n$p")
    assert(p.contains("GreaterThan(l_shipdate") || p.contains("gt(l_shipdate"),
      s"lineitem date filter not pushed:\n$p")
  }

  test("tpch_q5: star join broadcasts at least the nation/region dims") {
    val p = plan("tpch_q5")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast in the star join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"star join must stay equi:\n$p")
  }

  test("tpch_q17: correlated average decorrelates to an aggregate join, no re-scan loop") {
    val p = plan("tpch_q17")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"correlated subquery must decorrelate:\n$p")
    assert(p.contains("HashAggregate"), s"expected the per-part aggregate:\n$p")
  }

  test("tpch_q18: HAVING subquery becomes a join, never a per-row scan") {
    val p = plan("tpch_q18")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"IN-subquery must decorrelate:\n$p")
  }

  test("tpch_q2: correlated min-cost subquery decorrelates to an aggregate join") {
    val p = plan("tpch_q2")
    assert(!p.contains("CartesianProduct"),
      s"correlated min-cost scalar must decorrelate, never re-scan per row:\n$p")
    assert(p.contains("HashAggregate"), s"expected the per-part min aggregate:\n$p")
  }

  test("tpch_q20: nested IN + correlated availqty scalar decorrelates to joins") {
    val p = plan("tpch_q20")
    assert(!p.contains("CartesianProduct"),
      s"the deepest decorrelation shape in the suite must stay a join plan:\n$p")
    // the quantity scalar becomes a per-(part,supp) aggregate joined back
    assert(p.contains("HashAggregate"), s"expected the half-year quantity aggregate:\n$p")
  }

  test("tpch_q9: the 6-way star stays equi-join (no nested loop on the fact path)") {
    val p = plan("tpch_q9")
    assert(!p.contains("CartesianProduct"),
      s"q9's fact joins must stay equi (the partsupp generator's tiny " +
        s"cross-joined literals are fine, a fact-side cartesian is not):\n$p")
  }

  test("tpch_q12: derived-column filters stay above an equi join with map-side partial agg") {
    val p = plan("tpch_q12")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the orders⋈lineitemx join must stay equi:\n$p")
    assert(p.contains("partial_sum"),
      s"the priority split must partial-aggregate map-side:\n$p")
  }

  test("tpch_q21: EXISTS/NOT EXISTS decorrelate to semi + anti joins, never a per-row re-scan") {
    val p = plan("tpch_q21")
    assert(p.contains("LeftSemi"),
      s"the other-supplier EXISTS must become a semi join:\n$p")
    assert(p.contains("LeftAnti"),
      s"the no-other-late-supplier NOT EXISTS must become an anti join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q21's double correlation must stay hash-joinable (the supplier " +
        s"inequality rides as a join condition, not a nested loop):\n$p")
  }

  test("tpch_q22: the no-large-order anti-join and one shared scalar threshold") {
    val p = plan("tpch_q22")
    assert(p.contains("LeftAnti"),
      s"NOT EXISTS over orders must become an anti join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q22 must stay a join plan:\n$p")
  }
}
