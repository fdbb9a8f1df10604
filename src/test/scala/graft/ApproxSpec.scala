package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates — excluded from the oracle inventory by the
  * determinism rules (SURVEY §2.11 preamble: no approx operators, they
  * cannot hash-match a different engine's sketch), so verified here against
  * their exact counterparts with error bounds instead.
  */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_count_distinct within 5% of exact") {
    val l = Tables.lineitem(spark, TestSpark.sf0001)
    val exact = l.select(countDistinct(col("l_suppkey"))).collect()(0).getLong(0)
    val approx = l.select(approx_count_distinct(col("l_suppkey"), 0.02))
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx close to exact median") {
    val o = Tables.orders(spark, TestSpark.sf0001)
    val exact = o.select(expr("percentile(o_totalprice, 0.5)")).collect()(0).getDouble(0)
    val approx = o.select(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .collect()(0).getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }
}
