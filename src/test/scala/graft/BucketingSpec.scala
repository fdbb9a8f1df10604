package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-posture proof (SURVEY §7 / README): bucketing both fact tables on
  * the join key removes the join shuffle entirely — the claim made in the
  * j1 scaladoc, demonstrated on real corpus data.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join between tables bucketed on the key plans with no shuffle") {
    Tables.lineitem(spark, TestSpark.sf0001)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    Tables.orders(spark, TestSpark.sf0001)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()

    joined.collect() // force execution so the final plan is adaptive-final
    val plan = joined.queryExecution.executedPlan.toString
    // the only exchange allowed is the tiny post-aggregation one; the join
    // itself must read co-located buckets
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"join input was shuffled:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"join input was shuffled:\n$plan")

    // and the result is correct vs the unbucketed join
    val expect = Tables.lineitem(spark, TestSpark.sf0001)
      .join(Tables.orders(spark, TestSpark.sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }
}
