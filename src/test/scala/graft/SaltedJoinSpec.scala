package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SaltedJoin

class SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join equals the plain join on skewed corpus data") {
    // lineitem is naturally skewed toward low orderkeys at tiny SF; join
    // against orders with 8 salts and compare to the direct join
    val l = Tables.lineitem(spark, TestSpark.sf0001)
    val o = Tables.orders(spark, TestSpark.sf0001).select("o_orderkey", "o_orderstatus")

    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val salted = SaltedJoin.saltedEquiJoin(
        l, col("l_orderkey"), o, col("o_orderkey"),
        salts = 8, uniquifier = col("l_linenumber"))
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(salted == plain)
  }

  test("salt values spread rows across the full salt range") {
    val l = Tables.lineitem(spark, TestSpark.sf0001)
    val distinctSalts = l
      .select(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(8)).as("s"))
      .distinct().count()
    assert(distinctSalts == 8)
  }
}
