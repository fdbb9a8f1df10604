package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin
import graft.plans.AsofJoinNative

/** The native (LogicalPlan + Strategy + Exec) as-of join must agree with
  * the union+running-window idiom — two independent implementations of the
  * same semantics checking each other — and survive edge cases the merge
  * can get wrong (key changes, ties, null keys/times, unmatched keys).
  */
class AsofJoinNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = TestSpark.sf0001

  test("native as-of equals the union-window idiom on events x orders") {
    val e = Tables.events(spark, d).select("event_id", "user_id", "ts")
    val o = Tables.orders(spark, d)
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    val native = AsofJoinNative.asofLeft(
      e, "user_id", "ts", o, "o_custkey", "o_orderdate",
      rightTiebreakCol = Some("o_orderkey"))
      .select(col("event_id"), col("o_orderkey"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val idiom = AsofJoin.asofLeft(
      e, col("user_id"), col("ts"),
      o, col("o_custkey"), col("o_orderdate"),
      payload = Seq(col("o_orderdate"), col("o_orderkey"), col("o_totalprice")))
      .select(col("event_id"), col("_asof.o_orderkey"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(native.size == idiom.size)
    val diffs = native.collect { case (k, v) if idiom(k) != v => (k, v, idiom(k)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
  }

  test("crafted edges: unmatched keys, exact-tie inclusivity, null key/time") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L),  // key 10: right rows at 50, 100 → match t=100 (inclusive)
      (2L, 10L, 99L),   // → match t=50
      (3L, 10L, 49L),   // → no right row yet → null
      (4L, 20L, 500L),  // key 20 has no right rows → null
      (5L, 30L, 500L)   // key 30: right at 400 → match
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, 50L, 7L), (10L, 100L, 8L), (30L, 400L, 9L)
    ).toDF("rk", "rt", "payload")
    val got = AsofJoinNative.asofLeft(left, "k", "t", right, "rk", "rt")
      .select(col("id"), col("payload"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 8L, 2L -> 7L, 3L -> -1L, 4L -> -1L, 5L -> 9L))
  }

  test("equal-time ties resolve to the max tiebreak, matching struct-max semantics") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
    val right = Seq((10L, 100L, 1L), (10L, 100L, 3L), (10L, 100L, 2L))
      .toDF("rk", "rt", "tb")
    val got = AsofJoinNative.asofLeft(left, "k", "t", right, "rk", "rt",
      rightTiebreakCol = Some("tb"))
      .select("tb").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("null left keys and times yield null matches, not crashes or cross-matches") {
    val left = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, null, java.lang.Long.valueOf(100L)),
        org.apache.spark.sql.Row(2L, java.lang.Long.valueOf(10L), null),
        org.apache.spark.sql.Row(3L, java.lang.Long.valueOf(10L), java.lang.Long.valueOf(100L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType, true),
        org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.LongType, true))))
    val right = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(java.lang.Long.valueOf(10L), java.lang.Long.valueOf(50L), 7L),
        org.apache.spark.sql.Row(null, java.lang.Long.valueOf(50L), 8L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rk", org.apache.spark.sql.types.LongType, true),
        org.apache.spark.sql.types.StructField("rt", org.apache.spark.sql.types.LongType, true),
        org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.LongType, false))))
    val got = AsofJoinNative.asofLeft(left, "k", "t", right, "rk", "rt")
      .select("id", "p").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> -1L, 2L -> -1L, 3L -> 7L))
  }

  test("tolerance: matches farther than the bound become NULL, others unchanged") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, d).select("event_id", "user_id", "ts")
    val o = Tables.orders(spark, d)
      .select("o_custkey", "o_orderdate", "o_orderkey")
    val tolMicros = 30L * 86400L * 1000000L
    val got = AsofJoinNative.asofLeft(e, "user_id", "ts", o,
      "o_custkey", "o_orderdate", rightTiebreakCol = Some("o_orderkey"),
      toleranceUnits = Some(tolMicros))
      .select(col("event_id"), col("o_orderkey"))
    // window-idiom reference with the same bound
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").desc_nulls_last, col("o_orderkey").desc_nulls_last)
    val want = e.join(o,
        col("o_custkey") === col("user_id") && col("o_orderdate") <= col("ts") &&
          col("o_orderdate") >= col("ts") - expr("INTERVAL 30 DAY"), "left")
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("event_id"), col("o_orderkey"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the bound must actually bite: strictly fewer matches than unbounded
    val unbounded = AsofJoinNative.asofLeft(e, "user_id", "ts", o,
      "o_custkey", "o_orderdate", rightTiebreakCol = Some("o_orderkey"))
      .where(col("o_orderkey").isNotNull).count()
    assert(got.where(col("o_orderkey").isNotNull).count() < unbounded)
  }

  test("plan shape: one AsofJoinExec, hash exchanges both sides") {
    val e = Tables.events(spark, d).select("event_id", "user_id", "ts")
    val o = Tables.orders(spark, d).select("o_custkey", "o_orderdate", "o_orderkey")
    val df = AsofJoinNative.asofLeft(e, "user_id", "ts", o, "o_custkey", "o_orderdate")
    val p = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(p.contains("AsofJoin "), s"no AsofJoin node in:\n$p")
    assert(p.contains("Exchange hashpartitioning(user_id"), s"left not hash-partitioned:\n$p")
    assert(p.contains("Exchange hashpartitioning(o_custkey"), s"right not hash-partitioned:\n$p")
    // column pruning must reach both scans despite the opaque custom node
    assert(!p.contains("o_totalprice"), s"unpruned right scan:\n$p")
  }
}
