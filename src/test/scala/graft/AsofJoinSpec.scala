package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofLeft attaches the latest right row at-or-before the left time") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 200.0)
    ).toDF("qkey", "qtime", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:06:00"), "t1"), // between quote 2 and 3 → 101.0
      (1L, ts("2024-01-01 10:10:00"), "t2"), // exactly at quote 3 → inclusive → 102.0
      (1L, ts("2024-01-01 09:59:00"), "t3"), // before any quote → null
      (2L, ts("2024-01-01 10:08:00"), "t4"), // → 200.0
      (3L, ts("2024-01-01 10:08:00"), "t5")  // no quotes for key → null
    ).toDF("tkey", "ttime", "trade_id")

    val out = AsofJoin.asofLeft(
      trades, col("tkey"), col("ttime"),
      quotes, col("qkey"), col("qtime"),
      payload = Seq(col("qtime"), col("price")))
      .select(col("trade_id"), col("_asof.price").as("price"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    assert(out("t1") == Some(101.0))
    assert(out("t2") == Some(102.0)) // <= is inclusive
    assert(out("t3") == None)
    assert(out("t4") == Some(200.0))
    assert(out("t5") == None)
  }

  test("ties on right time break deterministically by the next payload field") {
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, "low"),
      (1L, ts("2024-01-01 10:00:00"), 9L, "high")
    ).toDF("k", "t", "id", "tag")
    val left = Seq((1L, ts("2024-01-01 10:01:00"), "x")).toDF("k2", "t2", "name")
    val out = AsofJoin.asofLeft(left, col("k2"), col("t2"),
      right, col("k"), col("t"),
      payload = Seq(col("t"), col("id"), col("tag")))
      .select(col("_asof.tag")).collect()(0).getString(0)
    assert(out == "high") // max struct → greatest id wins
  }
}
