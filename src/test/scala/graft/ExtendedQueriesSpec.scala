package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QueryCatalog

/** Semantic checks for the round-3 extended suite (ExtendedQueries). The
  * oracle covers exact results at sf0.01; these assert the properties the
  * oracle can't (HLL error bound, determinism across reruns, reshape
  * row-count identities) at sf0.001.
  */
class ExtendedQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = TestSpark.sf0001

  private def run(name: String) = QueryCatalog.byName(name).build(spark, d)

  test("o3_pivot: one row per status, counts sum to orders total") {
    val rows = run("o3_pivot").collect()
    val orders = Tables.orders(spark, d).count()
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    val total = rows.map(r => (1 to 5).map(r.getLong).sum).sum
    assert(total == orders)
  }

  test("o4_unpivot: exactly 3 rows per lineitem row") {
    assert(run("o4_unpivot").count() == 3 * Tables.lineitem(spark, d).count())
  }

  test("a7_percentile: p50 <= p90 and both within column min/max") {
    val li = Tables.lineitem(spark, d)
      .agg(min("l_extendedprice"), max("l_extendedprice")).collect()(0)
    val (lo, hi) = (li.getDouble(0), li.getDouble(1))
    run("a7_percentile").collect().foreach { r =>
      val (p50, p90) = (r.getDouble(1), r.getDouble(2))
      assert(p50 <= p90 && p50 >= lo && p90 <= hi)
    }
  }

  test("w4_ntile_distribution: quartile in 1..4, cume_dist in (0,1], monotone per customer") {
    val rows = run("w4_ntile_distribution").collect()
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 4))
    assert(rows.forall(r => r.getDouble(4) > 0 && r.getDouble(4) <= 1.0))
  }

  test("f13_posexplode: positions are 1..n_tokens per part") {
    val byPart = run("f13_posexplode").collect().groupBy(_.getLong(0))
    byPart.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("x7_train_val_split: splits partition the corpus and are rerun-stable") {
    val a = run("x7_train_val_split").collect()
    val b = run("x7_train_val_split").collect()
    assert(a.toSeq == b.toSeq)
    val totalDocs = a.map(_.getLong(2)).sum
    assert(totalDocs == Tables.documents(spark, d).count())
    assert(a.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("x8_stratified_sample: at most 20 per language, rn dense from 1") {
    val byLang = run("x8_stratified_sample").collect().groupBy(_.getString(0))
    byLang.values.foreach { rows =>
      assert(rows.length <= 20)
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("a8_approx_distinct: HLL estimate within 5% of exact") {
    val exact = Tables.lineitem(spark, d)
      .groupBy("l_returnflag").agg(countDistinct(col("l_suppkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    run("a8_approx_distinct").collect().foreach { r =>
      val (flag, approx) = (r.getString(0), r.getLong(1))
      assert(math.abs(approx - exact(flag)).toDouble / exact(flag) < 0.05,
        s"approx=$approx exact=${exact(flag)} for $flag")
    }
  }
}
