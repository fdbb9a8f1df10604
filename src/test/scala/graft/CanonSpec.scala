package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Canon

/** Canon.round is the load-bearing determinism primitive: every oracle
  * query's doubles flow through it. These properties pin the exact IEEE
  * formula (`floor(x·10ⁿ + 0.5)/10ⁿ`) against a driver-side recompute on
  * generated doubles — the Column form and plain Scala must agree bitwise,
  * since that same formula is what the DuckDB SQL spells out.
  */
class CanonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def samples(n: Int): Seq[Double] = {
    val g = Gen.oneOf(
      Gen.choose(-1e6, 1e6),
      Gen.choose(-1.0, 1.0),
      // half-way-adjacent decimals, the known Spark-vs-DuckDB divergence zone
      Gen.choose(0, 2000000).map(i => i / 100.0 + 0.005))
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  }

  test("Column form equals the driver-side IEEE recompute, bit for bit") {
    import spark.implicits._
    val xs = samples(300)
    for (scale <- Seq(2, 4)) {
      val f = math.pow(10, scale)
      val got = xs.toDF("x").select(Canon.round(col("x"), scale)).collect()
        .map(_.getDouble(0))
      val want = xs.map(x => math.floor(x * f + 0.5) / f)
      got.zip(want).foreach { case (g, w) =>
        assert(java.lang.Double.doubleToRawLongBits(g) ==
          java.lang.Double.doubleToRawLongBits(w), s"mismatch: $g vs $w")
      }
    }
  }

  test("idempotent at the same scale; known divergence case is pinned") {
    import spark.implicits._
    val xs = samples(100)
    val once = xs.toDF("x").select(Canon.round(col("x"), 4).as("r")).collect()
      .map(_.getDouble(0))
    val twice = once.toSeq.toDF("x").select(Canon.round(col("x"), 4)).collect()
      .map(_.getDouble(0))
    assert(once.toSeq == twice.toSeq)
    // the double nearest 1222.745 is ...744999; Canon floors it to 1222.74
    // (what DuckDB's true-binary-value rounding sees), never 1222.75
    val v = Seq(1222.745).toDF("x").select(Canon.round(col("x"), 2)).collect()(0).getDouble(0)
    assert(v == 1222.74)
  }
}
