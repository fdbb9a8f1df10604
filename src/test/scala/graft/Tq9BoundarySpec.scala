package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** tq_unigram_llk quantizes ln(vocab count) to integer micro-nats with
  * floor(ln(cnt)·1e6): ln() is the one non-correctly-rounded IEEE op in
  * the query, so if ln(cnt)·1e6 sat within an ulp of an integer the two
  * engines could floor to DIFFERENT micro-nat values and every document
  * containing that token would hash-mismatch. This spec pins the margin
  * STRUCTURALLY (the Bm25BoundarySpec technique): for every DISTINCT
  * vocabulary count and the corpus total at every SF, the distance from
  * ln(c)·1e6 to the nearest integer is ≥ 1e-6 — in micro-nat units, i.e.
  * ≥ 1e-12 in raw nats, while a few-ulp libm ln() disagreement on an
  * O(1-13) input is ~1e-15..1e-14 nats (~1e-9..1e-8 after the 1e6 scale;
  * the 1e-6 margin sits two+ orders above it and the achievable min gap
  * over a few-thousand-value count set is ~1e-4). The final per-doc
  * average needs no pin: it divides two exact integers with the same op
  * sequence in both engines — correctly-rounded IEEE on identical bits.
  * If the corpus regenerates and this fails, change the quantization
  * scale, not the epsilon.
  */
class Tq9BoundarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("every distinct vocab count's ln(c)*1e6 keeps >=1e-6 margin to an integer at all three SFs") {
    sfDirs.foreach { dir =>
      val counts = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .groupBy("cnt").agg(sum(col("cnt")).as("contrib"))
        .collect()
      assert(counts.nonEmpty, s"$dir: empty vocabulary")
      val total = counts.map(_.getLong(1)).sum
      val values = counts.map(_.getLong(0)) :+ total
      val offenders = values.flatMap { c =>
        val x = math.log(c.toDouble) * 1e6
        val dist = math.min(x - math.floor(x), math.ceil(x) - x)
        // c == 1 → ln = exactly 0.0, ON the boundary but exact in every
        // IEEE implementation (ln(1) = 0 is required to be exact), so a
        // floor flip is impossible — excluded from the margin check.
        if (c != 1L && dist <= 1e-6) Some((c, x, dist)) else None
      }
      assert(offenders.isEmpty,
        s"$dir: vocab counts whose ln(c)*1e6 sits within 1e-6 of an " +
          s"integer (c, scaled, dist): ${offenders.take(5).mkString(", ")}")
    }
  }
}
