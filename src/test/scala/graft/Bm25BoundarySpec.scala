package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** ADVICE r13: tq_bm25's score includes ln(), the one non-correctly-rounded
  * IEEE op in the expression — Spark (Java StrictMath-adjacent libm) and
  * DuckDB (platform libm) may disagree by an ulp, so a raw score sitting
  * within an ulp of a 4-decimal floor boundary (`x·10⁴ + 0.5` crossing an
  * integer) could render a different 4th decimal per engine and flip both
  * the tq_bm25 hash and the tq_bm25_topk cut. The three-SF oracle runs pin
  * agreement only empirically; this spec pins it STRUCTURALLY: every raw
  * corpus score keeps a boundary margin ≥ 1e-6 in score·10⁴ units, i.e.
  * ≥ 1e-10 in raw-score units — five orders of magnitude above the ~1e-15
  * ulp of an O(1-10) double, and still orders above the few-ulp deltas
  * non-correctly-rounded libm ln() implementations actually produce — at
  * every SF, so no achievable cross-engine ln() difference can flip a
  * rendered score. Identical rounded scores also freeze the top-20 cut: both engines
  * order by (bm25 DESC, doc_id ASC), and equal rounded scores tie-break on
  * the unique key. If the corpus regenerates and this fails, the fix is a
  * different rounding scale or query-term set, not an epsilon bump.
  */
class Bm25BoundarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("every raw BM25 score keeps >=1e-6 margin to its 4-decimal floor boundary at all three SFs") {
    sfDirs.foreach { dir =>
      val raws = TextQueries.bm25Scored(spark, dir)
        .select("doc_id", "raw").collect()
      assert(raws.nonEmpty, s"$dir: no documents scored")
      val offenders = raws.flatMap { r =>
        val v = r.getDouble(1)
        val f = v * 10000d + 0.5
        val dist = math.min(f - math.floor(f), math.ceil(f) - f)
        if (dist <= 1e-6) Some((r.getLong(0), v, dist)) else None
      }
      assert(offenders.isEmpty,
        s"$dir: scores within 1e-6 of a rounding boundary (doc_id, raw, " +
          s"dist): ${offenders.take(5).mkString(", ")} — cross-engine ln() " +
          "ulp could flip the rendered 4th decimal")
    }
  }
}
