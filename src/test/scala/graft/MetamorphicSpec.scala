package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, struct, xxhash64}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QueryCatalog

/** Metamorphic tier: every declared query must be INVARIANT under an
  * adversarial permutation + repartitioning of its input corpus. At 100 TB
  * the row order a scan delivers is an accident of file layout, split
  * planning, and scheduling — an operator whose answer depends on it is
  * wrong at scale even if it hash-matches the oracle on the original file
  * layout. The §2.11 determinism contract (total ORDER BY, order-exact
  * folds) is exactly the property under test, now tested from the input
  * side rather than the output side.
  *
  * The fixture rewrites every corpus table content-hash-partitioned into a
  * different file count, which permutes both the row order within files and
  * the file/partition assignment. Results are compared as exact row LISTS
  * (the contract says output order is pinned), not multisets.
  */
class MetamorphicSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val shuffledDir: String = {
    val dir = Files.createTempDirectory("graft_shuffled").toString
    Tables.all.foreach { t =>
      val df = spark.read.parquet(s"${TestSpark.sf0001}/$t.parquet")
      // content-hash repartition into a coprime file count: thorough
      // permutation of row→file assignment and within-file order
      df.repartition(7, xxhash64(struct(df.columns.map(col): _*)))
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** Exclusions, each with the reason on record. Everything else in the
    * catalog — including the no-oracle hash/sketch/ANN entries — must be
    * input-order invariant.
    */
  val excluded: Map[String, String] = Map(
    "r13_ingest_report" -> ("side-effectful drop-dir lifecycle demo (builds " +
      "its own fixture dir, doesn't read the corpus tables); gated by " +
      "IngestSpec + LifecycleSpec + its own oracle entry"),
    "a18_approx_percentile" -> ("KLL-style sketch: estimates are partition/" +
      "merge-order dependent BY DESIGN (the trade for fixed memory), so " +
      "bit-equality is the wrong invariant — the bounded-error test below " +
      "asserts the rank-error bound holds under permutation instead"))

  QueryCatalog.all.filterNot(q => excluded.contains(q.name)).foreach { q =>
    test(s"${q.name}: invariant under corpus permutation + repartition") {
      val a = q.build(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = q.build(spark, shuffledDir).collect().map(_.toString).toSeq
      assert(a.length == b.length,
        s"row count changed under permutation: ${a.length} vs ${b.length}")
      assert(a == b, {
        val diff = a.zip(b).zipWithIndex.collectFirst {
          case ((x, y), i) if x != y => s"first diff at $i:\n  orig: $x\n  perm: $y"
        }
        s"rows changed under permutation; ${diff.getOrElse("")}"
      })
    }
  }

  test("a18_approx_percentile: rank-error bound holds under permutation") {
    // The sketch's merge tree changes with partitioning, so the ESTIMATE
    // moves (observed: p50 of one group drifting ~0.2%); the operator's
    // contract is the rank-error bound (±n/accuracy), and THAT must hold on
    // every layout. Exact reference ranks come from the original corpus —
    // content is identical, so they apply to both layouts.
    val q = QueryCatalog.byName("a18_approx_percentile")
    val byFlag = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getDouble(1)).sorted }
    for (dir <- Seq(TestSpark.sf0001, shuffledDir)) {
      q.build(spark, dir).collect().foreach { r =>
        val vals = byFlag(r.getString(0))
        val n = vals.length
        val tol = math.max(2, n / 1000) // accuracy=1000 → ±n/1000 ranks
        Seq(0.5, 0.9, 0.99).zipWithIndex.foreach { case (p, i) =>
          val est = r.getDouble(i + 1)
          val target = math.ceil(p * n).toInt - 1
          val lo = vals(math.max(0, target - tol))
          val hi = vals(math.min(n - 1, target + tol))
          assert(est >= lo && est <= hi,
            s"dir=$dir flag=${r.getString(0)} p=$p: estimate $est outside " +
              s"rank window [$lo, $hi] (target rank $target ± $tol of $n)")
        }
      }
    }
  }
}
