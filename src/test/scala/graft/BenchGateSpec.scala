package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench committed-baseline resample gate (r15 verdict #5): the
  * artifact parser and the over-baseline trigger are pure functions, so a
  * regression here (a format drift silently emptying the baseline map, or
  * a flipped threshold) would otherwise only surface as rotating bench
  * flags two rounds later.
  */
class BenchGateSpec extends AnyFunSuite {

  test("parseBaseline reads the one-line artifact format and drops failed runs") {
    val line =
      """{"metric":"total_query_sec","value":1.5,"unit":"sec","queries":{"q1_agg":0.123,"fz29001":1.000,"bad_run":-1.000},"sf":"/x","runs":2,"n_queries":3}"""
    val m = Bench.parseBaseline(line)
    assert(m == Map("q1_agg" -> 0.123, "fz29001" -> 1.0),
      "failed (-1) runs must be dropped; values must parse exactly")
  }

  test("parseBaseline is empty on missing/garbled queries object") {
    assert(Bench.parseBaseline("").isEmpty)
    assert(Bench.parseBaseline("""{"metric":"x","value":1}""").isEmpty)
    // a BENCH_BASELINE written by this repo's ratchet script parses too
    val ratchet =
      """{"metric":"total_query_sec","value":2.0,"unit":"sec","queries":{"a":0.100,"b":1.900},"sf":"/x","runs":"baseline (per-query committed minima, r16)","n_queries":2}"""
    assert(Bench.parseBaseline(ratchet).size == 2)
  }

  test("parseBaseline skips malformed numeric tokens instead of aborting") {
    // a hand-edited/corrupted file: "1.2.3" and "." must not throw
    // NumberFormatException and must not poison the parsable entries
    // (r16 ADVICE: degrade to partial-gate, same philosophy as no-file)
    val corrupted =
      """{"queries":{"good":0.500,"bad1":1.2.3,"bad2":.,"good2":1.000}}"""
    val m = Bench.parseBaseline(corrupted)
    assert(m.get("good").contains(0.5))
    assert(m.get("good2").contains(1.0))
    assert(!m.contains("bad1") && !m.contains("bad2"))
  }

  test("rotatedNamed names resolve in the catalog (rotation must not typo a name)") {
    val catalog = graft.queries.QueryCatalog.all.map(_.name).toSet
    Bench.rotatedNamed.foreach { n =>
      assert(catalog.contains(n), s"rotatedNamed entry $n is not a catalog query")
    }
  }

  test("overBaseline: 2x threshold with the 0.15 s noise floor") {
    // no baseline -> never triggers
    assert(!Bench.overBaseline(None, 99.0))
    // above 2x and above the floor -> triggers
    assert(Bench.overBaseline(Some(1.0), 2.01))
    assert(!Bench.overBaseline(Some(1.0), 1.99))
    // sub-noise baselines: 0.05 s committed, 0.11 s measured is jitter,
    // not a flag (the floor), but 0.16 s is
    assert(!Bench.overBaseline(Some(0.05), 0.11))
    assert(Bench.overBaseline(Some(0.05), 0.16))
    // boundary: exactly at the threshold does not trigger (strict >)
    assert(!Bench.overBaseline(Some(1.0), 2.0))
    assert(!Bench.overBaseline(Some(0.05), 0.15))
  }

  test("overBaseline with ambient factor: hot-window normalization widens the gate") {
    // r17: the driver window ran at a 1.42x median ratio; a 2.3x raw read
    // is ~1.6x ambient-normalized and must NOT flag
    assert(Bench.overBaseline(Some(1.0), 2.3))
    assert(!Bench.overBaseline(Some(1.0), 2.3, ambient = 1.42))
    // a genuine 3x regression still flags through a 1.42x-hot window
    assert(Bench.overBaseline(Some(1.0), 3.0, ambient = 1.42))
    // ambient 1.0 is exactly the raw rule
    assert(Bench.overBaseline(Some(1.0), 2.01, ambient = 1.0))
  }

  test("ambientFactor: median of ratios, clamped to >= 1") {
    assert(Bench.ambientFactor(Nil) == 1.0)
    // odd count -> middle element
    assert(Bench.ambientFactor(Seq(1.0, 1.42, 3.0)) == 1.42)
    // even count -> mean of the middle two (float-tolerant compare)
    assert(math.abs(Bench.ambientFactor(Seq(1.0, 1.2, 1.4, 9.0)) - 1.3) < 1e-9)
    // a FAST window must not tighten the gate below the raw 2x contract
    assert(Bench.ambientFactor(Seq(0.5, 0.6, 0.7)) == 1.0)
    // one outlier regression cannot move the median of a wide window
    assert(Bench.ambientFactor(Seq.fill(100)(1.05) :+ 50.0) == 1.05)
  }

  test("noisySpread: baseline-less entries escalate at any magnitude (r19 verdict #6)") {
    // the fz31017 class: a NEW entry whose draws spike on co-load — the
    // old `best < 1.0` scope left a 16.3 s first draw un-resampled exactly
    // because it was huge; magnitude no longer matters
    assert(Bench.noisySpread(hasBaseline = false, best = 9.0, worst = 16.3))
    assert(Bench.noisySpread(hasBaseline = false, best = 0.1, worst = 0.2))
    // a tight spread does not escalate (nothing to resample toward)
    assert(!Bench.noisySpread(hasBaseline = false, best = 9.0, worst = 10.0))
    // gated entries never escalate in place: the warm requeue owns them
    assert(!Bench.noisySpread(hasBaseline = true, best = 9.0, worst = 16.3))
  }

  test("capRequeue: admits in order while estimated cost fits, skips + flags the tail") {
    val over = Seq("a" -> 10.0, "b" -> 20.0, "c" -> 5.0, "d" -> 1.0)
    // budget 70: a(20) + b(40) fit (60 used); c(10) would hit exactly 70 -> fits; d(2) over
    val (run, skip) = Bench.capRequeue(over, budgetSec = 70.0)
    assert(run == Seq("a", "b", "c") && skip == Seq("d"))
    // zero/negative remaining budget skips everything (hard bound, not a hint)
    assert(Bench.capRequeue(over, 0.0)._1.isEmpty)
    assert(Bench.capRequeue(over, -5.0)._1.isEmpty)
    // a single entry larger than the whole budget is skipped, not run-anyway
    val (r2, s2) = Bench.capRequeue(Seq("huge" -> 100.0, "tiny" -> 0.1), 10.0)
    assert(r2 == Seq("tiny") && s2 == Seq("huge"))
    // failed first-pass entries (best < 0) cost 0 and always admit
    assert(Bench.capRequeue(Seq("failed" -> -1.0), 0.0)._1 == Seq("failed"))
  }
}
