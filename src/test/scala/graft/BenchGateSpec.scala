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
}
