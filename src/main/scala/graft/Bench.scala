package graft

import org.apache.spark.sql.SparkSession

import graft.queries.QueryCatalog

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Runs every declared query on SPARK_GRAFT_SF_DIR with a full materialize
  * (noop sink — forces all columns/rows through the plan, unlike count()
  * which lets Catalyst prune the world), prints ONE JSON line.
  *
  * Since round 3 each query is timed as the MIN of two back-to-back runs:
  * the first run absorbs plan compilation + codegen of that query's
  * operators (~0.1-0.3 s of driver-side one-time cost per query, which at
  * sf0.1 rivals the execution itself); min-of-2 measures the steady-state
  * execution a throughput comparison is about. Noted in BASELINE.md.
  *
  * Knobs (all env, all optional):
  *  - SPARK_GRAFT_BENCH_RUNS: runs per query, timing = min (default 2)
  *  - SPARK_GRAFT_BENCH_QUERIES: comma-separated name filter (default all)
  *  - SPARK_GRAFT_BENCH_ALL=1: include the soak-only-rotated v1-v15 fuzz
  *    slices and the rotated named baselines in the timed window (see
  *    FuzzQueries.soakOnlySeeds / Bench.rotatedNamed)
  *  - SPARK_GRAFT_BENCH_OUT: path for the COMPLETE per-query JSON artifact
  *    (default BENCH_FULL.json in the cwd; empty string disables). The
  *    driver's capture truncates long stdout lines, so the file is the
  *    durable full record for round-over-round comparison.
  *  - SPARK_GRAFT_BENCH_BASELINE: path to the committed per-query baseline.
  *    When set it is used EXCLUSIVELY — unreadable = no gate with the
  *    attempted path recorded (ADVICE r17); BENCH_BASELINE.json in the cwd
  *    applies only when unset. Any query whose measured min still exceeds
  *    max(2x committed, 0.15 s) after the first pass is RE-QUEUED at the
  *    END of the window (min-of-2 per pass, up to two passes) — at
  *    end-of-window warmth, the same state the committed minima were
  *    measured at. (r15 verdict #5 asked for baseline-triggered
  *    resampling; r16/r17 evidence moved it to the window end: in-place
  *    resamples run as cold as the samples they re-check, so they burned
  *    ~300 s on a slow-ambient window while clearing nothing a warm
  *    requeue wouldn't.)
  *  - SPARK_GRAFT_BENCH_REQUEUE_BUDGET: wall-clock cap in seconds on the
  *    requeue passes (default 120); over-budget entries are skipped and
  *    flagged in gate.requeue_skipped rather than run long (r17 verdict #7).
  *
  * Gate auditability (r16 verdict #1): the artifact records, per query,
  * how many samples were actually taken ("samples"), plus a "gate" object
  * with whether the baseline file was found, how many entries it carried,
  * the window's ambient factor (median measured/committed ratio — r17
  * verdict #1: a hot evening window must not mint false weak marks, so
  * still_over flags on the ambient-NORMALIZED ratio while still_over_raw
  * keeps the raw 2x set for audit), the requeue wall-time spent vs its
  * budget, which queries took noisy-spread resamples, which were
  * re-queued for the end-of-window warm passes, and which were skipped by
  * the budget cap — so "gate ran and lost to sustained co-load" is
  * distinguishable from "gate never engaged".
  */
object Bench {

  /** Parse the committed per-query baseline out of a BENCH artifact line.
    * A two-regex scan instead of a JSON library: the artifact is
    * machine-written on one line with "name":1.234 pairs inside a flat
    * "queries" object, and build.sbt deliberately adds no dependencies
    * beyond Spark. Non-positive entries (failed runs) are dropped, and a
    * malformed numeric token ("1.2.3", "." — a hand-edited/corrupted
    * file) is skipped rather than aborting the whole bench run: the
    * missing-file = no-gate philosophy extends to unparsable entries.
    */
  def parseBaseline(txt: String): Map[String, Double] = {
    val qs = """"queries"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
    """"([A-Za-z0-9_]+)"\s*:\s*(-?[0-9.]+)""".r.findAllMatchIn(qs)
      .flatMap { m =>
        scala.util.Try(m.group(2).toDouble).toOption.map(m.group(1) -> _)
      }
      .filter(_._2 > 0).toMap
  }

  /** The committed-baseline resample trigger (r15 verdict #5): a measured
    * min still above max(2 x committed x ambient, 0.15 s) buys the extra
    * samples. The 0.15 s floor keeps sub-noise baselines (a 0.05 s query
    * reading 0.11 s) from burning runs on pure jitter. `ambient` (default
    * 1 = the raw rule) is the window's global-load factor — see
    * ambientFactor below.
    */
  def overBaseline(baseline: Option[Double], best: Double,
                   ambient: Double = 1.0): Boolean =
    baseline.exists(b => best > math.max(2 * b * ambient, 0.15))

  /** Window ambient factor (r17 verdict #1): the MEDIAN of measured/
    * committed ratios across every gated entry in the window, clamped to
    * >= 1. The r17 driver window ran at a 1.42x median — global co-load,
    * not regression — and the fixed raw-2x rule converted that into five
    * false weak marks (all of r16's flags had likewise cleared idle at
    * <= 1.22x). A genuine single-query regression cannot move the median
    * of ~700 entries, so flagging on the ambient-NORMALIZED ratio keeps
    * the gate's sensitivity to real plan regressions while ignoring
    * evening-hot environments. The clamp means a fast window never
    * tightens the gate below the raw 2x contract. The raw still_over set
    * stays in the artifact (still_over_raw) for the hand audit.
    */
  def ambientFactor(ratios: Seq[Double]): Double =
    if (ratios.isEmpty) 1.0
    else {
      val s = ratios.sorted
      val mid = s.size / 2
      val median = if (s.size % 2 == 1) s(mid) else (s(mid - 1) + s(mid)) / 2
      math.max(1.0, median)
    }

  /** Requeue budget cap (r17 verdict #7): admit over-baseline entries into
    * a warm-requeue pass, worst ratio first, while the cumulative ESTIMATED
    * cost (runsPerPass x the entry's current best) fits the remaining
    * budget; the tail is skipped and flagged rather than run long. Without
    * this, a pathological all-hot window's worst case is ~4x the base
    * window (2 passes x min-of-2 over every entry) with nothing recorded.
    * Entries whose estimate alone exceeds the whole budget are skipped,
    * not run-anyway — the cap is a hard bound, not a hint.
    */
  def capRequeue(over: Seq[(String, Double)], budgetSec: Double,
                 runsPerPass: Int = 2): (Seq[String], Seq[String]) = {
    var used = 0.0
    val run = Seq.newBuilder[String]
    val skip = Seq.newBuilder[String]
    over.foreach { case (n, best) =>
      val cost = runsPerPass * math.max(best, 0.0)
      if (used + cost <= budgetSec) { used += cost; run += n } else skip += n
    }
    (run.result(), skip.result())
  }

  /** Noisy-spread escalation for BASELINE-LESS entries (their first
    * committed number has no requeue protection, so it must not be a
    * single co-loaded draw). r19 (verdict #6): the old `best < 1.0`
    * magnitude scope is gone — fz31017's 16.3 s co-load draw (0.97 s in
    * every other window) sat outside it exactly because it was huge.
    * Gated entries never escalate in place; the warm requeue owns them.
    */
  def noisySpread(hasBaseline: Boolean, best: Double, worst: Double): Boolean =
    !hasBaseline && worst > 1.5 * best

  /** Named catalog entries rotated OUT of the default bench window
    * (r16 verdict #4 — cap named-suite growth by rotating superseded /
    * verification-baseline forms). Rotation affects the BENCH artifact
    * only: both still run through Verify, the driver oracle, and their
    * ScalaTest specs every round.
    *  - dd_ngram_jaccard: the deliberate O(n²) exact all-pairs
    *    VERIFICATION baseline (DedupQueries.scala doctrine); the
    *    production path dd_cluster_lsh stays timed.
    *  - sim_ann_ivf: single-level IVF, superseded as the benched scale
    *    path by sim_ann_ivf2 (two-level, the form that survives
    *    SemDeDup-scale cell counts); its adaptive-probing recall floor
    *    stays spec-gated in AnnSpec.
    *  - j7_asof_join / j7c / j7d / j7e (r17 verdict #8): the composed
    *    as-of form and the tolerance/forward/nearest direction variants
    *    share one union-window plan shape; the production native-exec
    *    path j7b_asof_native stays timed for all of them. Semantics stay
    *    pinned by AsofJoinSpec/AsofJoinNativeSpec + the driver oracle.
    */
  val rotatedNamed: Set[String] = Set("dd_ngram_jaccard", "sim_ann_ivf",
    "j7_asof_join", "j7c_asof_tolerance", "j7d_asof_forward", "j7e_asof_nearest")

  /** One query's measurement: the min, how many samples produced it,
    * whether the noisy-spread rule escalated the first pass, and whether
    * the committed-baseline gate requeued it.
    */
  final case class Timing(best: Double, samples: Int, gated: Boolean,
                          noisy: Boolean = false)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    val filter = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    // Committed per-query baselines (same JSON shape as the artifact this
    // main writes); missing file = no gate. When SPARK_GRAFT_BENCH_BASELINE
    // is set it is used EXCLUSIVELY (ADVICE r17): an unreadable explicit
    // path must mean no gate with the attempted path recorded, not a
    // silent fall-through to the cwd default — that would gate against a
    // DIFFERENT checkout's minima while the artifact claimed
    // baseline_found=true, the exact silent-alias failure the no-absolute-
    // fallback rule already bars. BENCH_BASELINE.json applies only when
    // the env var is unset.
    val baselinePath: java.nio.file.Path = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "BENCH_BASELINE.json"))
    val baseline: Map[String, Double] =
      if (java.nio.file.Files.isReadable(baselinePath))
        parseBaseline(new String(
          java.nio.file.Files.readAllBytes(baselinePath),
          java.nio.charset.StandardCharsets.UTF_8))
      else Map.empty
    val spark = GraftSession.getOrCreate("graft-bench")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        QueryCatalog.byName(name).build(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
    }

    def runBest(name: String): Timing = {
      val first = runOnce(name)
      if (first < 0) return Timing(first, 1, gated = false)
      var best = first
      var worst = first
      var n = 1
      // `runs` (default 2) samples always. The r12-era noisy-spread rule
      // (sub-second query, max > 1.5×min → up to 5 samples) now applies
      // ONLY to queries with no committed baseline: for the gated
      // catalog, the end-of-window warm requeue supersedes it — a noisy
      // sample that matters (one pushing the min over 2x committed) gets
      // re-measured warm anyway, and one that doesn't flag nothing. At a
      // noisy-ambient window the rule was escalating ~300 sub-second
      // queries x 3 runs (~150-250 s) for protection the gate already
      // provides; baseline-less entries (brand-new queries before their
      // first ratchet) keep it so their first committed number is not a
      // single co-loaded draw.
      // NOTE (r17): the committed-baseline trigger deliberately does NOT
      // escalate in place either. In-place resamples run at the same
      // warmth/ambient state as the samples they re-check, which made
      // them expensive AND ineffective: the r16 driver window's
      // f8_math_funcs survived five in-place resamples at 4.9x (cold
      // draw), while the first gated r17 window burned ~300 s escalating
      // 285 sub-second queries a slow-ambient evening had pushed just
      // past their thresholds. Over-baseline queries are handled by the
      // END-of-window requeue loop below, where the JVM is at the same
      // full-window warmth the committed minima were measured at.
      // r19 (verdict #6): the decision lives in Bench.noisySpread — see
      // its doc for why the old `best < 1.0` magnitude scope is gone.
      var noisy = false
      def target: Int =
        if (noisySpread(baseline.get(name).isDefined, best, worst)) {
          noisy = true; math.max(runs, 5)
        } else runs
      while (n < target) {
        val t = runOnce(name)
        if (t >= 0) { best = math.min(best, t); worst = math.max(worst, t) }
        n += 1
      }
      Timing(best, n, gated = false, noisy = noisy)
    }

    // Bench-budget rotation (BASELINE r15-r17 policy): the v1-v15 fuzz
    // slices and the rotatedNamed baselines are timed only under an
    // explicit filter or SPARK_GRAFT_BENCH_ALL=1; their correctness
    // coverage (Verify + driver oracle + pins + soaks) is untouched —
    // this trims the per-round bench window only.
    // fzst streaming-dedup entries are correctness-tier only (r18): their
    // wall time is MemoryStream microbatch latency + a driver-side
    // delivery harness (7-28 s each at sf0.1), not engine throughput —
    // timing them would charge ~2 min of harness cost against the
    // 15-minute window while measuring nothing the plan controls. They
    // run through Verify + the driver oracle every round.
    val rotated: Set[String] =
      if (filter.isDefined || sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
        Set.empty
      else graft.queries.FuzzQueries.soakOnlySeeds.map("fz" + _).toSet ++
        graft.queries.StreamFuzzQueries.declaredSeedsSt.map("fzst" + _).toSet ++
        graft.queries.StreamFuzzQueries.declaredSeedsSw.map("fzsw" + _).toSet ++
        rotatedNamed
    val names = QueryCatalog.all.map(_.name)
      .filter(n => filter.forall(_.contains(n)))
      .filterNot(rotated)
    // JVM/codegen warmup on a representative query (parquet scan + shuffle
    // join) so the first measured query doesn't absorb classloading costs.
    runOnce("j1_join_inner")

    // Randomized execution order (r14 verdict #2): ambient co-load at
    // window start used to concentrate >2× flags on whatever ran FIRST in
    // catalog order, minting a fresh rotating flag set every round. A
    // per-window shuffle spreads that load across different names each
    // run; the artifact itself is keyed by name, so order never affected
    // comparability. Results are emitted in catalog order for stable diffs.
    val order = new scala.util.Random(System.nanoTime()).shuffle(names)
    val firstPass = order.map(n => n -> runBest(n)).toMap
    // End-of-window requeue loop (r17, from the r16 weak-mark idle
    // audit): the committed minima come from fully-warmed 800-query
    // windows, so a query drawn EARLY in the shuffled order can read 2x
    // "over" purely from shared-JIT cold state — and in-place resamples
    // are just as cold (f8_math_funcs survived five of them at 4.9x in
    // r16, then cleared a min-of-10 idle audit at 1.06x). Anything still
    // over its committed number re-measures HERE, at full end-of-window
    // warmth, min-of-2 per pass, up to two passes (the second pass exists
    // for a transient co-load burst spanning the first). A query still
    // over after that is a genuine regression or sustained co-load, not
    // a cold draw — it stays in still_over for the hand audit. Cost:
    // 2 runs x only the over set, which at normal ambient is a handful.
    var timed = firstPass
    val requeued = scala.collection.mutable.LinkedHashSet.empty[String]
    val requeueSkipped = scala.collection.mutable.LinkedHashSet.empty[String]
    // Requeue budget (r17 verdict #7): hard wall-clock bound on the warm
    // passes — estimate-admitted worst-first, remainder skipped + flagged.
    val requeueBudget = sys.env.getOrElse("SPARK_GRAFT_BENCH_REQUEUE_BUDGET", "120").toDouble
    val requeueT0 = System.nanoTime()
    def requeueElapsed: Double = (System.nanoTime() - requeueT0) / 1e9
    (1 to 2).foreach { _ =>
      val over = names.flatMap { k =>
        val t = timed(k)
        if (t.best >= 0 && overBaseline(baseline.get(k), t.best))
          Some(k -> t.best) else None
      }
      // worst committed-ratio first: if the budget cuts, it cuts the
      // entries already closest to clearing
      val byRatio = over.sortBy { case (k, best) => -(best / baseline(k)) }
      val (toRun, skipped) = capRequeue(byRatio, requeueBudget - requeueElapsed)
      requeueSkipped ++= skipped
      requeued ++= toRun
      timed = timed ++ toRun.map { k =>
        val t = timed(k)
        val extra = Seq(runOnce(k), runOnce(k)).filter(_ >= 0)
        val best = (t.best +: extra).min
        k -> t.copy(best = best, samples = t.samples + extra.size, gated = true)
      }
    }
    requeueSkipped --= requeued // a pass-2 admit clears a pass-1 skip
    val requeueSec = requeueElapsed
    val results = names.map(n => n -> timed(n))
    // Locale.ROOT: the f-interpolator uses the default locale, and a comma
    // decimal separator (de_DE etc.) would break the driver's JSON parse.
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    def strArr(xs: Seq[String]): String = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v.best) }
      .mkString("{", ",", "}")
    val total = results.map(_._2.best).filter(_ >= 0).sum
    // Gate audit record (r16 verdict #1): enough to tell "gate never
    // engaged" (baseline_found=false / baseline_entries=0) from "gate ran
    // and lost" (name in resampled AND in still_over).
    val resampledNames = results.collect { case (k, t) if t.noisy => k }
    // Ambient factor from the FIRST-pass measurements (the requeue passes
    // would bias it low — they re-run only the over set, warm): the
    // median measured/committed ratio across the gated window, clamped
    // >= 1. still_over flags on the ambient-NORMALIZED threshold; the raw
    // 2x set stays alongside for audit (r17 verdict #1).
    val ambient = ambientFactor(names.flatMap { k =>
      val t = firstPass(k)
      baseline.get(k).collect { case b if b > 0 && t.best > 0 => t.best / b }
    })
    val stillOverRaw = results.collect {
      case (k, t) if t.best >= 0 && overBaseline(baseline.get(k), t.best) => k
    }
    val stillOver = results.collect {
      case (k, t) if t.best >= 0 && overBaseline(baseline.get(k), t.best, ambient) => k
    }
    // baseline_path is env-derived — the one gate string not guaranteed
    // [A-Za-z0-9_]; escape it or a quote/backslash in the path corrupts
    // the whole artifact line
    def jsonStr(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
    val gate =
      s"""{"baseline_found":${baseline.nonEmpty},"baseline_entries":${baseline.size},""" +
        s""""baseline_path":"${jsonStr(baselinePath.toString)}",""" +
        s""""ambient_factor":${num(ambient)},"requeue_sec":${num(requeueSec)},""" +
        s""""requeue_budget_sec":${num(requeueBudget)},""" +
        s""""resampled":${strArr(resampledNames)},"requeued":${strArr(requeued.toSeq)},""" +
        s""""requeue_skipped":${strArr(requeueSkipped.toSeq)},""" +
        s""""still_over":${strArr(stillOver)},"still_over_raw":${strArr(stillOverRaw)}}"""
    val line =
      s"""{"metric":"total_query_sec","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"n_queries":${results.size},"gate":$gate}"""
    println(line)
    // Durable complete artifact beside the driver's (truncating) stdout
    // capture — one timing per declared query, every round comparable.
    // The file form additionally carries per-query sample counts.
    if (outPath.nonEmpty) {
      val samples = results.map { case (k, t) => "\"" + k + "\":" + t.samples }
        .mkString("{", ",", "}")
      val fileLine = line.dropRight(1) + s""","samples":$samples}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (fileLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
