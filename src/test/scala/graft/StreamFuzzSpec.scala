package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.fuzz.StreamFuzzGen

/** Generated streaming differential (r12 verdict item #4): per seed,
  * [[StreamFuzzGen]] draws a windowed aggregation (tumbling/sliding/session
  * geometry, keys, order-insensitive aggregates, watermark params) and this
  * suite delivers the corpus events through a seeded CUT PERMUTATION — the
  * StreamCutFuzzSpec harness: shuffled delivery order, 2-6 micro-batches at
  * random boundaries — asserting the converged stream result equals the
  * SAME build applied to the batch DataFrame. Together the two draws
  * (query shape × boundary placement) cover what the fixed ST forms
  * cannot: state merge for arbitrary window geometry under arbitrary
  * micro-batch cuts.
  *
  * In-suite soak is [[nSeeds]] seeds; widen with GRAFT_STREAM_FUZZ_SEEDS
  * (the ≥200-seed round soaks are run that way and recorded in
  * BASELINE.md). Per-shape floors below keep the seed range honest — a
  * generator edit that silently starves a shape fails here, not in review.
  */
class StreamFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // r19 (verdict #5): in-suite default 60 -> 30 so the suite fits the round
  // driver's sbt-test budget; every per-shape/per-variant floor below is
  // nSeeds-relative so coverage stays honest at any width, and the >= 200-
  // seed soaks keep running through the env knob (recorded in BASELINE.md).
  private val nSeeds: Int =
    sys.env.get("GRAFT_STREAM_FUZZ_SEEDS").map(_.toInt).getOrElse(30)

  private lazy val allEvents: Vector[CutFuzzEvent] = {
    import spark.implicits._
    Tables.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[CutFuzzEvent].collect().toVector.sortBy(_.event_id)
  }

  /** Seeded cut permutation (the StreamCutFuzzSpec discipline): shuffled
    * delivery order, 2-6 chunks at distinct random positions.
    */
  private def cutChunks(seed: Int): Seq[Seq[CutFuzzEvent]] = {
    val rnd = new Random(seed)
    val order = rnd.shuffle(allEvents)
    val k = 2 + rnd.nextInt(5)
    val points = Seq.fill(k - 1)(1 + rnd.nextInt(order.length - 1))
      .distinct.sorted
    val bounds = (0 +: points) :+ order.length
    bounds.sliding(2).map { case Seq(a, b) => order.slice(a, b) }.toSeq
  }

  private def streamed(chunks: Seq[Seq[CutFuzzEvent]],
                       q: DataFrame => DataFrame): Seq[String] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[CutFuzzEvent]
    val name = "streamfz_" + System.nanoTime()
    val query = q(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      chunks.foreach { c =>
        mem.addData(c)
        query.processAllAvailable()
      }
    } finally query.stop()
    val rows = spark.table(name).collect().map(_.toString).sorted.toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  test(s"per-shape floors over seeds 1..$nSeeds (no shape starved)") {
    val shapes = (1 to nSeeds).map(StreamFuzzGen.query(_))
      .groupBy(_.shape).view.mapValues(_.size).toMap
    Seq("tumbling", "sliding", "session").foreach { s =>
      assert(shapes.getOrElse(s, 0) >= nSeeds / 6,
        s"shape $s starved in 1..$nSeeds: $shapes")
    }
    // key and agg diversity floors: the draws must actually vary
    val descs = (1 to nSeeds).map(StreamFuzzGen.query(_).desc)
    assert(descs.count(_.contains("key=event_type")) >= nSeeds / 10, descs)
    assert(descs.count(_.contains("key=user_id%")) >= nSeeds / 10, descs)
    assert(descs.count(_.contains("no extra key")) >= nSeeds / 10, descs)
    assert(descs.count(_.contains("sum_dec")) >= nSeeds / 10, descs)
  }

  test(s"v2: stream-static JOIN variants over seeds 1..$nSeeds: stream " +
    "over cut permutations ≡ batch") {
    import spark.implicits._
    var joins = 0; var leftJ = 0; var missD = 0
    (1 to nSeeds).foreach { seed =>
      val g = StreamFuzzGen.query(seed, 2)
      if (g.desc.contains("join=")) {
        joins += 1
        if (g.desc.contains("join=left")) leftJ += 1
        if (g.desc.contains("D=8")) missD += 1
      }
      val want = g.build(allEvents.toDF()).collect()
        .map(_.toString).sorted.toSeq
      assert(want.nonEmpty,
        s"v2 seed $seed (${g.desc}): batch reference is empty — weak evidence")
      val got = streamed(cutChunks(seed), g.build)
      assert(got == want,
        s"v2 seed $seed (${g.desc}) diverged from batch: " +
          s"${got.length} vs ${want.length} rows; first diff " +
          s"${got.zipAll(want, "<missing>", "<missing>")
            .find { case (a, b) => a != b }}")
    }
    info(s"$nSeeds v2 seeds converged; $joins joined ($leftJ left, " +
      s"$missD at the missing-user D=8 dim)")
    assert(joins >= nSeeds / 3, s"join variant starved: $joins")
    assert(leftJ >= nSeeds / 12, s"left-join variant starved: $leftJ")
    assert(missD >= nSeeds / 15, s"missing-user dim size starved: $missD")
  }

  /** Update-mode delivery for the v3 transformWithState draws: the memory
    * sink accumulates every per-batch state emission; the caller reduces
    * to final state.
    */
  private def streamedUpdate(chunks: Seq[Seq[CutFuzzEvent]],
                             q: DataFrame => DataFrame): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[CutFuzzEvent]
    val name = "streamfz_tws_" + System.nanoTime()
    val query = q(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      chunks.foreach { c =>
        mem.addData(c)
        query.processAllAvailable()
      }
    } finally query.stop()
    val rows = spark.table(name).collect().toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  test(s"v3: transformWithState stateful processors over seeds 1..$nSeeds: " +
    "final stream state over cut permutations ≡ independent batch aggregation") {
    import spark.implicits._
    // transformWithState requires the RocksDB state store provider; scope
    // it to this test and restore (other tiers keep HDFS-backed state).
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      var tws = 0; var totals = 0; var extremes = 0; var typemap = 0
      (1 to nSeeds).foreach { seed =>
        val g = StreamFuzzGen.query(seed, 3)
        if (g.shape == "tws") {
          tws += 1
          if (g.desc.contains("tws totals")) totals += 1
          if (g.desc.contains("tws extremes")) extremes += 1
          if (g.desc.contains("tws typemap")) typemap += 1
          val want = g.refBuild.get(allEvents.toDF()).collect()
            .map(_.toString).sorted.toSeq
          assert(want.nonEmpty,
            s"v3 seed $seed (${g.desc}): batch reference is empty — weak evidence")
          val raw = streamedUpdate(cutChunks(seed), g.build)
          // final state per key: every emission carries the key's MONOTONE
          // running count n, so max-n rows are exactly the last snapshot
          val maxN = raw.groupBy(_.getString(0))
            .view.mapValues(_.map(_.getLong(4)).max).toMap
          val got = raw.filter(r => r.getLong(4) == maxN(r.getString(0)))
            .map(_.toString).sorted.toSeq
          assert(got == want,
            s"v3 seed $seed (${g.desc}) diverged from batch reference: " +
              s"${got.length} vs ${want.length} rows; first diff " +
              s"${got.zipAll(want, "<missing>", "<missing>")
                .find { case (a, b) => a != b }}")
        }
      }
      info(s"$tws tws seeds converged ($totals totals, $extremes extremes, " +
        s"$typemap typemap)")
      assert(tws >= nSeeds / 3, s"tws variant starved: $tws")
      assert(totals >= nSeeds / 15, s"totals state shape starved: $totals")
      assert(extremes >= nSeeds / 15, s"extremes state shape starved: $extremes")
      assert(typemap >= nSeeds / 15, s"typemap state shape starved: $typemap")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  /** Append-mode delivery for the v4 late-drop draws: returns the sink's
    * appended rows, the total numRowsDroppedByWatermark across every
    * progress event, and the state rows UPDATED by the final data batch
    * (the stripe batch — zero iff eviction was total).
    */
  private def streamedAppend(chunks: Seq[Seq[CutFuzzEvent]],
                             q: DataFrame => DataFrame): (Seq[String], Long, Long) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[CutFuzzEvent]
    val name = "streamfz_ld_" + System.nanoTime()
    val query = q(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    val (dropped, lastUpdated) =
      try {
        chunks.foreach { c =>
          mem.addData(c)
          query.processAllAvailable()
        }
        val progress = query.recentProgress
        val d = progress
          .map(_.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum
        val u = progress.filter(_.numInputRows > 0).lastOption
          .map(_.stateOperators.map(_.numRowsUpdated).sum).getOrElse(-1L)
        (d, u)
      } finally query.stop()
    val rows = spark.table(name).collect().map(_.toString).sorted.toSeq
    spark.catalog.dropTempView(name)
    (rows, dropped, lastUpdated)
  }

  /** Append-mode delivery returning raw Rows (the v5 stream-stream joins
    * need typed access to the NULL-extended columns).
    */
  private def streamedAppendRows(chunks: Seq[Seq[CutFuzzEvent]],
                                 q: DataFrame => DataFrame): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[CutFuzzEvent]
    val name = "streamfz_ssj_" + System.nanoTime()
    val query = q(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      chunks.foreach { c =>
        mem.addData(c)
        query.processAllAvailable()
      }
    } finally query.stop()
    val rows = spark.table(name).collect().toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  test(s"v5: stream-stream interval joins over seeds 1..$nSeeds: inner ≡ " +
    "batch under shuffled and ascending delivery; outer NULL-extensions " +
    "horizon-banded") {
    import spark.implicits._
    var wide = 0; var finite = 0; var outer = 0
    var unmatchedTotal = 0; var mustEmitTotal = 0
    (1 to nSeeds).foreach { seed =>
      val g = StreamFuzzGen.query(seed, 5)
      if (g.shape.startsWith("ssj")) {
        val batchRows = g.build(allEvents.toDF()).collect().toSeq
        assert(batchRows.nonEmpty,
          s"v5 seed $seed (${g.desc}): batch reference is empty — weak evidence")
        g.shape match {
          case "ssj-inner-wide" =>
            wide += 1
            // no eviction at 10000h delay ⇒ exact under ARBITRARY shuffled
            // cuts — the pure join-state-merge differential
            val got = streamedAppendRows(cutChunks(seed), g.build)
              .map(_.toString).sorted
            val want = batchRows.map(_.toString).sorted
            assert(got == want,
              s"v5 seed $seed (${g.desc}) diverged from batch join: " +
                s"${got.length} vs ${want.length} rows; first diff " +
                s"${got.zipAll(want, "<missing>", "<missing>")
                  .find { case (a, b) => a != b }}")

          case "ssj-inner-finite" =>
            finite += 1
            // eviction live, but event-time-ascending delivery means a row
            // that could match an evicted partner would itself be below
            // the watermark ⇒ still exact
            val asc = allEvents.sortBy(e => (e.ts, e.event_id))
            val rnd = new Random(seed)
            val k = 2 + rnd.nextInt(3)
            val points = Seq.fill(k - 1)(1 + rnd.nextInt(asc.length - 1))
              .distinct.sorted
            val bounds = (0 +: points) :+ asc.length
            val chunks = bounds.sliding(2)
              .map { case Seq(a, b) => asc.slice(a, b) }.toSeq
            val got = streamedAppendRows(chunks, g.build)
              .map(_.toString).sorted
            val want = batchRows.map(_.toString).sorted
            assert(got == want,
              s"v5 seed $seed (${g.desc}) diverged from batch join under " +
                s"ascending eviction: ${got.length} vs ${want.length} rows; " +
                s"first diff ${got.zipAll(want, "<missing>", "<missing>")
                  .find { case (a, b) => a != b }}")

          case _ => // ssj-leftouter
            outer += 1
            val (delayMin, bMin, _, _, _) = g.lateDraw.get
            val asc = allEvents.sortBy(e => (e.ts, e.event_id))
            val rnd = new Random(seed)
            val k = 2 + rnd.nextInt(3)
            val points = Seq.fill(k - 1)(1 + rnd.nextInt(asc.length - 1))
              .distinct.sorted
            val bounds = (0 +: points) :+ asc.length
            // one sacrificial LATE row (the corpus min-ts event, redelivered
            // last) forces a final batch: eviction applies the watermark
            // computed at the PREVIOUS batch's close, so without it the
            // last real batch's NULL-extensions would still sit in state
            val chunks = bounds.sliding(2)
              .map { case Seq(a, b) => asc.slice(a, b) }.toSeq :+ Seq(asc.head)
            val got = streamedAppendRows(chunks, g.build)
            val (gotNull, gotInner) = got.partition(_.isNullAt(2)) // r_id
            val (wantNull, wantInner) = batchRows.partition(_.isNullAt(2))
            // matches: exact (same argument as inner-finite)
            assert(gotInner.map(_.toString).sorted ==
                wantInner.map(_.toString).sorted,
              s"v5 seed $seed (${g.desc}): matched part diverged " +
                s"(${gotInner.length} vs ${wantInner.length})")
            // NULL-extensions: a left row emits iff the final watermark
            // passed its match horizon l_ts + B. Final watermark =
            // min(branch max ts) − delay; the 1-minute band absorbs the
            // corpus's microsecond offsets at the boundary.
            val maxL = allEvents.filter(_.event_id % 2 == 0).map(_.ts).max
            val maxR = allEvents.filter(_.event_id % 2 == 1).map(_.ts).max
            val wm = (if (maxL.isBefore(maxR)) maxL else maxR)
              .minusMinutes(delayMin.toLong)
            def horizon(r: org.apache.spark.sql.Row) =
              r.getTimestamp(5).toLocalDateTime.plusMinutes(bMin.toLong)
            val mustEmit = wantNull
              .filter(r => horizon(r).isBefore(wm.minusMinutes(1)))
              .map(_.getLong(1)).toSet
            val mayEmit = wantNull
              .filter(r => horizon(r).isBefore(wm.plusMinutes(1)))
              .map(_.getLong(1)).toSet
            val gotNullIds = gotNull.map(_.getLong(1)).toSet
            assert(mustEmit.subsetOf(gotNullIds),
              s"v5 seed $seed (${g.desc}): ${(mustEmit -- gotNullIds).size} " +
                s"past-horizon unmatched left rows never NULL-extended")
            assert(gotNullIds.subsetOf(mayEmit),
              s"v5 seed $seed (${g.desc}): ${(gotNullIds -- mayEmit).size} " +
                s"NULL-extensions emitted BEFORE the watermark passed their horizon")
            unmatchedTotal += wantNull.length
            mustEmitTotal += mustEmit.size
        }
      }
    }
    info(s"${wide + finite + outer} ssj seeds converged " +
      s"($wide inner-wide, $finite inner-finite, $outer left-outer; " +
      s"$unmatchedTotal unmatched drawn, $mustEmitTotal past-horizon)")
    assert(wide >= nSeeds / 10, s"inner-wide variant starved: $wide")
    assert(finite >= nSeeds / 15, s"inner-finite variant starved: $finite")
    assert(outer >= nSeeds / 15, s"left-outer variant starved: $outer")
    assert(mustEmitTotal > 0, "no past-horizon NULL-extension ever drawn — " +
      "the eviction side of the outer property was never exercised")
  }

  test(s"v4: append-mode watermark eviction over seeds 1..$nSeeds: " +
    "emitted windows ≡ batch over on-time rows ∧ drop count ≡ late stripe") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    val maxTs = allEvents.map(_.ts).max
    var ld = 0; var shapes = Map.empty[String, Int].withDefaultValue(0)
    (1 to nSeeds).foreach { seed =>
      val g = StreamFuzzGen.query(seed, 4)
      if (g.shape == "latedrop") {
        ld += 1
        val (delayMin, spanMin, m, r, copies) = g.lateDraw.get
        val wmCut = maxTs.minusMinutes(delayMin)
        val lateCutoff = wmCut.minusMinutes(spanMin + 1)
        val (stripe, onTime0) = allEvents.partition(e =>
          e.ts.isBefore(lateCutoff) && e.event_id % m == r)
        assert(stripe.nonEmpty,
          s"v4 seed $seed (${g.desc}): empty late stripe — weak evidence")
        // on-time rows in event-time-ascending order across seeded cuts:
        // ascending ⇒ no on-time row ever falls behind the watermark a
        // previous batch established ⇒ the dropped set is EXACTLY the
        // stripe regardless of where the cut boundaries land
        val onTime = onTime0.sortBy(e => (e.ts, e.event_id))
        val rnd = new Random(seed)
        val k = 2 + rnd.nextInt(3)
        val points = Seq.fill(k - 1)(1 + rnd.nextInt(onTime.length - 1))
          .distinct.sorted
        val bounds = (0 +: points) :+ onTime.length
        val chunks = bounds.sliding(2)
          .map { case Seq(a, b) => onTime.slice(a, b) }.toSeq :+
          rnd.shuffle(stripe)
        val (got, dropped, stripeUpdated) = streamedAppend(chunks, g.build)
        // expected: batch over on-time rows, restricted to the windows the
        // final watermark (maxTs − delay) has closed. The restriction MUST
        // happen on the MATERIALIZED aggregate output: w_end is part of
        // the session_window grouping expression, so Catalyst pushes a
        // `w_end <= T` filter BELOW the aggregation — which for session
        // windows filters the PRE-MERGE per-row candidate sessions
        // ([ts, ts+gap)) and silently truncates merged sessions (found by
        // this suite's first run: seed 15's batch reference lost rows
        // 996-999 of a chained session and reported a session end the
        // stream correctly never emits). Collect first, then filter over
        // the materialized rows where no aggregate sits below the filter.
        val full = g.build(onTime.toDF())
        val fullRows = full.collect()
        val want = spark.createDataFrame(
            spark.sparkContext.parallelize(fullRows.toSeq), full.schema)
          .where(col("w_end") <= to_timestamp(lit(wmCut.format(fmt))))
          .collect().map(_.toString).sorted.toSeq
        assert(want.nonEmpty,
          s"v4 seed $seed (${g.desc}): no closed windows — weak evidence")
        assert(got == want,
          s"v4 seed $seed (${g.desc}) diverged from batch-over-on-time: " +
            s"${got.length} vs ${want.length} rows; first diff " +
            s"${got.zipAll(want, "<missing>", "<missing>")
              .find { case (a, b) => a != b }}")
        // Eviction pins. The STRUCTURAL one: the stripe batch wrote ZERO
        // state rows — no late copy entered any group, partition layout
        // notwithstanding. The metric one is bounded, not exact:
        // numRowsDroppedByWatermark counts at the stateful operator's
        // input, which sits AFTER the map-side partial aggregation, so
        // two late copies landing in the same (window, key) group within
        // one task combine into ONE counted row (found empirically, seed
        // 4: 498 window copies, one in-partition collision, metric 497,
        // state untouched). The count is a partition-collision-dependent
        // quantity in (0, |stripe| × copies]; the upper bound is exact
        // when no in-task collision occurs.
        assert(stripeUpdated == 0L,
          s"v4 seed $seed (${g.desc}): the late stripe batch UPDATED " +
            s"$stripeUpdated state rows — late rows entered state")
        assert(dropped > 0L && dropped <= stripe.size.toLong * copies,
          s"v4 seed $seed (${g.desc}): numRowsDroppedByWatermark $dropped " +
            s"outside (0, ${stripe.size} × $copies]")
        shapes = shapes.updated(g.desc.split(" ")(1),
          shapes(g.desc.split(" ")(1)) + 1)
      }
    }
    info(s"$ld latedrop seeds converged; per-shape: $shapes")
    assert(ld >= nSeeds / 3, s"latedrop variant starved: $ld")
    Seq("tumbling", "sliding", "session").foreach { s =>
      assert(shapes(s) >= nSeeds / 15, s"latedrop $s starved: $shapes")
    }
  }

  test(s"v6: streaming dedup over seeds 1..$nSeeds: drawn keys — wide " +
    "watermark exact under shuffled replays; finite delay drops the late " +
    "stripe and preserves the emitted key set") {
    import spark.implicits._
    val maxTs = allEvents.map(_.ts).max
    var wide = 0; var finite = 0
    val keyShapes = scala.collection.mutable.Set.empty[String]
    (1 to nSeeds).foreach { seed =>
      val g = StreamFuzzGen.query(seed, 6)
      if (g.shape.startsWith("dedup")) {
        keyShapes += g.desc.split(" ")(1)
        // independent reference: relational DISTINCT of the key projection
        val want = g.refBuild.get(allEvents.toDF())
          .collect().map(_.toString).sorted.toSeq
        assert(want.nonEmpty)
        if (g.shape == "dedup-wide") {
          wide += 1
          // arbitrary shuffled cuts + injected replays (the st3
          // discipline): 50 random events re-delivered into later-or-same
          // chunks; a wide watermark never evicts state, so every key
          // emits EXACTLY once no matter the delivery
          val rnd = new Random(seed)
          val chunks0 = cutChunks(seed)
          val dups = Vector.fill(50)(allEvents(rnd.nextInt(allEvents.length)))
          val chunks = chunks0.zipWithIndex.map { case (c, i) =>
            c ++ dups.filter(_ => rnd.nextInt(chunks0.length) <= i)
          }
          val (got, _, _) = streamedAppend(chunks, g.build)
          assert(got == want,
            s"v6 seed $seed (${g.desc}) wide dedup diverged: " +
              s"${got.length} vs ${want.length} rows; first diff " +
              s"${got.zipAll(want, "<missing>", "<missing>")
                .find { case (a, b) => a != b }}")
        } else {
          finite += 1
          val (delayMin, _, m, r, _) = g.lateDraw.get
          // event-time-ASCENDING delivery: no on-time row is ever late, a
          // key's FIRST occurrence always emits, and expired-state repeats
          // re-emit keys already in the set — so the emitted key SET must
          // equal batch DISTINCT exactly. A final batch re-delivers a
          // stripe of now-late duplicates (ts a 1-min margin below the
          // final watermark): the watermark filter must drop them all.
          val stripe = allEvents.filter(e =>
            e.ts.isBefore(maxTs.minusMinutes(delayMin + 1)) &&
              e.event_id % m == r)
          assert(stripe.nonEmpty,
            s"v6 seed $seed (${g.desc}): empty late stripe — weak evidence")
          val asc = allEvents.sortBy(e => (e.ts, e.event_id))
          val rnd = new Random(seed)
          val k = 2 + rnd.nextInt(3)
          val points = Seq.fill(k - 1)(1 + rnd.nextInt(asc.length - 1))
            .distinct.sorted
          val bounds = (0 +: points) :+ asc.length
          val chunks = bounds.sliding(2)
            .map { case Seq(a, b) => asc.slice(a, b) }.toSeq :+
            rnd.shuffle(stripe)
          val (got, dropped, _) = streamedAppend(chunks, g.build)
          assert(got.distinct == want,
            s"v6 seed $seed (${g.desc}) finite dedup key set diverged: " +
              s"${got.distinct.length} vs ${want.length} distinct; first diff " +
              s"${got.distinct.zipAll(want, "<missing>", "<missing>")
                .find { case (a, b) => a != b }}")
          assert(dropped > 0L && dropped <= stripe.size.toLong,
            s"v6 seed $seed (${g.desc}): numRowsDroppedByWatermark " +
              s"$dropped outside (0, ${stripe.size}]")
        }
      }
    }
    info(s"${wide + finite} dedup seeds converged ($wide wide / $finite " +
      s"finite); key shapes=${keyShapes.toSeq.sorted.mkString(", ")}")
    assert(wide + finite >= nSeeds / 3, s"dedup variant starved: ${wide + finite}")
    assert(wide >= nSeeds / 15 && finite >= nSeeds / 15,
      s"a dedup sub-draw starved: wide=$wide finite=$finite")
    assert(keyShapes.size >= 3, s"key-shape draws starved: $keyShapes")
  }

  test(s"$nSeeds generated windowed aggregations: stream over cut " +
    "permutations ≡ batch") {
    import spark.implicits._
    var perShape = Map.empty[String, Int].withDefaultValue(0)
    (1 to nSeeds).foreach { seed =>
      val g = StreamFuzzGen.query(seed)
      val want = g.build(allEvents.toDF()).collect()
        .map(_.toString).sorted.toSeq
      assert(want.nonEmpty,
        s"seed $seed (${g.desc}): batch reference is empty — weak evidence")
      val got = streamed(cutChunks(seed), g.build)
      assert(got == want,
        s"seed $seed (${g.desc}) diverged from batch: " +
          s"${got.length} vs ${want.length} rows; first diff " +
          s"${got.zipAll(want, "<missing>", "<missing>")
            .find { case (a, b) => a != b }}")
      perShape = perShape.updated(g.shape, perShape(g.shape) + 1)
    }
    info(s"$nSeeds seeds converged; per-shape: $perShape")
  }

  test("streaming catalog tiers are frozen: fzst/fzsw oracle SQL hash-pinned") {
    // The FuzzSpec frozen-slice discipline for the streaming catalog: a
    // generator edit that shifts ANY draw re-points both renderings
    // together (rows still hash-match), so only an explicit pin catches
    // it. Deliberate changes regenerate via FuzzPinGen.sqlHash over
    // StreamFuzzQueries.defs. Duplicate hashes ACROSS fzst seeds are
    // expected — same key draw, different delivery schedule (the
    // differential is schedule diversity; the oracle is the key set).
    val pins = Map(
      "fzst4" -> "c945d418",
      "fzst6" -> "ebaa2335",
      "fzst13" -> "ebaa2335",
      "fzst25" -> "b0181f43",
      "fzst33" -> "3cac09b4",
      "fzst35" -> "f8f71243",
      "fzst52" -> "f8f71243",
      "fzst58" -> "0b8e2767",
      "fzst62" -> "92432517",
      "fzst76" -> "ebaa2335",
      "fzst96" -> "3cac09b4",
      "fzst124" -> "3cac09b4",
      "fzst150" -> "3cac09b4",
      "fzst159" -> "f8f71243",
      "fzst177" -> "64035cea",
      "fzst199" -> "ebaa2335",
      "fzsw11" -> "92cf9228",
      "fzsw17" -> "9e32be70",
      "fzsw26" -> "6de98415",
      "fzsw28" -> "c162d4d8",
      "fzsw33" -> "212ab988",
      "fzsw44" -> "69e602e7",
      "fzsw54" -> "97acf8af",
      "fzsw58" -> "67493f0b",
      "fzsw70" -> "94933723",
      "fzsw88" -> "534b2162",
      "fzsw91" -> "55d5e89b",
      "fzsw119" -> "b8cc3c04",
      "fzsw136" -> "ce8ff367",
      "fzsw162" -> "3da2d5b0",
      "fzsw225" -> "f0344264")
    val defs = graft.queries.StreamFuzzQueries.defs
    assert(defs.map(_.name).toSet == pins.keySet, "declared streaming slice changed")
    defs.foreach { q =>
      assert(q.oracle.nonEmpty, s"${q.name}: streaming catalog entry lost its oracle")
      assert(graft.tools.FuzzPinGen.sqlHash(q.oracle.get) == pins(q.name),
        s"${q.name}: oracle SQL drifted — a StreamFuzzGen draw moved:\n${q.oracle.get}")
    }
  }
}
