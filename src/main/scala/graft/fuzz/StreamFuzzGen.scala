package graft.fuzz

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

/** Generated STREAMING windowed aggregations over the events table — the
  * streaming tier's analogue of [[FuzzGen]]'s batch grammar (r12 verdict
  * item #4: the ST family rode 5 fixed oracle forms + StreamCutFuzzSpec's
  * cut permutations; this generator makes the aggregation ITSELF a seeded
  * draw).
  *
  * Each seed draws one windowed aggregation:
  *   - shape: tumbling `window(ts, size)`, sliding `window(ts, size,
  *     slide)` (slide a proper divisor of size, so window sets nest
  *     deterministically), or `session_window(ts, gap)`;
  *   - window geometry from pools sized to the corpus's event-time span
  *     (minutes to a day);
  *   - zero or one extra group key: `event_type`, or a `user_id` modulo
  *     bucket (2-6 buckets — keeps group counts bounded);
  *   - 1-3 aggregates from a pool that is EXACTLY order-insensitive and
  *     mergeable: counts, conditional counts, long-integerized cents
  *     sums/mins/maxes, DECIMAL(38,6) sums, event-id extremes. No bare
  *     double sums — float accumulation order would make stream-vs-batch
  *     equality flaky by construction rather than prove state-merge
  *     correctness;
  *   - a drawn watermark delay (and session gap). The differential runs in
  *     `complete` output mode, where the watermark neither drops late
  *     input nor evicts state, so `stream(cuts) ≡ batch` must hold EXACTLY
  *     for every micro-batch boundary placement — the same discipline
  *     StreamCutFuzzSpec pins for the fixed ST forms (session shapes draw
  *     wide delays, following sessionCounts' precedent: merging session
  *     state is the one place the delay parameter can reach finalization).
  *
  * The built function is dual-mode: applied to a streaming DataFrame it is
  * the readStream plan, applied to a batch DataFrame of the same rows it
  * is the reference answer. A given seed is deterministic forever.
  */
object StreamFuzzGen {

  final case class StreamGenQuery(
      seed: Int,
      /** tumbling | sliding | session | tws */
      shape: String,
      /** human-readable draw summary (window geometry, keys, aggs) */
      desc: String,
      /** drawn watermark delay (applied inside build) */
      delay: String,
      build: DataFrame => DataFrame,
      /** v3 only: an INDEPENDENT batch reference (plain relational
        * aggregation) for builds whose streaming operator
        * (transformWithState) emits per-batch running state rather than a
        * final answer — the spec reduces the stream's emissions to final
        * state (max-n per key) and compares against THIS. Keeping the
        * reference relational makes the differential two genuinely
        * different code paths (StatefulProcessor vs hash aggregate), not
        * the same operator run twice.
        */
      refBuild: Option[DataFrame => DataFrame] = None,
      /** v4 only: the late-data draw for append-mode eviction seeds —
        * (watermark delay minutes, window span minutes, stripe modulo m,
        * stripe residue r, copies per dropped row). The spec derives the
        * deterministic late/on-time partition from it: stripe rows sit a
        * FULL window span (+1 min margin) below the final watermark so
        * every window copy a stripe row explodes into is itself late —
        * without the span cushion a sliding/tumbling copy ending past the
        * watermark would legitimately survive and both the drop count and
        * the output set would depend on grid alignment. `copies` is the
        * per-input-row window multiplicity (size/slide for sliding, 1
        * otherwise): numRowsDroppedByWatermark counts at the stateful
        * operator's input, which sits AFTER the window explosion AND the
        * map-side partial aggregation — in-task (window, key) collisions
        * combine late copies before the counter sees them, so the metric
        * is bounded by (0, |stripe| × copies], exact only collision-free
        * (found empirically in the r15 sweep; the structural pin is that
        * the stripe batch updates ZERO state rows).
        */
      lateDraw: Option[(Int, Int, Int, Int, Int)] = None,
      /** The DuckDB-renderable batch reference, where one exists — draws
        * with it are driver-catalog material: the real streaming query
        * hash-compared against a second engine, not just against Spark's
        * own batch plan. Two families carry it: v6 dedup draws
        * (relational DISTINCT of the key projection; EXACT for
        * wide-watermark draws — state never evicts, every key emits once
        * → fzst entries) and v1 TUMBLING windowed aggregations whose
        * aggregate draws are all SQL-renderable (epoch-bucketed GROUP BY;
        * EXACT in complete mode, where the converged sink equals the
        * batch aggregation → fzsw entries).
        */
      oracleSql: Option[String] = None)

  /** Window sizes in minutes; the sf0.001 events span ~days, so these give
    * from a handful to hundreds of windows.
    */
  private val sizesMin = Vector(15, 30, 60, 120, 360, 1440)
  private val sessionGapsMin = Vector(10, 30, 60, 180)
  private val delaysTumbling =
    Vector("30 minutes", "2 hours", "1 day", "10000 hours")
  private val delaysSession = Vector("5000 hours", "10000 hours")

  /** One drawn aggregate: name, Spark column, and (when the semantics are
    * DuckDB-renderable without a DECIMAL result surface) the oracle SQL —
    * Spark's `CAST(double AS LONG)` truncates toward zero where DuckDB's
    * CAST rounds, so the cents family renders through trunc(); DuckDB
    * sums BIGINT into HUGEINT, so summed columns re-CAST. sum_dec has no
    * SQL: a DECIMAL(38,6) result column is the driver hasher's
    * fail-on-sight type (BASELINE r13), so draws containing it stay in
    * the ScalaTest-only tier.
    */
  final case class FAgg(name: String, col: Column, sql: Option[String])

  private def aggPool(rnd: Random): Seq[FAgg] = {
    val m = 2 + rnd.nextInt(5)
    val all = Vector[FAgg](
      FAgg("cnt", count(lit(1)), Some("count(*)")),
      // integer cents: per-row truncation is deterministic, long sums are
      // exactly mergeable in any order
      FAgg("sum_cents", sum((col("value") * 100).cast("long")),
        Some("CAST(sum(CAST(trunc(value * 100) AS BIGINT)) AS BIGINT)")),
      FAgg("min_cents", min((col("value") * 100).cast("long")),
        Some("min(CAST(trunc(value * 100) AS BIGINT))")),
      FAgg("max_cents", max((col("value") * 100).cast("long")),
        Some("max(CAST(trunc(value * 100) AS BIGINT))")),
      FAgg("sum_dec", sum(col("value").cast(DecimalType(38, 6))), None),
      FAgg("n_click", count(when(col("event_type") === "click", lit(1))),
        Some("count(CASE WHEN event_type = 'click' THEN 1 END)")),
      FAgg("max_eid", max(col("event_id")), Some("max(event_id)")),
      FAgg("n_bucket0", count(when(pmod(col("user_id"), lit(m)) === 0, lit(1))),
        Some(s"count(CASE WHEN ((user_id % $m) + $m) % $m = 0 THEN 1 END)")))
    val k = 1 + rnd.nextInt(3)
    rnd.shuffle(all).take(k).sortBy(_.name)
  }

  def query(seed: Int): StreamGenQuery = query(seed, 1)

  /** v3's seeded StatefulProcessor (ST6 surface): one class, three drawn
    * state disciplines. Every emission carries the key's MONOTONE running
    * row count `n`, so the spec can select the final state per key as the
    * max-n rows no matter how the cut permutation batched the input.
    * Output row: (k, sub, a, b, n) — sub/"b" unused lanes are pinned to
    * ""/0 so one schema serves all modes.
    *   mode 0 totals:   ValueState (sum of integer cents, n)
    *   mode 1 extremes: ValueState (max cents, min cents, n)
    *   mode 2 typemap:  MapState event_type → count, emitted as the FULL
    *                    map snapshot each batch (per-subkey rows all carry
    *                    the key's n, so the final snapshot is selectable)
    */
  private class TwsFuzzProcessor(mode: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, String, Long), (String, String, Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var vs: ValueState[(Long, Long, Long)] = _
    @transient private var ms: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      if (mode == 2)
        ms = getHandle.getMapState[String, Long](
          "typemap", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      else
        vs = getHandle.getValueState[(Long, Long, Long)](
          "acc", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[(String, String, Long)],
        tv: TimerValues): Iterator[(String, String, Long, Long, Long)] = mode match {
      case 0 =>
        var (a, _, n) = if (vs.exists()) vs.get() else (0L, 0L, 0L)
        rows.foreach { case (_, _, cents) => a += cents; n += 1 }
        vs.update((a, 0L, n))
        Iterator.single((key, "", a, 0L, n))
      case 1 =>
        var (hi, lo, n) =
          if (vs.exists()) vs.get() else (Long.MinValue, Long.MaxValue, 0L)
        rows.foreach { case (_, _, cents) =>
          hi = math.max(hi, cents); lo = math.min(lo, cents); n += 1
        }
        vs.update((hi, lo, n))
        Iterator.single((key, "", hi, lo, n))
      case _ =>
        var n = 0L
        ms.iterator().foreach { case (_, c) => n += c }
        rows.foreach { case (_, sub, _) =>
          ms.updateValue(sub,
            (if (ms.containsKey(sub)) ms.getValue(sub) else 0L) + 1L)
          n += 1
        }
        val out = ms.iterator().map { case (sub, c) => (key, sub, c, 0L, n) }
        out.toVector.sortBy(_._2).iterator
    }
  }

  /** Versioned entry point (FuzzGen's fall-through discipline): v2 draws
    * one extra up-front mode byte and may dispatch to the STREAM-STATIC
    * JOIN variant; otherwise it falls through to the v1 body with the
    * advanced rnd state. v1 seeds keep their draws bit-identical.
    */
  def query(seed: Int, version: Int): StreamGenQuery = {
    val rnd = new Random(seed)
    if (version >= 6) {
      // v6 mode byte: STREAMING DEDUP (dropDuplicatesWithinWatermark —
      // the ST3 surface; the fixed st3 form rode StreamCutFuzzSpec's
      // permutations, but its KEY was always the unique event_id and its
      // watermark always wide). Versions ≤ 5 never take this draw;
      // fall-through continues into the v5 dispatch with the advanced
      // rnd state.
      val m6 = rnd.nextInt(10)
      if (m6 < 5) return dedupQuery(seed, rnd)
      // else: fall through to the v5 dispatch with the advanced rnd state
    }
    if (version >= 5) {
      // v5 mode byte: STREAM-STREAM interval joins (the ST5 surface — the
      // one stateful streaming operator the generated tiers never drew;
      // v2's joins are stream-static and stateless). Versions ≤ 4 never
      // take this draw; fall-through continues into the v4 dispatch with
      // the advanced rnd state.
      val m5 = rnd.nextInt(10)
      if (m5 < 5) return ssjQuery(seed, rnd)
      // else: fall through to the v4 dispatch with the advanced rnd state
    }
    if (version >= 4) {
      // v4 mode byte: APPEND-mode WATERMARK EVICTION (seeded late data) —
      // the one streaming semantic v1-v3 could not touch: they run in
      // complete/update modes where the watermark neither drops input nor
      // finalizes windows. Versions ≤ 3 never take this draw;
      // fall-through continues into the v3 dispatch with the advanced rnd
      // state.
      val m4 = rnd.nextInt(10)
      if (m4 < 5) return ldQuery(seed, rnd)
      // else: fall through to the v3 dispatch with the advanced rnd state
    }
    if (version >= 3) {
      // v3 mode byte: ARBITRARY STATE (transformWithState, the ST6
      // surface — the one streaming op outside this generator's reach
      // until r14). Versions ≤ 2 never take this draw; fall-through
      // continues into the v2 dispatch with the advanced rnd state.
      val m3 = rnd.nextInt(10)
      if (m3 < 5) return twsQuery(seed, rnd)
      // else: fall through to the v2 dispatch with the advanced rnd state
    }
    if (version >= 2) {
      // v2 mode byte: stream ⋈ static dimension before the windowed
      // aggregation — the stateless enrichment join every real event
      // pipeline runs (per micro-batch against the static side), absent
      // from v1 which aggregates the raw stream.
      val m2 = rnd.nextInt(10)
      if (m2 < 5) return joinedQuery(seed, rnd)
      // else: fall through to the v1 body with the advanced rnd state
    }
    queryBody(seed, rnd)
  }

  /** v2 dedicated variant: the event stream joins a deterministic STATIC
    * dimension (synthesized from spark.range inside the build, so the
    * dual-mode function needs no external table: `uid = 0..D-1, seg =
    * uid % 5, dim_val = uid*7 % 100`) on `user_id = uid` BEFORE the
    * windowed aggregation. D is drawn from {8, 15, 30}: at D=8 some
    * events genuinely MISS (corpus user_id runs 0..14 at sf0.001) — INNER
    * drops them, LEFT NULL-extends them into the dim group key, and the
    * n_miss counter pins the missed count through the state merge. The
    * aggregation groups by the window plus the dim payload `seg` (always
    * keyed — session_window's requirement holds for free) and optionally
    * event_type; aggregates reuse the order-insensitive pool plus the
    * exact long `sum(dim_val)`. Stream-static joins are STATELESS in
    * Structured Streaming (each micro-batch joins the static side), so
    * stream(cuts) ≡ batch must hold exactly, same as v1.
    */
  private def joinedQuery(seed: Int, rnd: Random): StreamGenQuery = {
    val shape = rnd.nextInt(3)
    val size = sizesMin(rnd.nextInt(sizesMin.length))
    val divisors = Vector(2, 3, 4).filter(size % _ == 0)
    val slide = size / divisors(rnd.nextInt(divisors.length))
    val gap = sessionGapsMin(rnd.nextInt(sessionGapsMin.length))
    val delay =
      if (shape == 2) delaysSession(rnd.nextInt(delaysSession.length))
      else delaysTumbling(rnd.nextInt(delaysTumbling.length))
    val dimSize = Vector(8, 15, 30)(rnd.nextInt(3))
    val left = rnd.nextInt(10) < 4
    val withType = rnd.nextBoolean()
    val baseAggs = aggPool(rnd).map(a => a.name -> a.col)
    val aggs = (baseAggs :+ ("sum_dim" -> sum(col("dim_val")))) ++
      (if (left) Seq("n_miss" -> count(when(col("uid").isNull, lit(1))))
       else Nil)

    val (shapeName, winDesc) = shape match {
      case 0 => ("tumbling", s"window($size min)")
      case 1 => ("sliding", s"window($size min, slide $slide min)")
      case _ => ("session", s"session_window(gap $gap min)")
    }
    val build = (df0: DataFrame) => {
      val dim = df0.sparkSession.range(dimSize).select(
        col("id").as("uid"),
        pmod(col("id"), lit(5)).cast("long").as("seg"),
        (col("id") * 7 % 100).as("dim_val"))
      val df = df0.withColumn("ts", col("ts").cast(TimestampType))
        .withWatermark("ts", delay)
        .join(dim, col("user_id") === col("uid"),
          if (left) "left" else "inner")
      val winCol: Column = shape match {
        case 0 => window(col("ts"), s"$size minutes")
        case 1 => window(col("ts"), s"$size minutes", s"$slide minutes")
        case _ => session_window(col("ts"), s"$gap minutes")
      }
      val winName = if (shape == 2) "session_window" else "window"
      val keyCols: Seq[Column] = col("seg").as("k0") +:
        (if (withType) Seq(col("event_type").as("k1")) else Nil)
      val grouped = df.groupBy((winCol +: keyCols): _*)
        .agg(aggs.head._2.as(aggs.head._1),
          aggs.tail.map { case (n, c) => c.as(n) }: _*)
      val outCols =
        Seq(col(s"$winName.start").as("w_start"),
          col(s"$winName.end").as("w_end")) ++
          keyCols.indices.map(i => col(s"k$i")) ++
          aggs.map { case (n, _) => col(n) }
      grouped.select(outCols: _*)
    }

    StreamGenQuery(seed, shapeName,
      s"$shapeName $winDesc, join=${if (left) "left" else "inner"}(D=$dimSize), " +
        s"key=seg${if (withType) "+event_type" else ""}, watermark $delay, " +
        s"aggs=[${aggs.map(_._1).mkString(",")}]",
      delay, build)
  }

  /** v3 dedicated variant: seeded transformWithState stateful processors
    * (ST6). The stream path runs a [[TwsFuzzProcessor]] under
    * OutputMode.Update — per-batch running-state emissions whose final
    * per-key snapshot (max monotone n) must equal [[StreamGenQuery.refBuild]],
    * an INDEPENDENT plain relational aggregation of the same rows. Key
    * draw: user_id (one state row per user), a user_id%m bucket (state
    * merge across users), or event_type (string keys). Payload is integer
    * cents (`CAST(value*100 AS BIGINT)` — computed in the DataFrame layer
    * shared by both paths, so per-row truncation is identical) — sums,
    * extremes and counts over longs are exact and arrival-order-free, the
    * same discipline as the windowed pool. Requires the RocksDB state
    * store provider (the spec scopes it).
    */
  private def twsQuery(seed: Int, rnd: Random): StreamGenQuery = {
    val keyDraw = rnd.nextInt(3)
    val km = 2 + rnd.nextInt(5)
    val mode = rnd.nextInt(3)
    val modeName = Vector("totals", "extremes", "typemap")(mode)
    val keyDesc = keyDraw match {
      case 0 => "key=user_id"
      case 1 => s"key=user_id%$km"
      case _ => "key=event_type"
    }
    def keyed(df: DataFrame): DataFrame = {
      val keyCol = keyDraw match {
        case 0 => col("user_id").cast("string")
        case 1 => pmod(col("user_id"), lit(km)).cast("string")
        case _ => col("event_type")
      }
      df.select(keyCol.as("k"), col("event_type").as("sub"),
        (col("value") * 100).cast("long").as("cents"))
    }
    val build = (df0: DataFrame) => {
      val sp = df0.sparkSession
      import sp.implicits._
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      keyed(df0).as[(String, String, Long)]
        .groupByKey(_._1)
        .transformWithState(new TwsFuzzProcessor(mode),
          TimeMode.None(), OutputMode.Update())
        .toDF("k", "sub", "a", "b", "n")
    }
    val ref = (df0: DataFrame) => {
      val in = keyed(df0)
      mode match {
        case 0 =>
          in.groupBy(col("k"))
            .agg(sum(col("cents")).as("a"), count(lit(1)).as("n"))
            .select(col("k"), lit("").as("sub"), col("a"), lit(0L).as("b"),
              col("n"))
        case 1 =>
          in.groupBy(col("k"))
            .agg(max(col("cents")).as("a"), min(col("cents")).as("b"),
              count(lit(1)).as("n"))
            .select(col("k"), lit("").as("sub"), col("a"), col("b"), col("n"))
        case _ =>
          val w = org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
          in.groupBy(col("k"), col("sub"))
            .agg(count(lit(1)).as("a"))
            .withColumn("n", sum(col("a")).over(w))
            .select(col("k"), col("sub"), col("a"), lit(0L).as("b"), col("n"))
      }
    }
    StreamGenQuery(seed, "tws",
      s"tws $modeName, $keyDesc, monotone-n final-state compare",
      "none", build, refBuild = Some(ref))
  }

  /** v4 dedicated variant: APPEND-mode watermark eviction under seeded
    * late data. Window geometry / keys / aggregates draw from the v1
    * pools; the delay draws SMALL (30 min - 6 h against the corpus's
    * ~30-day event-time span, so most windows close) and the seed draws a
    * late stripe: `event_id % m = r` among rows with
    * `ts < maxTs − delay − windowSpan − 1 min` — a full window span below
    * the final watermark, so EVERY window copy a stripe row explodes into
    * ends before the watermark (the drop is total, never a grid-alignment
    * case), with a minute of margin so no decision sits on a boundary.
    * The SPEC's delivery protocol makes the dropped set exactly
    * the stripe, deterministic under any cut placement:
    *   - on-time rows (everything off the stripe) are delivered in
    *     event-time-ASCENDING order across the seeded cuts — ascending ⇒
    *     every batch's rows are at or ahead of the watermark the previous
    *     batch established ⇒ zero on-time drops;
    *   - then the stripe, shuffled — the watermark is already
    *     maxTs − delay, every stripe row is strictly older ⇒ all dropped
    *     (and the watermark never regresses).
    * Expected output: the batch build over ON-TIME rows restricted to
    * windows with `w_end ≤ maxTs − delay` (append mode only emits
    * finalized windows; later windows are still open when the stream
    * stops). Eviction is pinned structurally (the stripe batch updates
    * ZERO state rows) plus a bounded numRowsDroppedByWatermark check —
    * see [[StreamGenQuery.lateDraw]]. Window ends sit on the
    * minute grid (sessions on the microsecond grid of last-event + gap)
    * while the watermark carries the corpus max ts's microsecond offset,
    * so `w_end = watermark` ties cannot occur and the ≤ filter is
    * unambiguous.
    */
  private def ldQuery(seed: Int, rnd: Random): StreamGenQuery = {
    val shape = rnd.nextInt(3)
    val size = sizesMin(rnd.nextInt(sizesMin.length))
    val divisors = Vector(2, 3, 4).filter(size % _ == 0)
    val slide = size / divisors(rnd.nextInt(divisors.length))
    val gap = sessionGapsMin(rnd.nextInt(sessionGapsMin.length))
    val delayMin = Vector(30, 60, 180, 360)(rnd.nextInt(4))
    val keyDraw0 = rnd.nextInt(3)
    // session_window global aggregation is unsupported (see queryBody)
    val keyDraw = if (shape == 2 && keyDraw0 == 0) 1 else keyDraw0
    val km = 2 + rnd.nextInt(5)
    val m = 4 + rnd.nextInt(5)
    val r = rnd.nextInt(m)
    val aggs = aggPool(rnd).map(a => a.name -> a.col)

    val (shapeName, winDesc) = shape match {
      case 0 => ("tumbling", s"window($size min)")
      case 1 => ("sliding", s"window($size min, slide $slide min)")
      case _ => ("session", s"session_window(gap $gap min)")
    }
    val keyDesc = keyDraw match {
      case 0 => "no extra key"
      case 1 => "key=event_type"
      case _ => s"key=user_id%$km"
    }
    val build = (df0: DataFrame) => {
      val df = df0.withColumn("ts", col("ts").cast(TimestampType))
        .withWatermark("ts", s"$delayMin minutes")
      val winCol: Column = shape match {
        case 0 => window(col("ts"), s"$size minutes")
        case 1 => window(col("ts"), s"$size minutes", s"$slide minutes")
        case _ => session_window(col("ts"), s"$gap minutes")
      }
      val winName = if (shape == 2) "session_window" else "window"
      val keyCols: Seq[Column] = keyDraw match {
        case 0 => Nil
        case 1 => Seq(col("event_type").as("k0"))
        case _ => Seq(pmod(col("user_id"), lit(km)).cast("long").as("k0"))
      }
      val grouped = df.groupBy((winCol +: keyCols): _*)
        .agg(aggs.head._2.as(aggs.head._1),
          aggs.tail.map { case (n, c) => c.as(n) }: _*)
      val outCols =
        Seq(col(s"$winName.start").as("w_start"),
          col(s"$winName.end").as("w_end")) ++
          keyCols.indices.map(i => col(s"k$i")) ++
          aggs.map { case (n, _) => col(n) }
      grouped.select(outCols: _*)
    }

    val spanMin = if (shape == 2) gap else size
    val copies = if (shape == 1) size / slide else 1
    StreamGenQuery(seed, "latedrop",
      s"latedrop $shapeName $winDesc, $keyDesc, watermark $delayMin min, " +
        s"late stripe event_id%$m=$r, aggs=[${aggs.map(_._1).mkString(",")}]",
      s"$delayMin minutes", build,
      lateDraw = Some((delayMin, spanMin, m, r, copies)))
  }

  /** v6 dedicated variant: seeded STREAMING DEDUP
    * (dropDuplicatesWithinWatermark). The fixed st3 form dedups on the
    * UNIQUE event_id under a wide watermark, so two semantics never had
    * generated coverage: dedup on NON-unique keys (where which physical
    * row survives depends on delivery order — the build therefore
    * projects the KEY COLUMNS ONLY, making the emitted set a pure
    * function of the input set), and FINITE-delay behavior (late
    * duplicates are dropped at the operator input by the watermark
    * filter; distant same-key repeats whose state expired re-emit —
    * Spark's documented within-watermark-only guarantee).
    *
    * Key draws: event_id (unique — every duplicate is a replay),
    * user_id, (user_id, event_type), (user_id%km, event_type) — the
    * corpus genuinely repeats the non-unique keys across its ~30-day
    * span. Delay draws: wide ("10000 hours" — no eviction: emitted set ≡
    * batch DISTINCT of the keys EXACTLY under ARBITRARY shuffled cuts
    * with injected replays) or finite (120/360/1440 min — under
    * event-time-ASCENDING delivery the emitted key SET still equals
    * batch DISTINCT: expired-state repeats re-emit a key that is already
    * in the set, and ascending arrival means no on-time row is ever
    * dropped; a final batch re-delivering a drawn stripe of now-LATE
    * duplicates must be dropped by the watermark filter — the spec pins
    * the drop metric and that the output did not change).
    */
  private def dedupQuery(seed: Int, rnd: Random): StreamGenQuery = {
    val keyDraw = rnd.nextInt(4)
    val km = 2 + rnd.nextInt(5)
    val (keyDesc, keyCols: Seq[(String, Column)]) = keyDraw match {
      case 0 => ("event_id", Seq("k_id" -> col("event_id")))
      case 1 => ("user_id", Seq("k_uid" -> col("user_id")))
      case 2 => ("user_id+event_type",
        Seq("k_uid" -> col("user_id"), "k_type" -> col("event_type")))
      case _ => (s"user_id%$km+event_type",
        Seq("k_bucket" -> pmod(col("user_id"), lit(km)).cast("long"),
          "k_type" -> col("event_type")))
    }
    val finite = rnd.nextInt(10) < 5
    val delayMin = Vector(120, 360, 1440)(rnd.nextInt(3))
    val delayStr = if (finite) s"$delayMin minutes" else "10000 hours"
    val m = 4 + rnd.nextInt(5)
    val r = rnd.nextInt(m)

    val build = (df0: DataFrame) => {
      val named = df0.withColumn("ts", col("ts").cast(TimestampType))
        .select(col("ts") +: keyCols.map { case (n, c) => c.as(n) }: _*)
        .withWatermark("ts", delayStr)
      named.dropDuplicatesWithinWatermark(keyCols.map(_._1))
        .select(keyCols.map { case (n, _) => col(n) }: _*)
    }
    // independent batch reference: relational DISTINCT over the same key
    // projection — a different operator family than the streaming dedup
    // state (dropDuplicatesWithinWatermark has no batch form at all)
    val ref = (df0: DataFrame) =>
      df0.select(keyCols.map { case (n, c) => c.as(n) }: _*).distinct()
    // the same reference in DuckDB SQL (the fzst catalog oracle). pmod
    // renders as the sign-safe ((x % m) + m) % m — DuckDB's % keeps the
    // dividend's sign where Spark's pmod is non-negative. Explicit NULLS
    // FIRST mirrors Spark asc (driver determinism contract).
    val oracle = keyDraw match {
      case 0 => "SELECT DISTINCT event_id AS k_id FROM events ORDER BY k_id"
      case 1 => "SELECT DISTINCT user_id AS k_uid FROM events ORDER BY k_uid"
      case 2 => "SELECT DISTINCT user_id AS k_uid, event_type AS k_type " +
        "FROM events ORDER BY k_uid, k_type NULLS FIRST"
      case _ => s"SELECT DISTINCT ((user_id % $km) + $km) % $km AS k_bucket, " +
        "event_type AS k_type FROM events ORDER BY k_bucket, k_type NULLS FIRST"
    }
    StreamGenQuery(seed, if (finite) "dedup-finite" else "dedup-wide",
      s"dedup keys=$keyDesc watermark=$delayStr " +
        s"late-stripe event_id%$m=$r",
      delayStr, build, refBuild = Some(ref),
      lateDraw = Some((if (finite) delayMin else -1, 0, m, r, 1)),
      oracleSql = Some(oracle))
  }

  /** v5 dedicated variant: STREAM-STREAM interval joins — both join
    * inputs are streams (a seeded self-join: the event source split by
    * event_id parity, so the dual-mode build needs no second table), keyed
    * on user_id or a user_id%m bucket, under the canonical time-interval
    * condition `r_ts BETWEEN l_ts - A AND l_ts + B` (both bounds always
    * present: outer joins REQUIRE a state horizon, and the bounds are what
    * give join state a finite lifetime at 100 TB). Three sub-draws:
    *
    *   - INNER with a WIDE watermark ("10000 hours"): no state is ever
    *     evicted, so stream(cuts) ≡ batch join must hold EXACTLY under
    *     ARBITRARY shuffled delivery — the pure state-merge differential,
    *     same discipline as the v1 complete-mode tier;
    *   - INNER with a FINITE delay under event-time-ASCENDING delivery:
    *     eviction is live, but ascending arrival means a right row that
    *     could match an evicted left row would itself be below the
    *     watermark (and vice versa), so equality with the batch join stays
    *     EXACT — eviction exercised without losing determinism;
    *   - LEFT OUTER with a FINITE delay under ascending delivery: matches
    *     must equal the batch inner part exactly; NULL-extensions are
    *     emitted only when the watermark passes a left row's match horizon
    *     (l_ts + B), so the spec asserts a horizon-banded property — every
    *     unmatched left row a 1-minute margin PAST the final watermark
    *     horizon must have emitted, none before it may have (the margin
    *     absorbs the microsecond offsets; delivery appends one sacrificial
    *     LATE row as a final batch because eviction applies the watermark
    *     computed at the PREVIOUS batch's close).
    *
    * Payloads are integer cents (exact, order-free). The corpus guarantees
    * genuine unmatched left rows: at sf0.001 each key sees tens of rows
    * across a ~30-day span while A+B ≤ 10 h, so match gaps are real.
    */
  private def ssjQuery(seed: Int, rnd: Random): StreamGenQuery = {
    val aMin = Vector(0, 30, 120)(rnd.nextInt(3))
    val bMin = Vector(15, 60, 240, 600)(rnd.nextInt(4))
    val km = Vector(3, 5)(rnd.nextInt(2))
    val keyed = rnd.nextBoolean() // true: user_id%km, false: raw user_id
    val sub = rnd.nextInt(10) // 0-3 inner-wide, 4-6 inner-finite, 7-9 leftouter
    val (joinType, delayMin) = sub match {
      case s if s < 4 => ("inner", -1) // wide
      case s if s < 7 => ("inner", Vector(120, 360)(rnd.nextInt(2)))
      case _          => ("left_outer", Vector(120, 360)(rnd.nextInt(2)))
    }
    val delayStr = if (delayMin < 0) "10000 hours" else s"$delayMin minutes"
    val keyDesc = if (keyed) s"user_id%$km" else "user_id"

    val build = (df0: DataFrame) => {
      val base = df0.withColumn("ts", col("ts").cast(TimestampType))
      def keyCol = if (keyed) pmod(col("user_id"), lit(km)).cast("long")
                   else col("user_id").cast("long")
      val lhs = base.filter(col("event_id") % 2 === 0).select(
        keyCol.as("lk"), col("event_id").as("l_id"), col("ts").as("l_ts"),
        (col("value") * 100).cast("long").as("l_cents"))
        .withWatermark("l_ts", delayStr)
      val rhs = base.filter(col("event_id") % 2 === 1).select(
        keyCol.as("rk"), col("event_id").as("r_id"), col("ts").as("r_ts"),
        (col("value") * 100).cast("long").as("r_cents"))
        .withWatermark("r_ts", delayStr)
      lhs.join(rhs,
        col("lk") === col("rk") &&
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL $aMin minutes") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $bMin minutes"),
        joinType)
        .select(col("lk").as("k"), col("l_id"), col("r_id"),
          col("l_cents"), col("r_cents"), col("l_ts"), col("r_ts"))
    }

    val mode = sub match {
      case s if s < 4 => "ssj-inner-wide"
      case s if s < 7 => "ssj-inner-finite"
      case _          => "ssj-leftouter"
    }
    StreamGenQuery(seed, mode,
      s"$mode key=$keyDesc interval=[-$aMin min, +$bMin min] " +
        s"watermark=$delayStr",
      delayStr, build,
      lateDraw = if (delayMin > 0) Some((delayMin, bMin, 0, 0, 0)) else None)
  }

  private def queryBody(seed: Int, rnd: Random): StreamGenQuery = {
    val shape = rnd.nextInt(3)
    val size = sizesMin(rnd.nextInt(sizesMin.length))
    val divisors = Vector(2, 3, 4).filter(size % _ == 0)
    val slide = size / divisors(rnd.nextInt(divisors.length))
    val gap = sessionGapsMin(rnd.nextInt(sessionGapsMin.length))
    val delay =
      if (shape == 2) delaysSession(rnd.nextInt(delaysSession.length))
      else delaysTumbling(rnd.nextInt(delaysTumbling.length))
    val keyDraw0 = rnd.nextInt(3)
    // Structured Streaming rejects GLOBAL aggregation with session_window
    // ("Global aggregation with session window in streaming query is not
    // supported", SQLSTATE XXKST — session-state merge is keyed), so a
    // keyless session draw is re-pointed at the event_type key; tumbling
    // and sliding shapes keep their keyless draws.
    val keyDraw = if (shape == 2 && keyDraw0 == 0) 1 else keyDraw0
    val km = 2 + rnd.nextInt(5)
    val aggs = aggPool(rnd)

    val (shapeName, winDesc) = shape match {
      case 0 => ("tumbling", s"window($size min)")
      case 1 => ("sliding", s"window($size min, slide $slide min)")
      case _ => ("session", s"session_window(gap $gap min)")
    }
    val keyDesc = keyDraw match {
      case 0 => "no extra key"
      case 1 => "key=event_type"
      case _ => s"key=user_id%$km"
    }

    val build = (df0: DataFrame) => {
      // NTZ corpus ts → instant under the session's pinned UTC TZ
      // (EventStreams.withEventTime's rule); watermark requires an instant.
      val df = df0.withColumn("ts", col("ts").cast(TimestampType))
        .withWatermark("ts", delay)
      val winCol: Column = shape match {
        case 0 => window(col("ts"), s"$size minutes")
        case 1 => window(col("ts"), s"$size minutes", s"$slide minutes")
        case _ => session_window(col("ts"), s"$gap minutes")
      }
      val winName = if (shape == 2) "session_window" else "window"
      val keyCols: Seq[Column] = keyDraw match {
        case 0 => Nil
        case 1 => Seq(col("event_type").as("k0"))
        case _ => Seq(pmod(col("user_id"), lit(km)).cast("long").as("k0"))
      }
      val grouped = df.groupBy((winCol +: keyCols): _*)
        .agg(aggs.head.col.as(aggs.head.name),
          aggs.tail.map(a => a.col.as(a.name)): _*)
      val outCols =
        Seq(col(s"$winName.start").as("w_start"),
          col(s"$winName.end").as("w_end")) ++
          keyCols.indices.map(i => col(s"k$i")) ++
          aggs.map(a => col(a.name))
      grouped.select(outCols: _*)
    }

    // TUMBLING draws whose aggregates are all DuckDB-renderable get an
    // oracle over the raw events table (the fzsw catalog tier): Spark's
    // tumbling window() aligns to the 1970 epoch, so w_start is exactly
    // floor(epoch/size)*size — rendered as BIGINT epoch SECONDS on both
    // sides (the catalog harness casts the sink's TIMESTAMP w_start/w_end
    // to long under the session's pinned UTC), which keeps timestamp
    // FORMATTING out of the hash entirely. Sliding windows would need a
    // row-explode DuckDB lacks and session windows have no closed SQL
    // form — both stay in the ScalaTest differential tier.
    val oracle =
      if (shape != 0 || aggs.exists(_.sql.isEmpty)) None
      else {
        val s = size * 60
        val keySel = keyDraw match {
          case 0 => ""
          case 1 => ", event_type AS k0"
          case _ => s", CAST(((user_id % $km) + $km) % $km AS BIGINT) AS k0"
        }
        val keyGrp = if (keyDraw == 0) "" else ", k0"
        val keyOrd = keyDraw match {
          case 0 => ""
          case 1 => ", k0 NULLS FIRST"
          case _ => ", k0"
        }
        Some(
          s"SELECT CAST(floor(epoch(ts) / $s) * $s AS BIGINT) AS w_start, " +
            s"CAST(floor(epoch(ts) / $s) * $s + $s AS BIGINT) AS w_end$keySel, " +
            aggs.map(a => s"${a.sql.get} AS ${a.name}").mkString(", ") +
            s" FROM events GROUP BY w_start, w_end$keyGrp" +
            s" ORDER BY w_start$keyOrd")
      }

    StreamGenQuery(seed, shapeName,
      s"$shapeName $winDesc, $keyDesc, watermark $delay, " +
        s"aggs=[${aggs.map(_.name).mkString(",")}]",
      delay, build, oracleSql = oracle)
  }
}
