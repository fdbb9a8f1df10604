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
      /** tumbling | sliding | session */
      shape: String,
      /** human-readable draw summary (window geometry, keys, aggs) */
      desc: String,
      /** drawn watermark delay (applied inside build) */
      delay: String,
      build: DataFrame => DataFrame)

  /** Window sizes in minutes; the sf0.001 events span ~days, so these give
    * from a handful to hundreds of windows.
    */
  private val sizesMin = Vector(15, 30, 60, 120, 360, 1440)
  private val sessionGapsMin = Vector(10, 30, 60, 180)
  private val delaysTumbling =
    Vector("30 minutes", "2 hours", "1 day", "10000 hours")
  private val delaysSession = Vector("5000 hours", "10000 hours")

  private def aggPool(rnd: Random): Seq[(String, Column)] = {
    val m = 2 + rnd.nextInt(5)
    val all = Vector[(String, Column)](
      "cnt" -> count(lit(1)),
      // integer cents: per-row truncation is deterministic, long sums are
      // exactly mergeable in any order
      "sum_cents" -> sum((col("value") * 100).cast("long")),
      "min_cents" -> min((col("value") * 100).cast("long")),
      "max_cents" -> max((col("value") * 100).cast("long")),
      "sum_dec" -> sum(col("value").cast(DecimalType(38, 6))),
      "n_click" -> count(when(col("event_type") === "click", lit(1))),
      "max_eid" -> max(col("event_id")),
      "n_bucket0" -> count(when(pmod(col("user_id"), lit(m)) === 0, lit(1))))
    val k = 1 + rnd.nextInt(3)
    rnd.shuffle(all).take(k).sortBy(_._1)
  }

  def query(seed: Int): StreamGenQuery = query(seed, 1)

  /** Versioned entry point (FuzzGen's fall-through discipline): v2 draws
    * one extra up-front mode byte and may dispatch to the STREAM-STATIC
    * JOIN variant; otherwise it falls through to the v1 body with the
    * advanced rnd state. v1 seeds keep their draws bit-identical.
    */
  def query(seed: Int, version: Int): StreamGenQuery = {
    val rnd = new Random(seed)
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
    val baseAggs = aggPool(rnd)
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
      s"$shapeName $winDesc, $keyDesc, watermark $delay, " +
        s"aggs=[${aggs.map(_._1).mkString(",")}]",
      delay, build)
  }
}
