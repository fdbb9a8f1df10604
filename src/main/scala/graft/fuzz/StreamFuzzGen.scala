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

  def query(seed: Int): StreamGenQuery = {
    val rnd = new Random(seed)
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
