package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.Tables

/** Group ST — batch-equivalent forms of the streaming queries (SURVEY §2.11
  * ST1-ST3). The *streaming* implementations (readStream + watermark +
  * windowed state) live in `graft.streaming.EventStreams` and are verified by
  * the ScalaTest batch-equivalence suite (SURVEY §5.5); these batch forms are
  * what the DuckDB oracle can check (DuckDB cannot run a stream — SURVEY §7
  * risk 4), and Spark guarantees a windowed streaming agg converges to
  * exactly this batch result once the watermark passes.
  */
object StreamEquivQueries {

  import graft.queries.Canon.dsum

  val defs: Seq[Q] = Seq(
    Q(
      "st1_tumbling_counts",
      "Tumbling 1-hour event counts by type (streaming form adds a 10-min " +
        "watermark; state is one row per (window, type) — bounded by the " +
        "watermark horizon, never by stream length).",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))
          .orderBy("window_start", "event_type")
      },
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             |  event_type, count(*) AS cnt
             |FROM events GROUP BY 1, 2
             |ORDER BY window_start, event_type""".stripMargin)
    ),
    Q(
      "st2_sliding_sum",
      "Sliding window (1 h length, 15 min slide) sum(value): each event lands " +
        "in 4 windows; the oracle reconstructs the same window set with " +
        "time_bucket arithmetic.",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "15 minutes"))
          .agg(round(dsum(col("value")).cast(DoubleType), 4).as("sum_value"),
            count(lit(1)).as("cnt"))
          .select(col("window.start").as("window_start"), col("sum_value"), col("cnt"))
          .orderBy("window_start")
      },
      Some("""SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS window_start,
             |  floor((CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS sum_value,
             |  count(*) AS cnt
             |FROM events, (SELECT unnest(range(0, 4)) AS k)
             |GROUP BY 1 ORDER BY window_start""".stripMargin)
    ),
    Q(
      "st3_dedup_events",
      "Deduplication on event_id with deterministic survivor semantics " +
        "(min(ts) + arrival count); streaming form is " +
        "dropDuplicatesWithinWatermark.",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(col("event_id"))
          .agg(min(col("ts")).as("first_ts"), count(lit(1)).as("n_arrivals"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, min(ts) AS first_ts, count(*) AS n_arrivals
             |FROM events GROUP BY event_id ORDER BY event_id""".stripMargin)
    )
  )
}
