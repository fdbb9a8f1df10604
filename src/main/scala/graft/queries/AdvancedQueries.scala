package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.AsofJoin

/** Advanced operators beyond stock Spark surface: as-of join, session
  * windows, and a composed training-data pipeline (filter → dedup → stats).
  */
object AdvancedQueries {

  val defs: Seq[Q] = Seq(
    Q(
      "j7_asof_join",
      "As-of join: each event attached to the user's most recent order " +
        "(o_orderdate <= ts). Union+running-window idiom — one shuffle on " +
        "the key; the oracle is DuckDB's range join + QUALIFY pick.",
      (s, d) => {
        val e = Tables.events(s, d).select("event_id", "user_id", "ts")
        val o = Tables.orders(s, d)
        AsofJoin.asofLeft(
          e, col("user_id"), col("ts"),
          o, col("o_custkey"), col("o_orderdate"),
          payload = Seq(col("o_orderdate"), col("o_orderkey"), col("o_totalprice")))
          .select(
            col("event_id"), col("user_id"),
            col("_asof.o_orderkey").as("last_orderkey"),
            round(col("_asof.o_totalprice"), 4).as("last_price"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, last_orderkey, last_price FROM (
             |  SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey,
             |    floor((o.o_totalprice) * 10000 + 0.5) / 10000 AS last_price,
             |    row_number() OVER (PARTITION BY e.event_id
             |      ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST) AS rn
             |  FROM events e LEFT JOIN orders o
             |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) t
             |WHERE rn = 1 ORDER BY event_id""".stripMargin)
    ),
    Q(
      "j7b_asof_native",
      "The same as-of semantics as j7 through the custom physical operator " +
        "(AsofJoinNode -> AsofJoinStrategy -> AsofJoinExec): one hash " +
        "exchange + sort per side, single forward merge per partition — " +
        "hash-checked against the identical DuckDB oracle as the window " +
        "idiom, so both implementations are pinned to the same semantics.",
      (s, d) => {
        val e = Tables.events(s, d).select("event_id", "user_id", "ts")
        val o = Tables.orders(s, d)
          .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
        graft.plans.AsofJoinNative.asofLeft(
          e, "user_id", "ts", o, "o_custkey", "o_orderdate",
          rightTiebreakCol = Some("o_orderkey"))
          .select(col("event_id"), col("user_id"),
            col("o_orderkey").as("last_orderkey"),
            round(col("o_totalprice"), 4).as("last_price"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, last_orderkey, last_price FROM (
             |  SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey,
             |    floor((o.o_totalprice) * 10000 + 0.5) / 10000 AS last_price,
             |    row_number() OVER (PARTITION BY e.event_id
             |      ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST) AS rn
             |  FROM events e LEFT JOIN orders o
             |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) t
             |WHERE rn = 1 ORDER BY event_id""".stripMargin)
    ),
    Q(
      "j7c_asof_tolerance",
      "Bounded as-of join (pandas merge_asof's tolerance): the most recent " +
        "order only counts within 30 days of the event, else NULL — stale " +
        "matches are usually worse than no match in feature engineering. " +
        "Implemented INSIDE the custom exec: the cached last-match is the " +
        "max rightTime <= leftTime, so the bound is one subtraction per " +
        "left row against that single candidate (older candidates are " +
        "strictly farther) — same one-exchange-per-side plan as j7b.",
      (s, d) => {
        val e = Tables.events(s, d).select("event_id", "user_id", "ts")
        val o = Tables.orders(s, d)
          .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
        graft.plans.AsofJoinNative.asofLeft(
          e, "user_id", "ts", o, "o_custkey", "o_orderdate",
          rightTiebreakCol = Some("o_orderkey"),
          toleranceUnits = Some(30L * 86400L * 1000000L)) // 30 days in µs
          .select(col("event_id"), col("user_id"),
            col("o_orderkey").as("last_orderkey"),
            round(col("o_totalprice"), 4).as("last_price"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, last_orderkey, last_price FROM (
             |  SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey,
             |    floor((o.o_totalprice) * 10000 + 0.5) / 10000 AS last_price,
             |    row_number() OVER (PARTITION BY e.event_id
             |      ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST) AS rn
             |  FROM events e LEFT JOIN orders o
             |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
             |      AND o.o_orderdate >= e.ts - INTERVAL 30 DAY) t
             |WHERE rn = 1 ORDER BY event_id""".stripMargin)
    ),
    Q(
      "j7d_asof_forward",
      "Forward as-of join (each click's NEXT purchase by the same user — " +
        "the conversion-attribution primitive) through the SAME backward " +
        "exec by time negation: max(-t_right) <= -t_left is min(t_right) " +
        ">= t_left, and a negated tiebreak keeps equal-time ties " +
        "deterministic (min purchase id). No second operator to maintain — " +
        "direction is a 2-column projection, the merge/distribution/" +
        "ordering machinery is shared. Times ride as negated epoch micros " +
        "(exact integers), originals stay in the payload.",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            (-unix_micros(col("ts").cast(TimestampType))).as("neg_ts"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"),
            (-unix_micros(col("ts").cast(TimestampType))).as("neg_pts"),
            (-col("event_id")).as("neg_pid"),
            col("event_id").as("purchase_id"))
        graft.plans.AsofJoinNative.asofLeft(
          clicks, "user_id", "neg_ts", purchases, "p_user", "neg_pts",
          rightTiebreakCol = Some("neg_pid"))
          .select(col("click_id"), col("user_id"), col("purchase_id"))
          .orderBy("click_id")
      },
      Some("""SELECT click_id, user_id, purchase_id FROM (
             |  SELECT c.event_id AS click_id, c.user_id,
             |    p.event_id AS purchase_id,
             |    row_number() OVER (PARTITION BY c.event_id
             |      ORDER BY p.ts ASC NULLS LAST, p.event_id ASC NULLS LAST) AS rn
             |  FROM (SELECT * FROM events WHERE event_type = 'click') c
             |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |    ON p.user_id = c.user_id AND p.ts >= c.ts) t
             |WHERE rn = 1 ORDER BY click_id""".stripMargin)
    ),
    Q(
      "j7e_asof_nearest",
      "Nearest as-of (merge_asof direction='nearest'): each click's " +
        "time-closest purchase, either direction — one backward + one " +
        "forward pass through the shared exec, then a projection picks " +
        "the closer match (abs diff; ties → smaller purchase id, enforced " +
        "by negated-id tiebreaks in BOTH passes so every layer is " +
        "deterministic). Two exchanges total, both on the user key — " +
        "still the sort-merge cost model, no pairwise scan.",
      (s, d) => {
        val ev = Tables.events(s, d)
        val us = unix_micros(col("ts").cast(TimestampType))
        val clicks = ev.where(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            us.as("cts"), (-us).as("neg_cts"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), us.as("pts"),
            (-us).as("neg_pts"), (-col("event_id")).as("neg_pid"),
            col("event_id").as("purchase_id"))
        val back = graft.plans.AsofJoinNative.asofLeft(
          clicks.select("click_id", "user_id", "cts"), "user_id", "cts",
          purchases.select(col("p_user"), col("pts"), col("neg_pid"),
            col("purchase_id").as("b_pid")), "p_user", "pts",
          rightTiebreakCol = Some("neg_pid"))
          .select(col("click_id"), col("user_id"), col("cts"),
            col("pts").as("b_pts"), col("b_pid"))
        val fwd = graft.plans.AsofJoinNative.asofLeft(
          clicks.select("click_id", "user_id", "neg_cts")
            .withColumnRenamed("click_id", "f_click"), "user_id", "neg_cts",
          purchases.select(col("p_user"), col("neg_pts"), col("neg_pid"),
            col("purchase_id").as("f_pid")), "p_user", "neg_pts",
          rightTiebreakCol = Some("neg_pid"))
          .select(col("f_click"), (-col("neg_pts")).as("f_pts"), col("f_pid"))
        val bd = col("cts") - col("b_pts")
        val fd = col("f_pts") - col("cts")
        back.join(fwd, col("click_id") === col("f_click"), "left")
          .select(col("click_id"), col("user_id"),
            when(col("b_pid").isNull, col("f_pid"))
              .when(col("f_pid").isNull, col("b_pid"))
              .when(fd < bd, col("f_pid"))
              .when(bd < fd, col("b_pid"))
              .otherwise(least(col("b_pid"), col("f_pid")))
              .as("purchase_id"))
          .orderBy("click_id")
      },
      Some("""SELECT click_id, user_id, purchase_id FROM (
             |  SELECT c.event_id AS click_id, c.user_id,
             |    p.event_id AS purchase_id,
             |    row_number() OVER (PARTITION BY c.event_id
             |      ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)) ASC NULLS LAST,
             |        p.event_id ASC NULLS LAST) AS rn
             |  FROM (SELECT * FROM events WHERE event_type = 'click') c
             |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |    ON p.user_id = c.user_id
             |      AND c.ts IS NOT NULL AND p.ts IS NOT NULL) t
             |WHERE rn = 1 ORDER BY click_id""".stripMargin)
    ),
    Q(
      "j8_range_join",
      "Banded range join: per anchor event, same-user events in the " +
        "following hour. Equality shuffle on (key, time-bucket) with 2x " +
        "anchor duplication + exact refinement — never a nested-loop theta " +
        "join (orders and events have disjoint time ranges, so the self " +
        "range join is the corpus's real interval workload).",
      (s, d) => {
        val probe = Tables.events(s, d).select(col("user_id"), col("ts"))
        val anchor = Tables.events(s, d).select(
          col("event_id").as("anchor_id"), col("user_id").as("r_user"),
          col("ts").as("r_ts"))
        graft.operators.RangeJoin.bandedRangeJoin(
          probe, col("user_id"), col("ts"),
          anchor, col("r_user"), col("r_ts"),
          width = 3600L)
          .groupBy("anchor_id").agg(count(lit(1)).as("n_following"))
          .orderBy("anchor_id")
      },
      Some("""SELECT b.event_id AS anchor_id, count(*) AS n_following
             |FROM events b JOIN events a
             |  ON a.user_id = b.user_id
             | AND a.ts >= b.ts
             | AND a.ts < b.ts + INTERVAL 1 HOUR
             |GROUP BY b.event_id ORDER BY anchor_id""".stripMargin)
    ),
    Q(
      "st4_session_window",
      "Session windows (30-min gap) per user over events — batch form of " +
        "streaming sessionization; oracle is the gaps-and-islands rewrite.",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("n_events"))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH marked AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
             |         THEN 1 ELSE 0 END AS brk
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |islands AS (
             |  SELECT user_id, ts,
             |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
             |  FROM marked)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL '30 minutes' AS session_end,
             |  count(*) AS n_events
             |FROM islands GROUP BY user_id, grp
             |ORDER BY user_id, session_start""".stripMargin)
    ),
    Q(
      "x6_training_pipeline",
      "Composed training-data pipeline: quality filter (length + stopword " +
        "ratio) → exact dedup on normalized text → per-language doc/token " +
        "stats. The end-to-end shape a 100 TB corpus-prep job takes; each " +
        "stage is the operator declared elsewhere in the catalog.",
      (s, d) => {
        val toks = split(col("text"), " ")
        val nTok = size(toks)
        val stopRatio = size(filter(toks, t => t.isin("a", "the"))).cast(DoubleType) /
          nTok.cast(DoubleType)
        val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
        Tables.documents(s, d)
          .where(nTok >= 20 && stopRatio < lit(0.3))
          .groupBy(norm.as("norm_text"), col("lang"))
          .agg(min(col("doc_id")).as("doc_id"), min(nTok.cast(LongType)).as("n_tokens"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
          .orderBy("lang")
      },
      Some("""WITH filtered AS (
             |  SELECT doc_id, lang,
             |    regexp_replace(trim(lower(text)), ' +', ' ', 'g') AS norm_text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents
             |  WHERE len(string_split(text, ' ')) >= 20
             |    AND CAST(len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the'))) AS DOUBLE)
             |        / len(string_split(text, ' ')) < 0.3),
             |deduped AS (
             |  SELECT norm_text, lang, min(doc_id) AS doc_id, min(n_tokens) AS n_tokens
             |  FROM filtered GROUP BY norm_text, lang)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
             |FROM deduped GROUP BY lang ORDER BY lang""".stripMargin)
    )
  )
}
