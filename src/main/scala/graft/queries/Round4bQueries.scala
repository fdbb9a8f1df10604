package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.Tables

/** Round-4 continuation: the ETL-maintenance operators the reference's
  * domain actually needs (CDC merge/upsert, gaps-and-islands change runs,
  * data profiling, incremental aggregation), the stream-stream interval
  * join's batch-equivalent form (ST5's oracle), the salted-join skew
  * operator surfaced as an oracle-gated query, and remaining SQL-surface
  * parity items (listagg WITHIN GROUP, timestamp arithmetic) plus a
  * train/val contamination check for the training-data pipeline.
  *
  * Scale notes inline per entry; every query ends in a total ORDER BY and
  * routes doubles through DECIMAL + Canon.round per the §2.11 contract.
  */
object Round4bQueries {

  import graft.queries.Canon.dsum

  val defs: Seq[Q] = Seq(
    Q(
      "st5_interval_join",
      "Batch-equivalent of ST5 (EventStreams.purchaseClickJoin): each " +
        "purchase joined to the same user's clicks in the preceding hour. " +
        "The streaming form bounds join state by watermark eviction; this " +
        "batch form is what DuckDB can check, and the watermarked stream " +
        "converges to exactly it. One shuffle on user_id; the interval " +
        "predicate is a post-join filter on co-partitioned rows, not a " +
        "cross product.",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
            col("event_id").as("click_id"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
            col("event_id").as("purchase_id"))
        purchases.join(clicks,
          col("p_user") === col("c_user") &&
            col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
            col("click_ts") <= col("purchase_ts"))
          .select(col("purchase_id"), col("click_id"),
            col("p_user").as("user_id"))
          .orderBy("purchase_id", "click_id")
      },
      Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             |  p.user_id AS user_id
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |ON p.user_id = c.user_id
             |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
             |ORDER BY purchase_id, click_id""".stripMargin)
    ),
    Q(
      "r10_merge_upsert",
      "CDC merge (MERGE INTO semantics on plain tables): a deterministic " +
        "change batch — updates (+1000 price for status-O keys ≡ 0 mod 7) " +
        "and deletes (status-F keys ≡ 0 mod 13) — merged latest-wins into " +
        "the base. One left join on the key + anti filter for deletes; " +
        "with the base bucketed on the key the join is shuffle-free on " +
        "the big side, which is how an append-only reference pipeline " +
        "(big_uery_handler.py:158-165) grows into upserts at 100 TB.",
      (s, d) => {
        val base = Tables.orders(s, d)
        val updates = base
          .filter(col("o_orderstatus") === "O" &&
            pmod(col("o_orderkey"), lit(7)) === 0)
          .select(col("o_orderkey").as("k"),
            (col("o_totalprice") + 1000d).as("new_price"), lit("U").as("op"))
        val deletes = base
          .filter(col("o_orderstatus") === "F" &&
            pmod(col("o_orderkey"), lit(13)) === 0)
          .select(col("o_orderkey").as("k"),
            lit(null).cast(DoubleType).as("new_price"), lit("D").as("op"))
        base.join(updates.unionByName(deletes),
            col("o_orderkey") === col("k"), "left")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(col("o_orderkey"),
            round(coalesce(col("new_price"), col("o_totalprice")), 4)
              .as("price"),
            coalesce(col("op"), lit("B")).as("src"))
          .orderBy("o_orderkey")
      },
      Some("""WITH changes AS (
             |  SELECT o_orderkey AS k, o_totalprice + 1000 AS new_price, 'U' AS op
             |  FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 7 = 0
             |  UNION ALL
             |  SELECT o_orderkey AS k, NULL AS new_price, 'D' AS op
             |  FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 13 = 0)
             |SELECT o_orderkey,
             |  floor(coalesce(new_price, o_totalprice) * 10000 + 0.5) / 10000 AS price,
             |  coalesce(op, 'B') AS src
             |FROM orders LEFT JOIN changes ON o_orderkey = k
             |WHERE op IS NULL OR op <> 'D'
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "w8_gaps_islands",
      "Gaps-and-islands: runs of consecutive same-status orders per " +
        "customer (the row_number-difference trick — two windows over ONE " +
        "exchange: hash(o_custkey) satisfies both partitionings, so the " +
        "second window only re-sorts, never reshuffles; plan-asserted). " +
        "min(o_orderkey) per run is the unique run id the " +
        "total ORDER BY needs; this is SCD-style change tracking done " +
        "relationally.",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_w8")
        s.sql(
          """WITH s AS (
            |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
            |    row_number() OVER (PARTITION BY o_custkey
            |                       ORDER BY o_orderdate, o_orderkey) AS rn,
            |    row_number() OVER (PARTITION BY o_custkey, o_orderstatus
            |                       ORDER BY o_orderdate, o_orderkey) AS rns
            |  FROM orders_w8)
            |SELECT o_custkey, o_orderstatus,
            |  min(o_orderkey) AS run_first_key,
            |  min(o_orderdate) AS run_start, max(o_orderdate) AS run_end,
            |  count(*) AS run_len
            |FROM s GROUP BY o_custkey, o_orderstatus, rn - rns
            |ORDER BY o_custkey, run_first_key""".stripMargin)
      },
      Some("""WITH s AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_orderdate, o_orderkey) AS rn,
             |    row_number() OVER (PARTITION BY o_custkey, o_orderstatus
             |                       ORDER BY o_orderdate, o_orderkey) AS rns
             |  FROM orders)
             |SELECT o_custkey, o_orderstatus,
             |  min(o_orderkey) AS run_first_key,
             |  min(o_orderdate) AS run_start, max(o_orderdate) AS run_end,
             |  count(*) AS run_len
             |FROM s GROUP BY o_custkey, o_orderstatus, rn - rns
             |ORDER BY o_custkey, run_first_key""".stripMargin)
    ),
    Q(
      "dq1_profile",
      "Data-quality profile: null count / exact distinct / min / max per " +
        "column, one independent narrow aggregation per column unioned " +
        "long. Numeric min/max ride as floor-scaled integer strings so " +
        "the mixed-type value column never hits engine float formatting. " +
        "Per-column branches each scan ONLY their column (parquet " +
        "pruning) and carry a partial-aggregated exact distinct — faster " +
        "than the single-pass multi-countDistinct form, whose Expand " +
        "multiplies every row by the column count (measured 2.6 s → " +
        "~0.7 s at sf0.1); at 100 TB swap exact distinct for " +
        "approx_count_distinct (a8's sketch).",
      (s, d) => {
        val orders = Tables.orders(s, d)
        def profile(c: String, minMax: String => org.apache.spark.sql.Column)
            : org.apache.spark.sql.DataFrame =
          orders.agg(
            count(when(col(c).isNull, 1)).as("n_nulls"),
            countDistinct(col(c)).as("n_distinct"),
            minMax("min").as("min_val"), minMax("max").as("max_val"))
            .select(lit(c).as("col_name"), col("n_nulls"), col("n_distinct"),
              col("min_val"), col("max_val"))
        def str(c: String)(f: String) =
          (if (f == "min") min(col(c)) else max(col(c))).cast(StringType)
        def cents(c: String)(f: String) =
          floor((if (f == "min") min(col(c)) else max(col(c))) * 100 + 0.5)
            .cast(LongType).cast(StringType)
        profile("o_orderstatus", str("o_orderstatus"))
          .unionByName(profile("o_orderpriority", str("o_orderpriority")))
          .unionByName(profile("o_custkey", str("o_custkey")))
          .unionByName(profile("o_totalprice", cents("o_totalprice")))
          .orderBy("col_name")
      },
      Some("""SELECT 'o_orderstatus' AS col_name,
             |  count(*) FILTER (WHERE o_orderstatus IS NULL) AS n_nulls,
             |  count(DISTINCT o_orderstatus) AS n_distinct,
             |  min(o_orderstatus) AS min_val, max(o_orderstatus) AS max_val
             |FROM orders
             |UNION ALL
             |SELECT 'o_orderpriority',
             |  count(*) FILTER (WHERE o_orderpriority IS NULL),
             |  count(DISTINCT o_orderpriority),
             |  min(o_orderpriority), max(o_orderpriority)
             |FROM orders
             |UNION ALL
             |SELECT 'o_custkey',
             |  count(*) FILTER (WHERE o_custkey IS NULL),
             |  count(DISTINCT o_custkey),
             |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
             |FROM orders
             |UNION ALL
             |SELECT 'o_totalprice',
             |  count(*) FILTER (WHERE o_totalprice IS NULL),
             |  count(DISTINCT o_totalprice),
             |  CAST(CAST(floor(min(o_totalprice) * 100 + 0.5) AS BIGINT) AS VARCHAR),
             |  CAST(CAST(floor(max(o_totalprice) * 100 + 0.5) AS BIGINT) AS VARCHAR)
             |FROM orders
             |ORDER BY col_name""".stripMargin)
    ),
    Q(
      "j12_salted_join",
      "Skew-salted equi-join surfaced as a declared query: lineitem ⋈ " +
        "supplier through SaltedJoin (hot key's rows spread over 8 salted " +
        "reducers; small side replicated 8×), then revenue per supplier " +
        "nation. The oracle is the PLAIN join — salting must be " +
        "result-invariant, and this gate proves it. Manual fallback for " +
        "when AQE skew splitting can't reach the operator; salt is " +
        "xxhash64-derived (deterministic under retries).",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val sup = Tables.supplier(s, d)
        graft.operators.SaltedJoin.saltedEquiJoin(
            li, li("l_suppkey"), sup, sup("s_suppkey"),
            salts = 8,
            uniquifier = li("l_orderkey") * lit(8) + li("l_linenumber"))
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_items"),
            round(dsum(col("l_extendedprice")).cast(DoubleType), 4)
              .as("revenue"))
          .orderBy("s_nationkey")
      },
      Some("""SELECT s_nationkey, count(*) AS n_items,
             |  floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             |        * 10000 + 0.5) / 10000 AS revenue
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
    ),
    Q(
      "a17_listagg",
      "SQL-standard listagg WITHIN GROUP (Spark 4): nations per region as " +
        "an ordered comma-joined string — the ISO surface over f16's " +
        "sort_array(collect_list) idiom. The WITHIN GROUP order makes the " +
        "string deterministic regardless of partitioning; group state is " +
        "the concatenated string, so at scale it belongs on bounded-" +
        "cardinality groups (dims), not per-document blobs.",
      (s, d) => {
        Tables.nation(s, d).createOrReplaceTempView("nation_a17")
        Tables.region(s, d).createOrReplaceTempView("region_a17")
        s.sql(
          """SELECT r_name,
            |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
            |  count(*) AS n
            |FROM nation_a17 JOIN region_a17 ON n_regionkey = r_regionkey
            |GROUP BY r_name ORDER BY r_name""".stripMargin)
      },
      Some("""SELECT r_name,
             |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
             |  count(*) AS n
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)
    ),
    Q(
      "f27_timestamp_arith",
      "Timestamp arithmetic: +90-minute shift, minutes into the current " +
        "hour, whole hours since an aligned epoch anchor. Spark " +
        "timestampdiff counts complete units; DuckDB date_diff counts " +
        "boundary crossings — identical ONLY because both anchors " +
        "(date_trunc and an aligned literal ≤ min(ts)) sit on unit " +
        "boundaries, which the oracle encodes. All codegen'd projections.",
      (s, d) => {
        Tables.events(s, d).select(
          col("event_id"),
          expr("timestampadd(MINUTE, 90, ts)").as("ts_plus90"),
          expr("timestampdiff(MINUTE, date_trunc('hour', ts), ts)")
            .cast(LongType).as("min_into_hour"),
          expr("timestampdiff(HOUR, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)")
            .cast(LongType).as("hours_since"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  ts + INTERVAL 90 MINUTE AS ts_plus90,
             |  date_diff('minute', date_trunc('hour', ts), ts) AS min_into_hour,
             |  date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS hours_since
             |FROM events ORDER BY event_id""".stripMargin)
    ),
    Q(
      "x13_contamination",
      "Train/val contamination check: documents whose normalized 60-char " +
        "prefix fingerprint appears in both the train and val splits of " +
        "x7's deterministic doc_id-mod partition (exact-text overlap is " +
        "the degenerate case; prefix fingerprints catch the " +
        "boilerplate-prefix dupes that actually leak eval data). One " +
        "equi-join on the fingerprint — at 100 TB both sides hash-" +
        "partition on it; no pairwise scan.",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          substring(lower(trim(col("text"))), 1, 60).as("fp"))
        val train = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
          .select(col("doc_id").as("train_doc"), col("fp"))
        val valSplit = docs.filter(pmod(col("doc_id"), lit(10)) === 8)
          .select(col("doc_id").as("val_doc"), col("fp"))
        train.join(valSplit, "fp")
          .select(col("train_doc"), col("val_doc"))
          .orderBy("train_doc", "val_doc")
      },
      Some("""WITH f AS (SELECT doc_id,
             |    substring(lower(trim(text)), 1, 60) AS fp FROM documents)
             |SELECT a.doc_id AS train_doc, b.doc_id AS val_doc
             |FROM f a JOIN f b ON a.fp = b.fp
             |WHERE a.doc_id % 10 < 8 AND b.doc_id % 10 = 8
             |ORDER BY train_doc, val_doc""".stripMargin)
    ),
    Q(
      "r12_parameterized",
      "Parameterized SQL (named markers, Spark 4): the run window and " +
        "status arrive as TYPED parameters, not interpolated text — the " +
        "injection-safe fix for the reference's f-string SQL assembly " +
        "(big_uery_handler.py:147-163, where a crafted column name would " +
        "execute). Markers bind as literals in the analyzed plan, so " +
        "constant folding and partition pruning see them exactly like " +
        "hand-written constants.",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_r12")
        s.sql(
          """SELECT o_orderpriority, count(*) AS n
            |FROM orders_r12
            |WHERE o_orderdate >= :lo AND o_orderdate < :hi
            |  AND o_orderstatus = :status
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
          Map("lo" -> java.time.LocalDateTime.of(1996, 1, 1, 0, 0),
            "hi" -> java.time.LocalDateTime.of(1997, 1, 1, 0, 0),
            "status" -> "O"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND o_orderstatus = 'O'
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    ),
    Q(
      "r11_sql_script",
      "Spark 4 SQL scripting: a BEGIN…END ETL control block — DECLARE'd " +
        "cutoff, a scalar probe into a variable, IF/ELSE branch picking " +
        "the aggregation — the procedural surface the reference builds in " +
        "Python around BigQuery calls (fresh_picked_leads.py:224-266), " +
        "expressed engine-side. Control flow runs on the driver; every " +
        "statement inside is still a full Catalyst-planned distributed " +
        "query, so scripting adds sequencing, not a row-at-a-time regime. " +
        "Oracle replicates the branch the data makes both engines take.",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_r11")
        s.sql(
          """BEGIN
            |  DECLARE cutoff TIMESTAMP_NTZ DEFAULT TIMESTAMP_NTZ '1998-01-01 00:00:00';
            |  DECLARE n_recent BIGINT;
            |  SET n_recent = (SELECT count(*) FROM orders_r11 WHERE o_orderdate >= cutoff);
            |  IF n_recent > 0 THEN
            |    SELECT o_orderstatus, count(*) AS n, 'recent' AS branch
            |    FROM orders_r11 WHERE o_orderdate >= cutoff
            |    GROUP BY o_orderstatus ORDER BY o_orderstatus;
            |  ELSE
            |    SELECT o_orderstatus, count(*) AS n, 'all' AS branch
            |    FROM orders_r11 GROUP BY o_orderstatus ORDER BY o_orderstatus;
            |  END IF;
            |END""".stripMargin)
      },
      Some("""SELECT o_orderstatus, count(*) AS n, 'recent' AS branch
             |FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),
    Q(
      "f28_variant",
      "Spark 4 VARIANT semi-structured path: events.props parsed once to a " +
        "typed-agnostic variant (binary-encoded, predicate-pushable — the " +
        "open-format answer to 'schema unknown at write time'), fields " +
        "extracted via variant_get with per-use target types. Beside " +
        "f9's string JsonPath and x5's rigid from_json struct, variant is " +
        "the scale default for heterogeneous props: parse cost paid once, " +
        "extraction codegen'd, no schema migration when producers add keys.",
      (s, d) => {
        Tables.events(s, d).select(
          col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k_long"),
          expr("variant_get(parse_json(props), '$.k', 'string')").as("k_str"),
          expr("variant_get(parse_json(props), '$.missing', 'bigint')").as("k_missing"),
          (expr("variant_get(parse_json(props), '$.k', 'bigint')") * 2)
            .as("k_doubled"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  CAST(props ->> '$.k' AS BIGINT) AS k_long,
             |  props ->> '$.k' AS k_str,
             |  CAST(props ->> '$.missing' AS BIGINT) AS k_missing,
             |  CAST(props ->> '$.k' AS BIGINT) * 2 AS k_doubled
             |FROM events ORDER BY event_id""".stripMargin)
    ),
    Q(
      "a19_skew_distinct",
      "Skew-safe exact distinct: count(DISTINCT supplier) per return flag " +
        "rewritten as two hash aggregations — groupBy(flag, supp) dedup, " +
        "then groupBy(flag) count. With 3 flags over all of lineitem the " +
        "naive per-group distinct-set state concentrates on 3 reducers; " +
        "the rewrite's first phase keys on (flag, supp) — full parallelism, " +
        "map-side combinable — and the second counts pre-deduped rows. " +
        "Identical result by construction; the oracle is the naive form.",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_suppkey")).agg(lit(1))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_supp"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "a20_minmax_by",
      "Argmin/argmax aggregates: each customer's priciest and cheapest " +
        "order via max_by/min_by (one hash agg — no window, no self-join; " +
        "the agg buffer is a single (value, ordering) pair, map-side " +
        "combinable). Price ties are broken deterministically by a STRUCT " +
        "ordering key (cents, orderkey) — lexicographic over native types, " +
        "so no packed-integer overflow at any price or key range, where " +
        "max_by/arg_max tie-breaking is otherwise engine- and " +
        "partition-order-defined. (DuckDB's arg_max can't take a struct " +
        "key, so the oracle computes the same rows by window rank.)",
      (s, d) => {
        val ord = struct(
          floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("cents"),
          col("o_orderkey").as("okey"))
        Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(
            max_by(col("o_orderkey"), ord).as("best_order"),
            round(max_by(col("o_totalprice"), ord), 4).as("best_price"),
            min_by(col("o_orderkey"), ord).as("worst_order"),
            round(min_by(col("o_totalprice"), ord), 4).as("worst_price"))
          .orderBy("o_custkey")
      },
      Some("""WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY floor(o_totalprice * 100 + 0.5) DESC,
             |               o_orderkey DESC) AS rmax,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY floor(o_totalprice * 100 + 0.5) ASC,
             |               o_orderkey ASC) AS rmin
             |  FROM orders)
             |SELECT b.o_custkey,
             |  b.o_orderkey AS best_order,
             |  floor(b.o_totalprice * 10000 + 0.5) / 10000 AS best_price,
             |  w.o_orderkey AS worst_order,
             |  floor(w.o_totalprice * 10000 + 0.5) / 10000 AS worst_price
             |FROM (SELECT * FROM r WHERE rmax = 1) b
             |JOIN (SELECT * FROM r WHERE rmin = 1) w ON b.o_custkey = w.o_custkey
             |ORDER BY b.o_custkey""".stripMargin)
    ),
    Q(
      "a18_approx_percentile",
      "Approximate percentiles (KLL-style sketch behind approx_percentile): " +
        "p50/p90/p99 of extended price per return flag with accuracy 1000 — " +
        "the mergeable fixed-memory scale path beside a7's exact " +
        "percentile_cont, whose per-group sorted-array buffer is the thing " +
        "that dies first at 100 TB. Rows-only check (sketch internals " +
        "aren't DuckDB-reproducible); rank-error bound asserted in spec.",
      (s, d) => {
        Tables.lineitem(s, d).groupBy("l_returnflag")
          .agg(expr(
            "approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), 1000)")
            .as("qs"))
          .select(col("l_returnflag"),
            round(element_at(col("qs"), 1), 4).as("p50"),
            round(element_at(col("qs"), 2), 4).as("p90"),
            round(element_at(col("qs"), 3), 4).as("p99"))
          .orderBy("l_returnflag")
      },
      None
    ),
    Q(
      "x15_int8_quantize",
      "Embedding int8 quantization: per-vector absmax scale (max|x|/127), " +
        "elements quantized to floor(x/scale + 0.5) — the 4×-compression " +
        "step before ANN/shipping embeddings at 100 TB. Pure per-row " +
        "projection (no shuffle). Both engines evaluate the identical " +
        "IEEE double chain: float→double widening is exact, and the " +
        "nullif(scale, 0) guard makes the all-zero-vector edge NULL-" +
        "propagate identically instead of diverging on ±Inf handling. " +
        "Output carries scale + quantized min/max/sum as the checkable " +
        "digest (500 × 64 raw values would bloat the compare).",
      (s, d) => {
        val sc = nullif(
          array_max(transform(col("embedding"), x => abs(x))).cast(DoubleType)
            / 127d, lit(0d))
        Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"), sc.as("sc"))
          .select(col("vec_id"), col("sc"),
            transform(col("embedding"),
              x => floor(x.cast(DoubleType) / col("sc") + 0.5).cast(LongType))
              .as("qv"))
          .select(col("vec_id"),
            round(col("sc"), 6).as("scale_r"),
            array_min(col("qv")).as("qmin"),
            array_max(col("qv")).as("qmax"),
            aggregate(col("qv"), lit(0L), (a, x) => a + x).as("qsum"))
          .orderBy("vec_id")
      },
      Some("""WITH s AS (SELECT vec_id, embedding,
             |    nullif(CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
             |           / 127, 0) AS sc
             |  FROM embeddings),
             |q AS (SELECT vec_id, sc,
             |    list_transform(embedding,
             |      x -> CAST(floor(CAST(x AS DOUBLE) / sc + 0.5) AS BIGINT)) AS qv
             |  FROM s)
             |SELECT vec_id, floor(sc * 1000000 + 0.5) / 1000000 AS scale_r,
             |  CAST(list_min(qv) AS BIGINT) AS qmin,
             |  CAST(list_max(qv) AS BIGINT) AS qmax,
             |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS qsum
             |FROM q ORDER BY vec_id""".stripMargin)
    ),
    Q(
      "x19_event_funnel",
      "Ordered-event funnel: users who viewed, then clicked AFTER their " +
        "first view, then purchased AFTER that first qualifying click — " +
        "per-stage user counts plus stage-to-stage conversion. Each stage " +
        "is one groupBy-min over the co-partitioned (user) events joined " +
        "to the previous stage's timestamps — O(stages) hash joins on the " +
        "user key, never a per-user sequence scan; the product-analytics " +
        "shape (funnel/retention) beside st4's sessionization.",
      (s, d) => {
        val ev = Tables.events(s, d)
        def stage(t: String) = ev.where(col("event_type") === t)
        val v = stage("view").groupBy(col("user_id"))
          .agg(min(col("ts")).as("vt"))
        val c = stage("click").join(v, "user_id")
          .where(col("ts") > col("vt"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("ct"))
        val p = stage("purchase").join(c, "user_id")
          .where(col("ts") > col("ct"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("pt"))
        // ONE agg-of-aggs plan, lazy until the caller acts: stage counts
        // are 1-row global aggregates cross-joined (broadcast of single
        // rows), rates derived in-plan. NULLIF guards empty stages the
        // same way the oracle does (ansi=false x/NULL → NULL either way).
        // The shared v/c prefixes dedup at execution via ReusedExchange —
        // identical aggregate exchanges are built once per plan, which is
        // what the pre-r5 cache()+count() dance bought, without the three
        // eager jobs at build time.
        val nv = v.agg(count(lit(1)).as("n_view"))
        val nc = c.agg(count(lit(1)).as("n_click_after_view"))
        val np = p.agg(count(lit(1)).as("n_purchase_after_click"))
        nv.crossJoin(nc).crossJoin(np).select(
          col("n_view"), col("n_click_after_view"), col("n_purchase_after_click"),
          round(col("n_click_after_view").cast(DoubleType) /
            nullif(col("n_view").cast(DoubleType), lit(0.0)), 4)
            .as("view_to_click"),
          round(col("n_purchase_after_click").cast(DoubleType) /
            nullif(col("n_click_after_view").cast(DoubleType), lit(0.0)), 4)
            .as("click_to_purchase"))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS vt FROM events
             |          WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(e.ts) AS ct
             |      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.vt
             |      WHERE e.event_type = 'click' GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(e.ts) AS pt
             |      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.ct
             |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
             |SELECT (SELECT count(*) FROM v) AS n_view,
             |  (SELECT count(*) FROM c) AS n_click_after_view,
             |  (SELECT count(*) FROM p) AS n_purchase_after_click,
             |  floor(CAST((SELECT count(*) FROM c) AS DOUBLE)
             |        / NULLIF((SELECT count(*) FROM v), 0) * 10000 + 0.5) / 10000 AS view_to_click,
             |  floor(CAST((SELECT count(*) FROM p) AS DOUBLE)
             |        / NULLIF((SELECT count(*) FROM c), 0) * 10000 + 0.5) / 10000 AS click_to_purchase""".stripMargin)
    ),
    Q(
      "w9_interval_frame",
      "RANGE frame with an INTERVAL boundary: per-customer rolling 30-day " +
        "order count and DECIMAL-exact spend directly on the timestamp " +
        "ordering — the SQL-standard sibling of w5's epoch-seconds " +
        "rangeBetween (no manual epoch conversion; the frame is " +
        "value-based, so equal dates share one frame regardless of row " +
        "order — what makes it deterministic without a tiebreak column).",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_w9")
        s.sql(
          """SELECT o_orderkey, o_custkey,
            |  count(*) OVER w AS n_30d,
            |  floor(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)
            |        * 10000 + 0.5) / 10000 AS spend_30d
            |FROM orders_w9
            |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
            |             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  count(*) OVER w AS n_30d,
             |  floor(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)
             |        * 10000 + 0.5) / 10000 AS spend_30d
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             |             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "x18_incremental_dedup",
      "Incremental dedup: an incoming batch (doc_id ≡ 9 mod 10) checked " +
        "against the existing corpus by fingerprint equi-join PLUS " +
        "within-batch self-dedup — never re-clustering the corpus. Each " +
        "incoming doc reports its match count in the corpus, its " +
        "within-batch duplicate group's canonical id, and the verdict " +
        "(keep the batch-canonical of unseen fingerprints). At 100 TB the " +
        "corpus side is a pre-built fingerprint index; daily cost is " +
        "O(batch), not O(corpus) — the batch form of what dd_cluster does " +
        "wholesale.",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          substring(lower(trim(col("text"))), 1, 60).as("fp"))
        val incoming = docs.filter(pmod(col("doc_id"), lit(10)) === 9)
        val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 9)
        val corpusHits = incoming.join(
            corpus.select(col("fp"), lit(1).as("hit")), Seq("fp"), "left")
          .groupBy(col("doc_id"), col("fp"))
          .agg(count(col("hit")).as("n_corpus_dups"))
        val batchCanon = incoming.groupBy("fp")
          .agg(min(col("doc_id")).as("batch_canonical"))
        corpusHits.join(batchCanon, "fp")
          .select(col("doc_id"), col("n_corpus_dups"), col("batch_canonical"),
            (col("n_corpus_dups") === 0 &&
              col("doc_id") === col("batch_canonical")).as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH f AS (SELECT doc_id,
             |    substring(lower(trim(text)), 1, 60) AS fp FROM documents),
             |incoming AS (SELECT * FROM f WHERE doc_id % 10 = 9),
             |corpus AS (SELECT * FROM f WHERE doc_id % 10 <> 9),
             |hits AS (
             |  SELECT i.doc_id, i.fp, count(c.fp) AS n_corpus_dups
             |  FROM incoming i LEFT JOIN corpus c ON i.fp = c.fp
             |  GROUP BY i.doc_id, i.fp),
             |canon AS (SELECT fp, min(doc_id) AS batch_canonical
             |          FROM incoming GROUP BY fp)
             |SELECT h.doc_id, h.n_corpus_dups, canon.batch_canonical,
             |  (h.n_corpus_dups = 0 AND h.doc_id = canon.batch_canonical) AS keep
             |FROM hits h JOIN canon ON h.fp = canon.fp
             |ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "x14_incremental_agg",
      "Incremental aggregation by partial-state merge: pre-1998 base " +
        "partials and 1998+ delta partials (count + DECIMAL sum each) " +
        "merged by re-aggregation — bit-identical to the full recompute, " +
        "which IS the oracle. The 100 TB pattern: persist per-partition " +
        "partials, aggregate only the new partition each load " +
        "(Ingestion_date-partitioned tables make the delta a partition " +
        "prune), and merge — never re-scan history.",
      (s, d) => {
        val orders = Tables.orders(s, d)
        def partial(f: org.apache.spark.sql.DataFrame) =
          f.groupBy("o_orderstatus")
            .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("t"))
        val cut = lit("1998-01-01").cast(TimestampNTZType)
        partial(orders.filter(col("o_orderdate") < cut))
          .unionByName(partial(orders.filter(col("o_orderdate") >= cut)))
          .groupBy("o_orderstatus")
          .agg(sum(col("n")).as("n_orders"),
            round(sum(col("t")).cast(DoubleType), 4).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_orders,
             |  floor(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             |        * 10000 + 0.5) / 10000 AS total
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),
    Q(
      "x20_temperature_mixture",
      "Temperature-scaled mixture weighting (alpha = 0.5): per-source " +
        "upweight factors sqrt(head_tokens / source_tokens) relative to " +
        "the largest source — the UniMax/temperature renormalization that " +
        "keeps small sources from drowning in a multi-source training mix " +
        "(x10 covers fixed keep-rates; this derives the rates from corpus " +
        "statistics). Cross-engine exactness by construction: after exact " +
        "integer aggregation, the only float ops are int-to-double (< 2^53, " +
        "exact), one division, one sqrt, one multiply — each CORRECTLY " +
        "ROUNDED under IEEE-754 and applied per row, never accumulated — " +
        "so floor(1e6 * x) is bit-identical in every compliant engine; " +
        "effective token budgets then stay in integer arithmetic. Scale: " +
        "ONE partial+final hash agg over the corpus (a crossJoin to a " +
        "1-row max re-scans the corpus — column pruning makes the two agg " +
        "subplans differ, so ReuseExchange can't fire); the head size " +
        "comes from an unbounded window over the aggregated relation, " +
        "whose single partition holds one row per SOURCE — bounded by " +
        "source cardinality, not corpus size. Budget headroom: " +
        "n_tokens * ppm stays in BIGINT up to ~9.2e18, i.e. 1e12 tokens " +
        "per source at a 1000x upweight — past that, widen to DECIMAL.",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = size(split(col("text"), " ")).cast(LongType)
        val per = Tables.documents(s, d)
          .select(col("source"), tok.as("tok"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
        per
          .withColumn("max_tokens", max(col("n_tokens")).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("upweight_ppm",
            floor(sqrt(col("max_tokens").cast(DoubleType) / col("n_tokens"))
              * 1000000).cast(LongType))
          .withColumn("tokens_eff",
            expr("n_tokens * upweight_ppm div 1000000"))
          .select("source", "n_docs", "n_tokens", "upweight_ppm", "tokens_eff")
          .orderBy("source")
      },
      Some("""WITH per AS (
             |  SELECT source, count(*) AS n_docs,
             |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY source),
             |head AS (SELECT max(n_tokens) AS max_tokens FROM per)
             |SELECT source, n_docs, n_tokens,
             |  CAST(floor(sqrt(CAST(max_tokens AS DOUBLE) / n_tokens)
             |             * 1000000) AS BIGINT) AS upweight_ppm,
             |  (n_tokens * CAST(floor(sqrt(CAST(max_tokens AS DOUBLE) / n_tokens)
             |                         * 1000000) AS BIGINT)) // 1000000 AS tokens_eff
             |FROM per, head ORDER BY source""".stripMargin)
    )
  )
}
