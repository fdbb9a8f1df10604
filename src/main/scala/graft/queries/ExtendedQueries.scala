package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.Tables

/** Round-3 widening of the declared inventory (SURVEY §2.11 extensions):
  * pivot/unpivot reshaping, exact percentiles, ranking distribution
  * functions, lateral explode, regexp suite, and the training-pipeline
  * split/sample/sketch operators a 100 TB corpus-prep job needs.
  *
  * Scale notes per query live on each entry; the common theme: everything
  * is a single hash-partitioned pass (groupBy/window on a key with bounded
  * per-key cardinality), no driver-side collection, no O(n²) shape.
  */
object ExtendedQueries {

  val defs: Seq[Q] = Seq(
    Q(
      "o3_pivot",
      "Pivot orders: status rows × priority columns of counts (explicit " +
        "pivot values — at scale you never let pivot() run the implicit " +
        "distinct-collect job over 100 TB; missing cells coalesce to 0).",
      (s, d) => {
        Tables.orders(s, d)
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(count(lit(1)))
          .select(
            col("o_orderstatus"),
            coalesce(col("`1-URGENT`"), lit(0L)).as("p_urgent"),
            coalesce(col("`2-HIGH`"), lit(0L)).as("p_high"),
            coalesce(col("`3-MEDIUM`"), lit(0L)).as("p_medium"),
            coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("p_notspec"),
            coalesce(col("`5-LOW`"), lit(0L)).as("p_low"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
             |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
             |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
             |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
             |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
             |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),
    Q(
      "o4_unpivot",
      "Unpivot (melt) lineitem measure columns to (metric, value) rows — " +
        "the wide→long reshape; a narrow 3× row-expanding projection, no " +
        "shuffle beyond the final presentation sort.",
      (s, d) => {
        Tables.lineitem(s, d)
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
            "metric", "value")
          .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
            col("metric"), round(col("value"), 4).as("value"))
          // value joins the sort because (l_orderkey, l_linenumber) is NOT
          // unique in this corpus — without it tied rows with different
          // values could legally interleave differently per engine.
          .orderBy("l_orderkey", "l_linenumber", "metric", "value")
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, metric,
             |  floor((value) * 10000 + 0.5) / 10000 AS value
             |FROM (
             |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem)
             |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin)
    ),
    Q(
      "a7_percentile",
      "Exact percentiles (median, p90) of l_extendedprice per returnflag — " +
        "SQL `percentile` (percentile_cont interpolation). Exact ranks need " +
        "a per-group sort; at 100 TB prefer a8's sketches unless exactness " +
        "is contractual.",
      (s, d) => {
        // Both percentiles from ONE aggregation buffer (array form) — the
        // two-call form builds two per-group value maps over 600k rows.
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ps"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"),
            round(element_at(col("ps"), 1), 4).as("p50"),
            round(element_at(col("ps"), 2), 4).as("p90"),
            col("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  floor((quantile_cont(l_extendedprice, 0.5)) * 10000 + 0.5) / 10000 AS p50,
             |  floor((quantile_cont(l_extendedprice, 0.9)) * 10000 + 0.5) / 10000 AS p90,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "w4_ntile_distribution",
      "Distribution window functions: ntile(4) quartiles, percent_rank, " +
        "cume_dist of order price within each customer. ntile's window adds " +
        "an orderkey tiebreak for determinism; the peer-group functions " +
        "order by price alone so tie semantics match SQL.",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wTie = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        val wPeer = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").asc)
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          ntile(4).over(wTie).cast(LongType).as("quartile"),
          round(percent_rank().over(wPeer), 4).as("pct_rank"),
          round(cume_dist().over(wPeer), 4).as("cume"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(ntile(4) OVER (PARTITION BY o_custkey
             |    ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey ASC) AS BIGINT) AS quartile,
             |  floor((percent_rank() OVER (PARTITION BY o_custkey
             |    ORDER BY o_totalprice ASC NULLS FIRST)) * 10000 + 0.5) / 10000 AS pct_rank,
             |  floor((cume_dist() OVER (PARTITION BY o_custkey
             |    ORDER BY o_totalprice ASC NULLS FIRST)) * 10000 + 0.5) / 10000 AS cume
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "f13_posexplode",
      "Lateral explode with position: part names → one row per token with " +
        "its 1-based position. Narrow row-generating projection (Spark " +
        "Generate) — no shuffle until the presentation sort.",
      (s, d) => {
        Tables.part(s, d)
          .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
          .select(col("p_partkey"), (col("pos") + 1).cast(LongType).as("pos"),
            col("col").as("tok"))
          .orderBy("p_partkey", "pos")
      },
      Some("""SELECT p_partkey,
             |  CAST(unnest(range(1, len(string_split(p_name, ' ')) + 1)) AS BIGINT) AS pos,
             |  unnest(string_split(p_name, ' ')) AS tok
             |FROM part ORDER BY p_partkey, pos""".stripMargin)
    ),
    Q(
      "f14_regexp_funcs",
      "Regexp + padding string suite over part: first-word extract, " +
        "whitespace collapse to '_', brand left-pad — all codegen'd " +
        "built-ins, never UDFs.",
      (s, d) => {
        Tables.part(s, d).select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "\\s+", "_").as("snake_name"),
          lpad(col("p_brand"), 12, ".").as("brand_padded"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
             |  regexp_replace(p_name, '\s+', '_', 'g') AS snake_name,
             |  lpad(p_brand, 12, '.') AS brand_padded
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),
    Q(
      "x7_train_val_split",
      "Deterministic train/val split (doc_id mod 10: 8/1/1 train/val/test) " +
        "with per-split per-language doc + token counts — the reproducible " +
        "split a training pipeline needs (content-stable, no RNG, no " +
        "sampleBy non-determinism across reruns/cluster sizes).",
      (s, d) => {
        val bucket = pmod(col("doc_id"), lit(10))
        val split = when(bucket < 8, "train").when(bucket === 8, "val")
          .otherwise("test")
        Tables.documents(s, d)
          .groupBy(split.as("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(size(org.apache.spark.sql.functions.split(col("text"), " "))
              .cast(LongType)).as("n_tokens"))
          .orderBy("split", "lang")
      },
      Some("""SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
             |            WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split,
             |  lang, count(*) AS n_docs,
             |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
             |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin)
    ),
    Q(
      "x8_stratified_sample",
      "Deterministic stratified sample: first 20 docs per language by " +
        "doc_id (window top-k per stratum — one shuffle on the stratum key; " +
        "the deterministic analogue of sampleBy for reproducible eval sets).",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id").asc)
        Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), col("source"),
            row_number().over(w).cast(LongType).as("rn"))
          .where(col("rn") <= 20)
          .orderBy("lang", "rn")
      },
      Some("""SELECT lang, doc_id, source, rn FROM (
             |  SELECT lang, doc_id, source,
             |    CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id ASC) AS BIGINT) AS rn
             |  FROM documents) t
             |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin)
    ),
    Q(
      "u4_intersect_all",
      "Bag-semantics intersect: nations represented among customers AND " +
        "suppliers, keeping multiplicity (INTERSECT ALL = min of the two " +
        "bags' counts — a different operator from u2's set intersect).",
      (s, d) => {
        Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
          .intersectAll(
            Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
          .orderBy("nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT ALL
             |SELECT s_nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)
    ),
    Q(
      "u5_except_all",
      "Bag-semantics except: customer nation keys minus supplier nation " +
        "keys with multiplicity (each supplier occurrence cancels ONE " +
        "customer occurrence).",
      (s, d) => {
        Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
          .exceptAll(
            Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
          .orderBy("nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT ALL
             |SELECT s_nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)
    ),
    Q(
      "f17_null_safe_eq",
      "Null-safe comparison (<=> / IS NOT DISTINCT FROM) against JSON " +
        "values that go NULL on missing keys — the predicate form where " +
        "NULL = NULL is true and NULL = x is false, not unknown.",
      (s, d) => {
        val k = get_json_object(col("props"), "$.missing").try_cast(LongType)
        Tables.events(s, d).select(
          col("event_id"),
          (k <=> lit(null)).as("is_missing"),
          (k <=> lit(0L)).as("is_zero"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  (TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT)
             |     IS NOT DISTINCT FROM NULL) AS is_missing,
             |  (TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT)
             |     IS NOT DISTINCT FROM 0) AS is_zero
             |FROM events ORDER BY event_id""".stripMargin)
    ),
    Q(
      "j9_full_outer",
      "Full outer join: high-balance customers against big orders — " +
        "unmatched rows survive on BOTH sides (null-padded), the missing " +
        "outer-join variant beside j4's left. Both inputs filtered so each " +
        "side genuinely has non-matching rows.",
      (s, d) => {
        val c = Tables.customer(s, d).where(col("c_acctbal") > 0)
          .select("c_custkey", "c_name")
        val o = Tables.orders(s, d).where(col("o_totalprice") > 200000)
          .select("o_orderkey", "o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
          .select(col("c_custkey"), col("o_orderkey"))
          .orderBy(col("c_custkey").asc, col("o_orderkey").asc)
      },
      Some("""SELECT c_custkey, o_orderkey
             |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0) c
             |  FULL OUTER JOIN (SELECT o_orderkey, o_custkey FROM orders
             |                   WHERE o_totalprice > 200000) o
             |  ON c.c_custkey = o.o_custkey
             |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "j10_cross",
      "Explicit cross join of the two smallest dims (region × nation) — " +
        "the deliberate-cartesian case; anything larger than dim × dim " +
        "belongs to a broadcast nested loop you opted into, never an " +
        "accident (Spark requires crossJoin/spark.sql.crossJoin.enabled).",
      (s, d) => {
        Tables.region(s, d).select(col("r_name"))
          .crossJoin(Tables.nation(s, d).select(col("n_name")))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
             |ORDER BY r_name, n_name""".stripMargin)
    ),
    Q(
      "a9_scalar_subquery",
      "Scalar subquery in a predicate: orders above the global average " +
        "price — Catalyst plans the subquery as a one-row broadcast; the " +
        "average goes through DECIMAL so the cut-off is bit-exact on both " +
        "engines (a double average would move boundary rows between them).",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_a9")
        s.sql(
          """SELECT o_orderkey, o_totalprice FROM orders_a9
            |WHERE CAST(o_totalprice AS DECIMAL(38,6)) >
            |  (SELECT avg(CAST(o_totalprice AS DECIMAL(38,6))) FROM orders_a9)
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE CAST(o_totalprice AS DECIMAL(38,6)) >
             |  (SELECT avg(CAST(o_totalprice AS DECIMAL(38,6))) FROM orders)
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "f16_collect_sorted",
      "Ordered collect: per customer, the comma-joined sorted list of " +
        "their order keys — collect_list is unordered by contract, so " +
        "sort_array makes it deterministic (the only safe way to emit " +
        "per-group lists).",
      (s, d) => {
        Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(concat_ws(",",
            sort_array(collect_list(
              lpad(col("o_orderkey").cast(StringType), 12, "0")))).as("orderkeys"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey,
             |  string_agg(lpad(CAST(o_orderkey AS VARCHAR), 12, '0'), ','
             |    ORDER BY lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS orderkeys
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
    ),
    Q(
      "f15_map_funcs",
      "Map functions over JSON-derived maps: from_json to map<string,long>, " +
        "size/keys/element access — the typed-metadata access pattern for " +
        "semi-structured columns.",
      (s, d) => {
        val m = from_json(col("props"), MapType(StringType, LongType))
        Tables.events(s, d).select(
          col("event_id"),
          size(m).cast(LongType).as("n_keys"),
          element_at(map_keys(m), 1).as("first_key"),
          element_at(m, "k").as("k_val"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
             |  json_keys(props)[1] AS first_key,
             |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
             |FROM events ORDER BY event_id""".stripMargin)
    ),
    Q(
      "w5_range_frame",
      "RANGE-framed window: per customer, rolling 7-day sum of order totals " +
        "(range frame over event time, not row count — peers at equal dates " +
        "aggregate together on both engines). DECIMAL-summed for exactness.",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").cast(TimestampType).cast(LongType))
          .rangeBetween(-7L * 86400, 0)
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          round(sum(col("o_totalprice").cast(DecimalType(38, 6))).over(w)
            .cast(DoubleType), 4).as("rolling_7d"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  floor((CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate ASC
             |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)) * 10000 + 0.5) / 10000 AS rolling_7d
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "a10_stats",
      "Statistical aggregates per returnflag: sample stddev/variance and " +
        "quantity-price correlation — streaming co-moment aggregates " +
        "(mergeable partials, one shuffle). FP-order stability validated by " +
        "the cross-partition-count verify runs.",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  floor((stddev_samp(l_quantity)) * 10000 + 0.5) / 10000 AS sd_qty,
             |  floor((var_samp(l_quantity)) * 10000 + 0.5) / 10000 AS var_qty,
             |  floor((corr(l_quantity, l_extendedprice)) * 10000 + 0.5) / 10000 AS qty_price_corr
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "a11_regression",
      "Linear-regression aggregates: slope/intercept/r2 of extended price " +
        "over quantity per returnflag — the co-moment family beside a10; " +
        "mergeable partials, round-4 stability cross-checked at two " +
        "partition counts.",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
            round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
            round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4).as("r2"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  floor((regr_slope(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS slope,
             |  floor((regr_intercept(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS intercept,
             |  floor((regr_r2(l_extendedprice, l_quantity)) * 10000 + 0.5) / 10000 AS r2
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),
    Q(
      "f21_array_setops",
      "Array set operations (distinct-element intersect/union/except " +
        "cardinalities between each document's first and second 30-token " +
        "windows) — compared by size since element ORDER differs by engine.",
      (s, d) => {
        val t = split(col("text"), " ")
        val a = slice(t, 1, 30)
        val b = slice(t, 31, 30)
        Tables.documents(s, d).select(
          col("doc_id"),
          size(array_intersect(a, b)).cast(LongType).as("n_common"),
          size(array_union(a, b)).cast(LongType).as("n_union"),
          size(array_except(a, b)).cast(LongType).as("n_only_head"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |s AS (SELECT doc_id, t[1:30] AS a, t[31:60] AS b FROM w)
             |SELECT doc_id,
             |  CAST(len(list_distinct(list_intersect(a, b))) AS BIGINT) AS n_common,
             |  CAST(len(list_distinct(a || b)) AS BIGINT) AS n_union,
             |  CAST(len(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))) AS BIGINT) AS n_only_head
             |FROM s ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "w6_ignore_nulls",
      "IGNORE NULLS analytic: per customer, the most recent big-order key " +
        "seen so far (last over a running frame skipping null marks) — the " +
        "carry-forward-last-observation pattern.",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d).select(
          col("o_orderkey"),
          last(when(col("o_totalprice") > 200000, col("o_orderkey")),
            ignoreNulls = true).over(w).as("last_big"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  last_value(CASE WHEN o_totalprice > 200000 THEN o_orderkey END IGNORE NULLS)
             |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_big
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "f19_date_spine",
      "Gap-filled monthly order counts: per customer, a generated month " +
        "spine between their first and last order, zero-filled from the " +
        "per-month counts — the time-series densification every warehouse " +
        "needs (sequence + explode generates the spine distributively; no " +
        "driver-side calendar loop). r19 optimization (correcting r18's " +
        "attempt): the original form scanned orders twice — once for the " +
        "per-customer bounds, once for the per-month counts — and joined " +
        "the exploded spine back to the counts. r18 chained the bounds " +
        "AGGREGATE off the counts, but RemoveRedundantAggregates collapses " +
        "an aggregate over the inner aggregate's grouping keys straight " +
        "back onto the base, so the committed r18 plan still showed two " +
        "scans (the r19 verdict caught the false claim), and a two-consumer " +
        "reuse form dead-ends too: the join infers IsNotNull on its count " +
        "side where the spine side must keep the null-customer group, so " +
        "the subtrees never match for ReuseExchange. The r19 form removes " +
        "the JOIN instead: each per-month counts row generates exactly the " +
        "spine months it owns — its own month (carrying n) plus the gap " +
        "months up to lead(month) (carrying 0), via one lead() window over " +
        "the counts. Equivalence: a customer's months are distinct, so the " +
        "runs [m_i, lead(m_i) - 1 month] partition [min(m), max(m)] — " +
        "every spine month is generated exactly once, order months carry " +
        "their count and gap months 0, exactly the left join's coalesce; " +
        "null months (null o_orderdate) generate nothing in both forms " +
        "(sequence(null) explodes to no rows; a null bound/join key " +
        "matched nothing before). ONE Scan parquet of orders, no join " +
        "(plans/r19/f19_date_spine_after.txt); oracle-hash-checked at all " +
        "three SFs.",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables.orders(s, d)
          .select(col("o_custkey"), date_trunc("month", col("o_orderdate")).as("m"))
        val counts = o.groupBy(col("o_custkey"), col("m"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("m").asc)
        val runEnd = coalesce(
          lead(col("m"), 1).over(w) - expr("INTERVAL 1 MONTH"), col("m"))
        counts
          .select(col("o_custkey"), col("m"), col("n"), runEnd.as("run_end"))
          .select(col("o_custkey"), col("m").as("m0"), col("n"),
            explode(sequence(col("m"), col("run_end"),
              expr("INTERVAL 1 MONTH"))).as("m"))
          .select(col("o_custkey"), col("m").cast(DateType).as("month"),
            when(col("m") === col("m0"), col("n")).otherwise(lit(0L)).as("n_orders"))
          .orderBy("o_custkey", "month")
      },
      Some("""WITH o AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m FROM orders),
             |bounds AS (SELECT o_custkey, min(m) AS lo, max(m) AS hi FROM o GROUP BY o_custkey),
             |spine AS (SELECT o_custkey,
             |            unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m
             |          FROM bounds),
             |counts AS (SELECT o_custkey AS c2, m AS m2, count(*) AS n FROM o GROUP BY 1, 2)
             |SELECT spine.o_custkey, CAST(spine.m AS DATE) AS month,
             |  coalesce(counts.n, 0) AS n_orders
             |FROM spine LEFT JOIN counts ON spine.o_custkey = counts.c2 AND spine.m = counts.m2
             |ORDER BY o_custkey, month""".stripMargin)
    ),
    Q(
      "a12_bool_aggs",
      "Boolean/conditional aggregates per order status: count_if, " +
        "bool_and, bool_or — predicate summaries in one map-side-" +
        "combinable pass instead of self-joins.",
      (s, d) => {
        Tables.orders(s, d)
          .groupBy(col("o_orderstatus"))
          .agg(
            count_if(col("o_totalprice") > 200000).as("n_big"),
            bool_and(col("o_totalprice") > 0).as("all_positive"),
            bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
             |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
             |  bool_and(o_totalprice > 0) AS all_positive,
             |  bool_or(o_orderpriority = '1-URGENT') AS any_urgent
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),
    Q(
      "f20_bitwise_agg",
      "Bitwise aggregates (bit_and/bit_or/bit_xor of order keys per " +
        "status) — commutative-associative folds, pure map-side-combinable.",
      (s, d) => {
        Tables.orders(s, d)
          .groupBy(col("o_orderstatus"))
          .agg(expr("bit_and(o_orderkey)").as("ba"),
            expr("bit_or(o_orderkey)").as("bo"),
            expr("bit_xor(o_orderkey)").as("bx"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, bit_and(o_orderkey) AS ba,
             |  bit_or(o_orderkey) AS bo, bit_xor(o_orderkey) AS bx
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),
    Q(
      "f18_date_arith",
      "Date arithmetic: day deltas against an epoch, calendar-aware month " +
        "addition (month-end clamped identically on both engines), and " +
        "month-end derivation.",
      (s, d) => {
        val od = col("o_orderdate").cast(DateType)
        Tables.orders(s, d).select(
          col("o_orderkey"),
          datediff(od, lit("2024-01-01").cast(DateType)).cast(LongType).as("days_since"),
          add_months(od, 2).as("plus2m"),
          last_day(od).as("month_end"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CAST(datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
             |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
             |  last_day(CAST(o_orderdate AS DATE)) AS month_end
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "a8_approx_distinct",
      "HyperLogLog++ approximate distinct suppliers per returnflag — the " +
        "sketch that replaces exact count-distinct's Expand+reshuffle at " +
        "100 TB (mergeable partial sketches, fixed memory; mixing it with " +
        "countDistinct in one agg would drag in the distinct Expand plan, " +
        "so the exact comparison lives in ExtendedQueriesSpec instead). " +
        "Rows-only check (HLL estimates aren't DuckDB-reproducible).",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_suppkey"), 0.02).as("approx_suppliers"))
          .orderBy("l_returnflag")
      },
      None
    )
  )
}
