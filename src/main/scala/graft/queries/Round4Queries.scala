package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.Tables

/** Round-4 widening of the declared inventory (SURVEY §2.11 extensions):
  * the correlated-subquery family (LATERAL, EXISTS/NOT EXISTS, IN/NOT IN),
  * SQL aggregate FILTER clause, value window functions, width_bucket
  * histograms, try_* safe arithmetic, regexp_extract_all, recursive CTEs,
  * grouping()/grouping-id disambiguation, and two more training-pipeline
  * operators (sequence packing, per-source mixture weighting).
  *
  * Scale notes per entry. Common theme: every correlated subquery here
  * decorrelates to a join (semi/anti/window) — nothing plans a nested loop;
  * verified by PlanAssertionsSpec.
  */
object Round4Queries {

  val defs: Seq[Q] = Seq(
    Q(
      "j11_lateral_topk",
      "LATERAL correlated subquery: each customer's top-2 orders by price — " +
        "SQL's per-row dependent subquery. Catalyst decorrelates the " +
        "correlated LIMIT to a window rank over one join, NOT a per-customer " +
        "nested loop, so it scales like o2_topk_per_group.",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer_j11")
        Tables.orders(s, d).createOrReplaceTempView("orders_j11")
        s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
                |FROM customer_j11 c,
                |LATERAL (SELECT o_orderkey, o_totalprice FROM orders_j11 o
                |         WHERE o.o_custkey = c.c_custkey
                |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
                |ORDER BY c_custkey, o_orderkey""".stripMargin)
      },
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
             |FROM customer c,
             |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             |         WHERE o.o_custkey = c.c_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
             |ORDER BY c_custkey, o_orderkey""".stripMargin)
    ),
    Q(
      "a13_exists_subquery",
      "Correlated EXISTS + NOT EXISTS predicates: customers with an urgent " +
        "order but no finished order — Catalyst decorrelates to one " +
        "left-semi and one left-anti hash join (j5/j6's physical shape, " +
        "reached from SQL subquery syntax).",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer_a13")
        Tables.orders(s, d).createOrReplaceTempView("orders_a13")
        s.sql("""SELECT c_custkey, c_name FROM customer_a13 c
                |WHERE EXISTS (SELECT 1 FROM orders_a13 o
                |              WHERE o.o_custkey = c.c_custkey
                |                AND o.o_orderpriority = '1-URGENT')
                |  AND NOT EXISTS (SELECT 1 FROM orders_a13 o
                |                  WHERE o.o_custkey = c.c_custkey
                |                    AND o.o_orderstatus = 'F')
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_orderpriority = '1-URGENT')
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)
    ),
    Q(
      "a14_in_subquery",
      "IN + NOT IN subquery predicates: customers in regions 1-2 with no " +
        "finished order. NOT IN is only safe because o_custkey is " +
        "non-nullable — one NULL in the subquery makes NOT IN empty per " +
        "three-valued logic (both engines agree; the semi/anti-join " +
        "decorrelation handles it).",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer_a14")
        Tables.orders(s, d).createOrReplaceTempView("orders_a14")
        Tables.nation(s, d).createOrReplaceTempView("nation_a14")
        s.sql("""SELECT c_custkey, c_nationkey FROM customer_a14
                |WHERE c_nationkey IN (SELECT n_nationkey FROM nation_a14
                |                      WHERE n_regionkey IN (1, 2))
                |  AND c_custkey NOT IN (SELECT o_custkey FROM orders_a14
                |                        WHERE o_orderstatus = 'F')
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_nationkey FROM customer
             |WHERE c_nationkey IN (SELECT n_nationkey FROM nation
             |                      WHERE n_regionkey IN (1, 2))
             |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
             |                        WHERE o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)
    ),
    Q(
      "a15_filter_clause",
      "SQL aggregate FILTER clause: per-status conditional count/sum/avg in " +
        "ONE pass (each FILTER is a predicate on the input of one aggregate " +
        "buffer — no self-joins, still map-side combinable). Sums go " +
        "through DECIMAL then one double division so the FP result is " +
        "partition-order independent.",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_a15")
        s.sql(
          """SELECT o_orderstatus,
            |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
            |  floor(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
            |          FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
            |        * 10000 + 0.5) / 10000 AS urgent_total,
            |  floor(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
            |          FILTER (WHERE o_orderpriority = '5-LOW') AS DOUBLE)
            |        / count(*) FILTER (WHERE o_orderpriority = '5-LOW')
            |        * 10000 + 0.5) / 10000 AS low_avg
            |FROM orders_a15 GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""SELECT o_orderstatus,
             |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
             |  floor(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
             |          FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
             |        * 10000 + 0.5) / 10000 AS urgent_total,
             |  floor(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
             |          FILTER (WHERE o_orderpriority = '5-LOW') AS DOUBLE)
             |        / count(*) FILTER (WHERE o_orderpriority = '5-LOW')
             |        * 10000 + 0.5) / 10000 AS low_avg
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),
    Q(
      "w7_value_window",
      "Value window functions: first_value / nth_value(2) under the default " +
        "running frame, last_value under an explicit unbounded frame (the " +
        "default frame stops at CURRENT ROW, where last_value is just the " +
        "current row — the classic trap). Unique (date, orderkey) ordering " +
        "keeps both engines' frames identical.",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_w7")
        s.sql(
          """SELECT o_orderkey,
            |  first_value(o_orderkey) OVER w AS first_in_cust,
            |  nth_value(o_orderkey, 2) OVER w AS second_in_cust,
            |  last_value(o_orderkey) OVER
            |    (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_in_cust
            |FROM orders_w7
            |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey,
             |  first_value(o_orderkey) OVER w AS first_in_cust,
             |  nth_value(o_orderkey, 2) OVER w AS second_in_cust,
             |  last_value(o_orderkey) OVER
             |    (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_in_cust
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "f22_width_bucket",
      "Equi-width histogram via width_bucket: order totals into 12 buckets " +
        "over [0, 600k) plus underflow 0 / overflow 13 — the single-pass " +
        "histogram primitive (bucket id is a codegen'd projection; one " +
        "groupBy shuffle on ≤14 keys). Oracle spells out width_bucket's " +
        "floor formula.",
      (s, d) => {
        Tables.orders(s, d)
          .select(expr("width_bucket(o_totalprice, 0D, 600000D, 12)")
            .cast(LongType).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy("bucket")
      },
      Some("""SELECT CASE WHEN o_totalprice >= 600000 THEN 13
             |            WHEN o_totalprice < 0 THEN 0
             |            ELSE CAST(floor(o_totalprice / 50000) + 1 AS BIGINT) END AS bucket,
             |  count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)
    ),
    Q(
      "f23_try_arith",
      "try_* safe arithmetic: division by a zero discount → NULL (not Inf, " +
        "not error) — the expression-level SAFE_ semantics matching the " +
        "reference's SAFE_CAST load rule (big_uery_handler.py:32-42) " +
        "extended to arithmetic. All stay codegen'd.",
      (s, d) => {
        Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
          round(expr("try_divide(l_extendedprice, l_discount)"), 4).as("per_disc"),
          round(expr("try_multiply(l_extendedprice, l_quantity)"), 4).as("gross"),
          expr("try_add(l_orderkey, l_partkey)").as("key_sum"))
          // (l_orderkey, l_linenumber) is NOT unique in this corpus — the
          // remaining output columns make the sort total (identical
          // duplicates then compare equal regardless of order).
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("gross"),
            col("key_sum"), col("per_disc").asc_nulls_first)
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |  floor((l_extendedprice / NULLIF(l_discount, 0)) * 10000 + 0.5) / 10000 AS per_disc,
             |  floor((l_extendedprice * l_quantity) * 10000 + 0.5) / 10000 AS gross,
             |  l_orderkey + l_partkey AS key_sum
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, gross, key_sum, per_disc ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "f24_regexp_extract_all",
      "regexp_extract_all: every vowel run per part name — count, first " +
        "match, joined matches (the multi-match sibling of f14's single " +
        "extract; '[aeiou]+' means Java and RE2 dialects agree). " +
        "element_at on an empty match list → NULL on both engines.",
      (s, d) => {
        val groups = regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0))
        Tables.part(s, d).select(
          col("p_partkey"),
          size(groups).cast(LongType).as("n_groups"),
          element_at(groups, 1).as("first_group"),
          array_join(groups, "|").as("all_groups"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |  CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS n_groups,
             |  regexp_extract_all(p_name, '[aeiou]+')[1] AS first_group,
             |  array_to_string(regexp_extract_all(p_name, '[aeiou]+'), '|') AS all_groups
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),
    Q(
      "r9_recursive_cte",
      "Recursive CTE: month spine from the corpus's min to max order month " +
        "generated by recursion (anchor + UNION ALL step), left-joined to " +
        "per-month order counts with zero fill — the iterative-SQL surface " +
        "(bounded depth = month span; each step is one distributed join-free " +
        "projection, so depth, not data volume, is the only serial axis).",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_r9")
        // Bounds are computed ONCE and inlined as literals: a scalar
        // subquery in the recursive step's WHERE is re-evaluated every
        // iteration — ~n_months full re-scans of the fact table (13 s vs
        // 0.3 s at sf0.1, and unrunnable at 100 TB). One tiny agg job
        // first, then the recursion only touches its own frontier.
        val b = s.sql(
          """SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
            |       CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
            |FROM orders_r9""".stripMargin).head()
        val (lo, hi) = (b.getAs[java.sql.Date]("lo"), b.getAs[java.sql.Date]("hi"))
        require(lo != null && hi != null,
          "r9_recursive_cte: orders has no non-null o_orderdate rows — " +
            "cannot derive the recursion bounds")
        s.sql(
          s"""WITH RECURSIVE months(m) AS (
             |  SELECT CAST(DATE '$lo' AS TIMESTAMP)
             |  UNION ALL
             |  SELECT m + INTERVAL 1 MONTH FROM months
             |  WHERE m < CAST(DATE '$hi' AS TIMESTAMP)
             |)
             |SELECT CAST(m AS DATE) AS month, coalesce(n, CAST(0 AS BIGINT)) AS n_orders
             |FROM months LEFT JOIN (
             |  SELECT date_trunc('month', o_orderdate) AS mo, count(*) AS n
             |  FROM orders_r9 GROUP BY 1) c
             |ON months.m = c.mo
             |ORDER BY month""".stripMargin)
      },
      Some("""WITH RECURSIVE months(m) AS (
             |  SELECT (SELECT date_trunc('month', min(o_orderdate)) FROM orders)
             |  UNION ALL
             |  SELECT m + INTERVAL 1 MONTH FROM months
             |  WHERE m < (SELECT date_trunc('month', max(o_orderdate)) FROM orders)
             |)
             |SELECT CAST(m AS DATE) AS month, coalesce(n, CAST(0 AS BIGINT)) AS n_orders
             |FROM months LEFT JOIN (
             |  SELECT date_trunc('month', o_orderdate) AS mo, count(*) AS n
             |  FROM orders GROUP BY 1) c
             |ON months.m = c.mo
             |ORDER BY month""".stripMargin)
    ),
    Q(
      "a16_grouping_id",
      "CUBE with grouping() disambiguation: a grouping id distinguishes " +
        "'NULL because subtotal' from 'NULL as data value' in super-" +
        "aggregate rows — without it cube/rollup output is ambiguous " +
        "(a4's gap). Portable bit formula instead of engine grouping_id().",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_a16")
        s.sql(
          """SELECT o_orderstatus, o_orderpriority,
            |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
            |  count(*) AS n
            |FROM orders_a16 GROUP BY CUBE(o_orderstatus, o_orderpriority)
            |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
             |  count(*) AS n
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "x9_sequence_packing",
      "Training-data sequence packing: per-language next-fit packing of " +
        "documents into 512-token bins (running token sum → bin id → " +
        "per-bin doc/token counts). Partitioned by language so packing " +
        "parallelizes per stratum — the per-shard form you'd run at 100 TB " +
        "(a single global window would serialize; pack within shards, " +
        "train across them).",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = size(split(col("text"), " "))
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id").asc)
        Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), tok.as("tok"))
          .withColumn("cum", sum(col("tok")).over(w))
          .select(col("lang"),
            floor((col("cum") - col("tok")) / 512).cast(LongType).as("pack"),
            col("tok"))
          .groupBy("lang", "pack")
          .agg(count(lit(1)).as("n_docs"), sum(col("tok")).cast(LongType).as("n_tokens"))
          .orderBy("lang", "pack")
      },
      Some("""WITH d AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS tok FROM documents),
             |c AS (SELECT doc_id, lang, tok,
             |        CAST(sum(tok) OVER (PARTITION BY lang ORDER BY doc_id ASC) AS BIGINT) AS cum FROM d)
             |SELECT lang, CAST(floor((cum - tok) / 512) AS BIGINT) AS pack,
             |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
             |FROM c GROUP BY lang, pack ORDER BY lang, pack""".stripMargin)
    ),
    Q(
      "x10_source_mixture",
      "Mixture weighting: per-source deterministic keep rates (100%/50%/25% " +
        "by doc_id mod — content-stable, no RNG) with kept-vs-total doc and " +
        "token counts — how a training mixture up/down-weights sources " +
        "reproducibly across reruns and cluster sizes.",
      (s, d) => {
        val rate = when(col("source") === "src0", 100)
          .when(col("source") === "src1", 50).otherwise(25)
        val kept = pmod(col("doc_id"), lit(100)) < rate
        val tok = size(split(col("text"), " ")).cast(LongType)
        Tables.documents(s, d)
          .select(col("source"), kept.as("kept"), tok.as("tok"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_total"),
            count_if(col("kept")).as("n_kept"),
            sum(when(col("kept"), col("tok")).otherwise(0L)).as("kept_tokens"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT source,
             |    (doc_id % 100) < (CASE source WHEN 'src0' THEN 100
             |                      WHEN 'src1' THEN 50 ELSE 25 END) AS kept,
             |    len(string_split(text, ' ')) AS tok
             |  FROM documents)
             |SELECT source, count(*) AS n_total,
             |  count(*) FILTER (WHERE kept) AS n_kept,
             |  CAST(sum(CASE WHEN kept THEN tok ELSE 0 END) AS BIGINT) AS kept_tokens
             |FROM d GROUP BY source ORDER BY source""".stripMargin)
    ),
    Q(
      "o5_limit_offset",
      "Keyset-free pagination: ORDER BY + LIMIT/OFFSET page 2 of the " +
        "priciest orders. OFFSET ships offset+limit rows to the driver " +
        "merge — fine for UI-depth pages; past a few thousand rows deep " +
        "you switch to keyset pagination (WHERE (price,key) < last-seen), " +
        "which o1's top-k shape already covers.",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_o5")
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders_o5
                |ORDER BY o_totalprice DESC, o_orderkey ASC
                |LIMIT 20 OFFSET 10""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC
             |LIMIT 20 OFFSET 10""".stripMargin)
    ),
    Q(
      "f25_levenshtein",
      "Edit-distance fuzzy matching: levenshtein between each part's name " +
        "and type plus a bounded variant — the lead-dedup primitive for " +
        "near-identical records (the reference's domain). As a projection " +
        "it's codegen'd and embarrassingly parallel; for record linkage " +
        "you'd block first (dd_* LSH) and run this on candidates only.",
      (s, d) => {
        Tables.part(s, d).select(
          col("p_partkey"),
          levenshtein(col("p_name"), col("p_type")).cast(LongType).as("dist"),
          levenshtein(substring(col("p_name"), 1, 10),
            substring(col("p_type"), 1, 10)).cast(LongType).as("dist10"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |  CAST(levenshtein(p_name, p_type) AS BIGINT) AS dist,
             |  CAST(levenshtein(substring(p_name, 1, 10), substring(p_type, 1, 10)) AS BIGINT) AS dist10
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),
    Q(
      "f26_from_xml",
      "XML parsing (Spark 4 native from_xml): each event re-rendered as an " +
        "XML fragment, parsed back to a typed struct, fields extracted. " +
        "The oracle computes the same outputs from the raw columns, so the " +
        "check verifies the parse is lossless — the semi-structured path " +
        "beside JSON (f9/x5).",
      (s, d) => {
        // value rides as floor(v*10000) integer — float *formatting* is
        // engine-specific (grouping, tie rounding), floor arithmetic isn't
        val xml = concat(lit("<e><id>"), col("event_id"),
          lit("</id><t>"), col("event_type"), lit("</t><v>"),
          floor(col("value") * 10000).cast(LongType), lit("</v></e>"))
        val parsed = from_xml(xml, StructType(Seq(
          StructField("id", LongType),
          StructField("t", StringType),
          StructField("v", LongType))))
        Tables.events(s, d).select(
          col("event_id"),
          parsed.getField("id").as("xml_id"),
          parsed.getField("t").as("xml_type"),
          parsed.getField("v").as("xml_value"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_id AS xml_id, event_type AS xml_type,
             |  CAST(floor(value * 10000) AS BIGINT) AS xml_value
             |FROM events ORDER BY event_id""".stripMargin)
    ),
    Q(
      "x12_global_index",
      "Distributed global example ids: range-partition + per-partition " +
        "sort + zipWithIndex offsets (two fully parallel passes) instead " +
        "of row_number() OVER (ORDER BY …), whose single-partition window " +
        "funnels every row through one task. Equals the window form " +
        "exactly — the oracle IS the window form.",
      (s, d) => {
        graft.operators.GlobalIndex
          .withGlobalIndex(Tables.documents(s, d)
            .select(col("doc_id"), col("lang")), Seq(col("doc_id")), "idx")
          .select(col("doc_id"), col("lang"), col("idx"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
             |  CAST(row_number() OVER (ORDER BY doc_id ASC) - 1 AS BIGINT) AS idx
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "x11_cms_heavy_hitters",
      "Count-min-sketch heavy hitters: one mergeable fixed-memory sketch " +
        "over the token stream (`count_min_sketch` partial agg — no " +
        "per-token groupBy state), probed for the exact top-20 tokens so " +
        "the CMS overestimate bound (est ≥ exact, est ≤ exact + ε·N) is " +
        "visible in the output. At 100 TB the sketch replaces the exact " +
        "groupBy entirely and is probed for a candidate set; the exact " +
        "side here exists to verify the sketch. Rows-only check (sketch " +
        "internals aren't DuckDB-reproducible); bounds asserted in spec.",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
        // one aggregation pass → one small binary on the driver
        val bytes = toks
          .select(expr("count_min_sketch(tok, 0.001d, 0.99d, 42)").as("cms"))
          .head().getAs[Array[Byte]](0)
        toks.groupBy("tok").agg(count(lit(1)).as("exact"))
          .orderBy(col("exact").desc, col("tok").asc)
          .limit(20)
          // codegen'd native probe — no UDF boundary even off the hot path
          .withColumn("est",
            graft.expressions.SketchExpressions.cmsEstimate(bytes, col("tok")))
          .select(col("tok"), col("exact"), col("est"))
          .orderBy(col("exact").desc, col("tok").asc)
      },
      None
    )
  )
}
