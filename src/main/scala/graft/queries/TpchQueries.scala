package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** TPC-H on the corpus — the standard analytic suite, adapted to the
  * driver's slimmed schema: ALL 22 classics declared (q4 and q19 in
  * column-adapted forms). Columns the corpus lacks are DERIVED
  * deterministically inside the shared SQL text: q2/q9/q11/q16/q20 over
  * the partsupp CTE (psCte), q12/q21 over the lineitemx CTE (lxCte),
  * q22 over a nationkey-derived cntrycode.
  * Adaptations beyond column availability: literals re-anchored to the
  * corpus's 1995-2001 date span and synthetic domains (p_type is a plain
  * category so q14 matches 'PROMO' by equality; q7 aggregates region
  * pairs because sf0.001 has only 10 suppliers and any fixed NATION pair
  * can be empty), every query ends in a total ORDER BY, and double
  * aggregates go through DECIMAL(38,6) + the floor-rounding formula per
  * the §2.11 determinism contract.
  *
  * The SQL text is IDENTICAL for Spark and DuckDB — one string per query,
  * the Spark build just rewrites table names to per-query temp views. The
  * oracle therefore checks engine semantics, not a transliteration.
  *
  * Scale: these are the plans Catalyst's cost model exists for — star
  * joins pick broadcast dims automatically (nation/region/part are tiny),
  * fact-fact joins shuffle on the orderkey, group-bys partial-aggregate
  * map-side. No hints needed; PlanAssertionsSpec pins the broadcast and
  * pushdown behavior globally.
  */
object TpchQueries {

  private val tableNames =
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation", "region")

  /** Run `sqlText` in Spark with every bare corpus table name rewritten to
    * a per-tag temp view over the same parquet. The rewrite's real
    * contract: column names can't collide (fragments join with '_', a word
    * character, so `\bpart\b` never matches inside `p_partkey`), and
    * renaming an ALIAS that happens to equal a table name is harmless only
    * because definition and every use rename together — but a table word
    * inside a string LITERAL would be silently corrupted on the Spark side
    * while DuckDB runs the original text. The guard below rejects that
    * case outright instead of diverging the two engines.
    */
  private def run(s: SparkSession, d: String, tag: String,
                  sqlText: String): DataFrame = {
    "'[^']*'".r.findAllIn(sqlText).foreach { lit =>
      require(!tableNames.exists(n => ("\\b" + n + "\\b").r.findFirstIn(lit).isDefined),
        s"TPC-H rewrite would corrupt string literal $lit — rename the " +
          "literal or bypass the rewrite for this query")
    }
    var q = sqlText
    tableNames.foreach { n =>
      if (("""\b""" + n + """\b""").r.findFirstIn(q).isDefined) {
        Tables.load(s, d, n).createOrReplaceTempView(s"${n}_$tag")
        q = q.replaceAll("\\b" + n + "\\b", s"${n}_$tag")
      }
    }
    s.sql(q)
  }

  private val r4 = (e: String) =>
    s"floor(CAST($e AS DOUBLE) * 10000 + 0.5) / 10000"
  private val dsum = (e: String) => s"sum(CAST($e AS DECIMAL(38,6)))"

  private def tpch(name: String, doc: String, sql: String): Q =
    Q(name, doc, (s, d) => run(s, d, name, sql), Some(sql))

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${r4(dsum("l_quantity"))} AS sum_qty,
       |  ${r4(dsum("l_extendedprice"))} AS sum_base_price,
       |  ${r4(dsum("l_extendedprice * (1 - l_discount)"))} AS sum_disc_price,
       |  ${r4(dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)"))} AS sum_charge,
       |  ${r4(s"CAST(${dsum("l_quantity")} AS DOUBLE) / count(*)")} AS avg_qty,
       |  ${r4(s"CAST(${dsum("l_extendedprice")} AS DOUBLE) / count(*)")} AS avg_price,
       |  ${r4(s"CAST(${dsum("l_discount")} AS DOUBLE) / count(*)")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= DATE '2001-08-06'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val q3Sql: String =
    s"""SELECT l_orderkey,
       |  ${r4(dsum("l_extendedprice * (1 - l_discount)"))} AS revenue,
       |  o_orderdate
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < DATE '1998-03-15' AND l_shipdate > DATE '1998-03-15'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  val q5Sql: String =
    s"""SELECT n_name,
       |  ${r4(dsum("l_extendedprice * (1 - l_discount)"))} AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  val q6Sql: String =
    s"""SELECT ${r4(dsum("l_extendedprice * l_discount"))} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  val q7Sql: String =
    s"""SELECT supp_region, cust_region, l_year,
       |  ${r4("sum(volume)")} AS revenue
       |FROM (
       |  SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
       |    CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
       |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS volume
       |  FROM supplier, lineitem, orders, customer,
       |    nation n1, nation n2, region r1, region r2
       |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
       |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
       |    AND c_nationkey = n2.n_nationkey
       |    AND n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r2.r_regionkey
       |    AND ((r1.r_name = 'ASIA' AND r2.r_name = 'AMERICA')
       |      OR (r1.r_name = 'AMERICA' AND r2.r_name = 'ASIA'))
       |    AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
       |) shipping
       |GROUP BY supp_region, cust_region, l_year
       |ORDER BY supp_region, cust_region, l_year""".stripMargin

  val q8Sql: String =
    s"""SELECT o_year,
       |  ${r4("CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) / CAST(sum(volume) AS DOUBLE)")} AS mkt_share
       |FROM (
       |  SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS volume,
       |    n2.n_name AS supp_nation
       |  FROM part, supplier, lineitem, orders, customer,
       |    nation n1, nation n2, region
       |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
       |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
       |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
       |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
       |    AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
       |    AND p_type = 'ECONOMY'
       |) all_nations
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin

  val q10Sql: String =
    s"""SELECT c_custkey, c_name,
       |  ${r4(dsum("l_extendedprice * (1 - l_discount)"))} AS revenue,
       |  c_acctbal, n_name
       |FROM customer, orders, lineitem, nation
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
       |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  val q14Sql: String =
    s"""SELECT ${r4("100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)")} AS promo_revenue
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       |  AND l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'""".stripMargin

  val q18Sql: String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  ${r4(dsum("l_quantity"))} AS total_qty
       |FROM customer, orders, lineitem
       |WHERE o_orderkey IN (
       |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
       |    HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 150)
       |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
       |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  val q13Sql: String =
    s"""SELECT c_count, count(*) AS custdist
       |FROM (
       |  SELECT c_custkey, count(o_orderkey) AS c_count
       |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |  GROUP BY c_custkey
       |) c_orders
       |GROUP BY c_count
       |ORDER BY custdist DESC, c_count DESC""".stripMargin

  val q15Sql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    ${dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, ${r4("total_revenue")} AS total_revenue
       |FROM supplier, revenue
       |WHERE s_suppkey = supplier_no
       |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  val q17Sql: String =
    s"""SELECT ${r4(s"CAST(${dsum("l_extendedprice")} AS DOUBLE) / 7.0")} AS avg_yearly
       |FROM lineitem l, part p
       |WHERE p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
       |  AND l.l_quantity < (
       |    SELECT 0.5 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
       |                  / count(*))
       |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin

  val q4Sql: String =
    s"""SELECT o_orderpriority, count(*) AS order_count
       |FROM orders o
       |WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
       |  AND EXISTS (
       |    SELECT 1 FROM lineitem l
       |    WHERE l.l_orderkey = o.o_orderkey
       |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  val q19Sql: String =
    s"""SELECT ${r4(dsum("l_extendedprice * (1 - l_discount)"))} AS revenue
       |FROM lineitem, part
       |WHERE p_partkey = l_partkey AND (
       |     (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       |      AND l_quantity BETWEEN 1 AND 20)
       |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       |      AND l_quantity BETWEEN 5 AND 30)
       |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       |      AND l_quantity BETWEEN 10 AND 40))""".stripMargin

  /** Derived partsupp (round-11 verdict item #2): the corpus ships no
    * partsupp table, which blocked q2/q9/q11/q16/q20. This CTE derives one
    * DETERMINISTICALLY from the tables both engines already read — 4
    * suppliers per part assigned by integer hash of the keys (s_suppkey is
    * verified dense 0..S-1 at every sf, so `hash % count(supplier)` is a
    * valid FK without a row_number), ps_supplycost / ps_availqty as pure
    * integer-hash functions of (partkey, i) / (partkey, suppkey-slot). All
    * values are integer-exact (supplycost is an integer-valued DOUBLE, so
    * products/sums stay exact in IEEE and in DECIMAL), and the within-part
    * supplier slots are distinct (17·Δi mod S ≠ 0 for Δi ≤ 3 at every
    * corpus S ∈ {10,100,1000}), so q2's min-cost equality selects exactly
    * one supplier per part. One SQL string for both engines, per this
    * file's discipline — the CTE name `partsupp` contains no standalone
    * corpus table token, so the temp-view rewrite leaves it alone.
    */
  private val psCte: String =
    s"""partsupp AS (
       |  SELECT p_partkey AS ps_partkey,
       |    (p_partkey * 31 + gen.i * 17 + 7) % sc.s_cnt AS ps_suppkey,
       |    CAST((p_partkey * 37 + gen.i * 13) % 9000 + 100 AS DOUBLE) AS ps_supplycost,
       |    (p_partkey * 7 + gen.i * 11) % 9999 + 1 AS ps_availqty
       |  FROM part
       |  CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1
       |              UNION ALL SELECT 2 UNION ALL SELECT 3) gen
       |  CROSS JOIN (SELECT count(*) AS s_cnt FROM supplier) sc
       |)""".stripMargin

  val q2Sql: String =
    s"""WITH $psCte
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_type
       |FROM part, supplier, partsupp, nation, region
       |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
       |  AND p_size = 16
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'EUROPE'
       |  AND ps_supplycost = (
       |    SELECT min(ps_supplycost) FROM partsupp, supplier, nation, region
       |    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
       |      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |      AND r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  val q9Sql: String =
    s"""WITH $psCte
       |SELECT nation_name, l_year, ${r4("sum(amount)")} AS sum_profit
       |FROM (
       |  SELECT n_name AS nation_name,
       |    CAST(extract(year FROM o_orderdate) AS BIGINT) AS l_year,
       |    CAST(l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity
       |      AS DECIMAL(38,6)) AS amount
       |  FROM part, supplier, lineitem, partsupp, orders, nation
       |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
       |    AND ps_partkey = l_partkey AND p_partkey = l_partkey
       |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
       |    AND p_name LIKE '%rod%') profit
       |GROUP BY nation_name, l_year
       |ORDER BY nation_name, l_year DESC""".stripMargin

  val q11Sql: String =
    s"""WITH $psCte
       |SELECT ps_partkey,
       |  ${r4("sum(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,6)))")} AS value
       |FROM partsupp, supplier, nation
       |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |  AND n_name = 'NATION_15'
       |GROUP BY ps_partkey
       |HAVING sum(CAST(ps_supplycost * ps_availqty AS BIGINT)) * 2 * (
       |    SELECT count(DISTINCT ps_partkey) FROM partsupp, supplier, nation
       |    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |      AND n_name = 'NATION_15')
       |  > (
       |    SELECT sum(CAST(ps_supplycost * ps_availqty AS BIGINT)) * 3
       |    FROM partsupp, supplier, nation
       |    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |      AND n_name = 'NATION_15')
       |ORDER BY value DESC, ps_partkey""".stripMargin

  val q16Sql: String =
    s"""WITH $psCte
       |SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
       |FROM partsupp, part
       |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#13'
       |  AND p_type <> 'PROMO'
       |  AND p_size IN (1, 4, 7, 10, 16, 25, 36, 49)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  val q20Sql: String =
    s"""WITH $psCte
       |SELECT s_name, s_suppkey, n_name
       |FROM supplier, nation
       |WHERE s_suppkey IN (
       |  SELECT ps_suppkey FROM partsupp
       |  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
       |    AND ps_availqty > 0.5 * (
       |      SELECT sum(CAST(l_quantity AS DECIMAL(38,6))) FROM lineitem
       |      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |        AND l_shipdate >= DATE '1996-01-01'
       |        AND l_shipdate < DATE '1997-01-01'))
       |  AND s_nationkey = n_nationkey
       |ORDER BY s_name, s_suppkey""".stripMargin

  /** Derived lineitem extension (round-12, completing the suite): the
    * corpus lineitem carries no commitdate/receiptdate/shipmode, which
    * blocked q12/q21. This CTE derives all three DETERMINISTICALLY from
    * the key columns both engines already read — commitdate at
    * shipdate + (hash % 60 − 29) days (so ship < commit holds for about
    * half the lines, q12's early-commit filter), receiptdate at
    * shipdate + (hash % 30 + 1) days (always after ship; late vs commit
    * for 0.5 + 0.5·(435/900) ≈ 74.2% of lines, q21's waiting predicate),
    * shipmode as a 7-way CASE over an independent key hash. Because these
    * are hash-modulo derivations of (l_orderkey, l_linenumber), q12's
    * counts and q21's waiting set are corpus-construction-dependent: a
    * regenerated corpus with re-based or sparse keys would silently
    * re-weight them. The exact weighting bands (early ≈ 30/60, late
    * ≈ 0.742, MAIL|SHIP = 2/7, the full q12 filter band ≈ 0.242) are
    * pinned in SchemaCanarySpec ("lineitemx derived-CTE weighting bands"),
    * the same way partsupp's slot-distinctness proof is pinned — drift
    * fails the canary, not the oracle. Day offsets are integer-exact BIGINT
    * arithmetic times INTERVAL '1' DAY — both engines implement
    * numeric × day-interval and timestamp + interval with exact-day
    * semantics, so the derived timestamps are bit-identical. The CTE
    * name `lineitemx` shares no standalone `lineitem` token (`x` is a
    * word character), so the temp-view rewrite touches only the real
    * table reference in the CTE body. One SQL string for both engines.
    */
  private[graft] val lxCte: String =
    s"""lineitemx AS (
       |  SELECT lineitem.*,
       |    l_shipdate + ((l_orderkey * 31 + l_linenumber * 17) % 60 - 29)
       |      * INTERVAL '1' DAY AS l_commitdate,
       |    l_shipdate + ((l_orderkey * 13 + l_linenumber * 7) % 30 + 1)
       |      * INTERVAL '1' DAY AS l_receiptdate,
       |    CASE (l_orderkey * 23 + l_linenumber * 5) % 7
       |      WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL'
       |      WHEN 3 THEN 'SHIP' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL'
       |      ELSE 'FOB' END AS l_shipmode
       |  FROM lineitem
       |)""".stripMargin

  val q12Sql: String =
    s"""WITH $lxCte
       |SELECT l_shipmode,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
       |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       |FROM orders, lineitemx
       |WHERE o_orderkey = l_orderkey
       |  AND l_shipmode IN ('MAIL', 'SHIP')
       |  AND l_commitdate < l_receiptdate AND l_shipdate < l_commitdate
       |  AND l_receiptdate >= DATE '1996-01-01'
       |  AND l_receiptdate < DATE '1997-01-01'
       |GROUP BY l_shipmode
       |ORDER BY l_shipmode""".stripMargin

  val q21Sql: String =
    s"""WITH $lxCte
       |SELECT s_name, n_name, count(*) AS numwait
       |FROM supplier, lineitemx l1, orders, nation
       |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
       |  AND o_orderstatus = 'F' AND l1.l_receiptdate > l1.l_commitdate
       |  AND EXISTS (SELECT * FROM lineitemx l2
       |    WHERE l2.l_orderkey = l1.l_orderkey
       |      AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT * FROM lineitemx l3
       |    WHERE l3.l_orderkey = l1.l_orderkey
       |      AND l3.l_suppkey <> l1.l_suppkey
       |      AND l3.l_receiptdate > l3.l_commitdate)
       |  AND s_nationkey = n_nationkey
       |GROUP BY s_name, n_name
       |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  /** q22 adaptations: cntrycode is derived from c_nationkey (the corpus
    * has no c_phone — `10 + nationkey % 15` keeps 25 nations → 15 codes,
    * half in the 7-code IN-list); "has no orders" is degenerate here
    * (every customer has orders at every corpus SF — dense generated FK),
    * so the anti-join condition becomes "has no order above 400000"
    * (~11% of customers at every SF: per-customer order count is a
    * constant 10 and totalprice is uniform to 500k). The average-balance
    * threshold goes through the DECIMAL-sum / count division — a bare
    * avg(DOUBLE) would make the cut depend on accumulation order.
    */
  val q22Sql: String =
    s"""WITH custx AS (
       |  SELECT c_custkey, c_acctbal,
       |    CAST(10 + (c_nationkey % 15) AS STRING) AS cntrycode
       |  FROM customer
       |)
       |SELECT cntrycode, count(*) AS numcust,
       |  ${r4(dsum("c_acctbal"))} AS totacctbal
       |FROM custx
       |WHERE cntrycode IN ('10', '12', '14', '16', '18', '20', '22')
       |  AND c_acctbal > (
       |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
       |      / count(*)
       |    FROM custx
       |    WHERE c_acctbal > 0.0
       |      AND cntrycode IN ('10', '12', '14', '16', '18', '20', '22'))
       |  AND NOT EXISTS (SELECT * FROM orders
       |    WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
       |GROUP BY cntrycode
       |ORDER BY cntrycode""".stripMargin

  val defs: Seq[Q] = Seq(
    tpch("tpch_q1", "TPC-H Q1 pricing summary: full-scan groupBy over 4 " +
      "decimal-exact sums + 3 averages — partial aggregation does almost " +
      "all work map-side (6 groups).", q1Sql),
    tpch("tpch_q3", "TPC-H Q3 shipping priority: segment-filtered " +
      "customer ⋈ orders ⋈ lineitem with opposing date filters, top-10 by " +
      "revenue. Both date filters reach their scans as PushedFilters.", q3Sql),
    tpch("tpch_q5", "TPC-H Q5 local-supplier volume: 6-table star with the " +
      "c_nationkey = s_nationkey locality constraint; dims broadcast, " +
      "facts shuffle once on orderkey.", q5Sql),
    tpch("tpch_q6", "TPC-H Q6 revenue forecast: pure scan-filter-aggregate " +
      "— the pushdown/codegen benchmark (no join, no shuffle beyond the " +
      "final 1-row combine).", q6Sql),
    tpch("tpch_q7", "TPC-H Q7 volume shipping, region-pair form (the " +
      "corpus's 10-supplier sf0.001 makes any fixed nation pair empty): " +
      "directional ASIA↔AMERICA flows by ship year.", q7Sql),
    tpch("tpch_q8", "TPC-H Q8 national market share: 8-table star + " +
      "conditional-share aggregation; the CASE rides the DECIMAL volume " +
      "so the ratio is partition-order independent.", q8Sql),
    tpch("tpch_q10", "TPC-H Q10 returned-item reporting (minus the " +
      "address/phone columns the corpus lacks): one quarter of 'R' " +
      "returns, top-20 customers by lost revenue.", q10Sql),
    tpch("tpch_q14", "TPC-H Q14 promotion effect: month-windowed " +
      "lineitem ⋈ part with a conditional revenue share (p_type equality " +
      "— the synthetic domain has no 'PROMO%' prefixes).", q14Sql),
    tpch("tpch_q18", "TPC-H Q18 large-volume customers: IN-subquery over " +
      "a grouped HAVING (decorrelates to a semi-join on the aggregated " +
      "orderkeys), quantity threshold adapted to the corpus's ≤7 lines " +
      "per order.", q18Sql),
    tpch("tpch_q13", "TPC-H Q13 customer order distribution (minus the " +
      "o_comment exclusion — the corpus has no comments): left join keeps " +
      "zero-order customers, double aggregation builds the histogram.", q13Sql),
    tpch("tpch_q15", "TPC-H Q15 top supplier: CTE revenue view + scalar " +
      "max subquery; DECIMAL revenue makes the max-equality exact, ties " +
      "surface as extra rows ordered by s_suppkey.", q15Sql),
    tpch("tpch_q17", "TPC-H Q17 small-quantity revenue (brand-only — the " +
      "corpus lacks p_container): correlated per-part average decorrelates " +
      "to an aggregate + join, never a per-row re-scan; the avg rides " +
      "DECIMAL-sum/count so both engines compare identical thresholds.", q17Sql),
    tpch("tpch_q4", "TPC-H Q4 order-priority checking, shipdate-lag form " +
      "(the corpus lacks commit/receipt dates — 'shipped >60 days after " +
      "ordering' keeps the late-order EXISTS shape): correlated EXISTS " +
      "decorrelates to a left-semi join.", q4Sql),
    tpch("tpch_q19", "TPC-H Q19 discounted revenue, brand/size/quantity " +
      "band form (no container/shipmode columns): the OR-of-ANDs " +
      "disjunction — only p_partkey = l_partkey is pushable into the " +
      "join; the bands evaluate post-join as one codegen'd predicate.", q19Sql),
    tpch("tpch_q2", "TPC-H Q2 minimum-cost supplier over the DERIVED " +
      "partsupp (the corpus ships none — see psCte): correlated min-cost " +
      "scalar subquery re-reading the same 5-way dim join, decorrelated by " +
      "both engines; within-part costs are hash-distinct so the equality " +
      "picks one supplier per part.", q2Sql),
    tpch("tpch_q9", "TPC-H Q9 product-type profit: the 6-way " +
      "part ⋈ supplier ⋈ lineitem ⋈ partsupp ⋈ orders ⋈ nation star over " +
      "the derived partsupp, profit in DECIMAL, grouped by nation × year.", q9Sql),
    tpch("tpch_q11", "TPC-H Q11 important stock: group-filter-by-global-" +
      "scalar over the derived partsupp — the mean-×1.5 threshold is " +
      "rendered as integer cross-multiplication (sum·2·cnt > total·3), " +
      "scale-free where the classic 0.0001 fraction would empty out at " +
      "larger SFs.", q11Sql),
    tpch("tpch_q16", "TPC-H Q16 part-supplier relationship count over the " +
      "derived partsupp: anti-filtered brand/type, IN-list sizes, " +
      "count(DISTINCT ps_suppkey) per (brand, type, size) (minus the " +
      "s_comment complaint exclusion the corpus cannot express).", q16Sql),
    tpch("tpch_q20", "TPC-H Q20 excess-stock suppliers over the derived " +
      "partsupp: IN-subquery whose body carries a CORRELATED half-year-" +
      "quantity scalar (the deepest decorrelation shape in the suite); " +
      "nation kept as a join + projection — any fixed-nation filter would " +
      "empty at some corpus SF.", q20Sql),
    tpch("tpch_q12", "TPC-H Q12 shipping-mode priority over the DERIVED " +
      "lineitemx commit/receipt/shipmode columns (see lxCte): late-line " +
      "filter (ship < commit < receipt), 2-mode IN, conditional-sum " +
      "priority split.", q12Sql),
    tpch("tpch_q21", "TPC-H Q21 suppliers-who-kept-orders-waiting over " +
      "the derived lineitemx: the suite's hardest decorrelation — a " +
      "correlated EXISTS (another supplier on the order) AND a correlated " +
      "NOT EXISTS (no OTHER supplier was also late) against the same " +
      "derived fact; nation kept as join + group key per the q20 rule.", q21Sql),
    tpch("tpch_q22", "TPC-H Q22 global-sales-opportunity, corpus-adapted: " +
      "nationkey-derived cntrycode (no c_phone), scalar avg-balance " +
      "threshold via exact DECIMAL division, and an anti-join on 'no " +
      "order above 400000' ('no orders at all' is empty at every SF — " +
      "the generated FK is dense).", q22Sql)
  )
}
