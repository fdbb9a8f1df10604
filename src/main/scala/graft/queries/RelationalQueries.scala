package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.Tables

/** Groups J/A/W/O/U — the relational surface over the TPC-H-ish corpus
  * (SURVEY §2.11). Absent from the reference (it delegates everything to
  * BigQuery, SURVEY §2.3-§2.7); declared here per the north star.
  *
  * Scale notes (100 TB posture) are on each query; the common rules:
  * fact-to-fact joins shuffle on the join key and rely on AQE for skew,
  * dimension joins are explicitly `broadcast()`, aggregates are partial
  * (map-side) + final automatically via HashAggregateExec.
  */
object RelationalQueries {

  /** Exact, order-independent sum of a double expression: cast each value to
    * DECIMAL(38,6) first. Double summation is not associative, so a plain
    * sum(double) differs run-to-run with partitioning (and vs DuckDB);
    * decimal sums are exact and therefore engine- and partition-independent.
    */
  import graft.queries.Canon.dsum
  private def asDouble4(c: Column): Column = round(c.cast(DoubleType), 4)

  val defs: Seq[Q] = Seq(

    // ----- J: joins ------------------------------------------------------
    Q(
      "j1_join_inner",
      "Inner equi-join lineitem ⋈ orders (fact-to-fact: shuffled hash/sort-" +
        "merge on orderkey; at 100 TB both sides co-partition on the key — " +
        "bucketing both tables by orderkey would remove the shuffle entirely).",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .where(o("o_orderstatus") === "F")
          .select(
            col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
            round(col("o_totalprice"), 4).as("o_price"),
            round(col("l_quantity"), 4).as("qty"))
          // qty joins the sort: (l_orderkey, l_linenumber) is NOT unique in
          // this corpus, so it alone is not a total order.
          .orderBy("l_orderkey", "l_linenumber", "qty")
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |  floor((o_totalprice) * 10000 + 0.5) / 10000 AS o_price, floor((l_quantity) * 10000 + 0.5) / 10000 AS qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderstatus = 'F'
             |ORDER BY l_orderkey, l_linenumber, qty""".stripMargin)
    ),
    Q(
      "j2_join_broadcast",
      "Broadcast join orders ⋈ customer: the dimension side is explicitly " +
        "broadcast so the fact table never shuffles — the right plan at any " +
        "scale while the dimension fits in executor memory.",
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .select(col("o_orderkey"), col("c_name"),
            round(col("o_totalprice"), 4).as("price"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, c_name, floor((o_totalprice) * 10000 + 0.5) / 10000 AS price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "j3_join_multiway",
      "Multi-way join lineitem–orders–customer–nation–region with revenue " +
        "rollup per region/nation. nation+region are broadcast; the " +
        "lineitem⋈orders shuffle is the only wide exchange. Aggregate is " +
        "partial+final (map-side combine) so only (r,n) pairs cross the wire.",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            asDouble4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name,
             |  floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |  JOIN orders   ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation   ON c_nationkey = n_nationkey
             |  JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin)
    ),
    Q(
      "j4_join_left",
      "Left outer join customer ⟕ orders, preserving order-less customers; " +
        "per-customer order count and spend (NULL spend for no orders).",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(
            count(col("o_orderkey")).as("order_cnt"),
            asDouble4(dsum(col("o_totalprice"))).as("total_spent"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS order_cnt,
             |  floor((CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS total_spent
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)
    ),
    Q(
      "j5_join_semi",
      "Left semi join: customers with ≥1 order. Semi joins ship no payload " +
        "columns from the right side — cheapest existence check at scale.",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)
    ),
    Q(
      "j6_join_anti",
      "Left anti join: customers with no finished ('F') orders — the " +
        "filter-then-anti-join shape (predicate pushed below the join).",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).where(col("o_orderstatus") === "F")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)
    ),

    // ----- A: aggregations ----------------------------------------------
    Q(
      "a1_agg_pricing",
      "TPC-H Q1-style pricing summary: groupBy(returnflag, linestatus) with " +
        "sum/avg/count. Partial aggregation means each executor emits at most " +
        "|flag×status| rows — the shuffle is tiny regardless of input size.",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            asDouble4(dsum(col("l_quantity"))).as("sum_qty"),
            asDouble4(dsum(col("l_extendedprice"))).as("sum_base"),
            asDouble4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .as("sum_disc"),
            round(dsum(col("l_quantity")).cast(DoubleType) / count(lit(1)), 4)
              .as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  floor((CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS sum_qty,
             |  floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS sum_base,
             |  floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS sum_disc,
             |  floor((CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000 AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),
    Q(
      "a2_agg_count_distinct",
      "Exact count(distinct) per bucket. Exact (not approx_) because the " +
        "oracle hash-compares; Spark expands distinct into a two-phase " +
        "aggregate so it stays distributed.",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.groupBy((col("l_orderkey") % 10).as("bucket"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            count(lit(1)).as("n_rows"))
          .orderBy("bucket")
      },
      Some("""SELECT l_orderkey % 10 AS bucket,
             |  count(DISTINCT l_suppkey) AS n_supp, count(*) AS n_rows
             |FROM lineitem GROUP BY l_orderkey % 10
             |ORDER BY bucket""".stripMargin)
    ),
    Q(
      "a3_agg_rollup",
      "ROLLUP over (returnflag, linestatus): subtotal rows carry NULL group " +
        "keys, ordered NULLS FIRST to match Spark's asc default.",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(asDouble4(dsum(col("l_quantity"))).as("sum_qty"),
            count(lit(1)).as("cnt"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  floor((CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS sum_qty,
             |  count(*) AS cnt
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "a4_agg_cube",
      "CUBE over (o_orderstatus, o_orderpriority).",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"),
            asDouble4(dsum(col("o_totalprice"))).as("sum_price"))
          .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
             |  floor((CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS sum_price
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "a5_agg_grouping_sets",
      "GROUPING SETS via SQL over a temp view — exercises the SQL entry path.",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_gs")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
                |FROM orders_gs
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    ),
    Q(
      "a6_agg_having",
      "HAVING-style filter on an aggregate: big-spender customers.",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("order_cnt"),
            asDouble4(dsum(col("o_totalprice"))).as("total"))
          .filter(col("total") > 500000d)
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, count(*) AS order_cnt,
             |  floor((CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS total
             |FROM orders GROUP BY o_custkey
             |HAVING floor((CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 > 500000
             |ORDER BY o_custkey""".stripMargin)
    ),

    // ----- W: window functions ------------------------------------------
    Q(
      "w1_window_rank",
      "row_number/rank/dense_rank per customer by totalprice. Window " +
        "partitions by custkey: one shuffle, then per-partition sort — no " +
        "global sort until the final ORDER BY.",
      (s, d) => {
        val o = Tables.orders(s, d)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 4).as("price"),
            row_number().over(w).cast(LongType).as("rn"),
            rank().over(w).cast(LongType).as("rk"),
            dense_rank().over(w).cast(LongType).as("drk"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, floor((o_totalprice) * 10000 + 0.5) / 10000 AS price,
             |  CAST(row_number() OVER w AS BIGINT) AS rn,
             |  CAST(rank() OVER w AS BIGINT) AS rk,
             |  CAST(dense_rank() OVER w AS BIGINT) AS drk
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
             |ORDER BY o_custkey, rn""".stripMargin)
    ),
    Q(
      "w2_window_lag_lead",
      "lag/lead of totalprice per customer in order-date order.",
      (s, d) => {
        val o = Tables.orders(s, d)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        o.select(col("o_custkey"), col("o_orderkey"),
            round(lag(col("o_totalprice"), 1).over(w), 4).as("prev_price"),
            round(lead(col("o_totalprice"), 1).over(w), 4).as("next_price"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  floor((lag(o_totalprice, 1) OVER w) * 10000 + 0.5) / 10000 AS prev_price,
             |  floor((lead(o_totalprice, 1) OVER w) * 10000 + 0.5) / 10000 AS next_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)
    ),
    Q(
      "w3_window_running_sum",
      "Running sum with rows UNBOUNDED PRECEDING → CURRENT ROW; summed in " +
        "DECIMAL so the cumulative value is exact at any partition size.",
      (s, d) => {
        val o = Tables.orders(s, d)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(col("o_custkey"), col("o_orderkey"),
            round(sum(col("o_totalprice").cast(DecimalType(38, 6))).over(w)
              .cast(DoubleType), 4).as("running_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  floor((CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)) * 10000 + 0.5) / 10000 AS running_total
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)
    ),

    // ----- O: sort / limit / top-k --------------------------------------
    Q(
      "o1_top10_orders",
      "Global top-10 by totalprice with key tiebreak. Spark plans " +
        "TakeOrderedAndProject: per-partition top-10 then a driver merge — " +
        "no global sort of the full table.",
      (s, d) => {
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice"), 4).as("price"))
          .orderBy(col("price").desc, col("o_orderkey").asc)
          .limit(10)
          .orderBy(col("price").desc, col("o_orderkey").asc)
      },
      Some("""SELECT o_orderkey, o_custkey, floor((o_totalprice) * 10000 + 0.5) / 10000 AS price
             |FROM orders
             |ORDER BY price DESC NULLS LAST, o_orderkey ASC
             |LIMIT 10""".stripMargin)
    ),
    Q(
      "o2_topk_per_group",
      "Top-3 orders per customer: window row_number + filter — the " +
        "distributed top-k-per-key idiom (never a per-group collect).",
      (s, d) => {
        val o = Tables.orders(s, d)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 4).as("price"),
            row_number().over(w).cast(LongType).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, price, rn FROM (
             |  SELECT o_custkey, o_orderkey, floor((o_totalprice) * 10000 + 0.5) / 10000 AS price,
             |    CAST(row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
             |  FROM orders) t
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)
    ),

    // ----- U: set operations --------------------------------------------
    Q(
      "u1_union_by_name",
      "unionByName(allowMissingColumns=true) — the Spark idiom for the " +
        "reference's missing-column NULL-fill rule (SURVEY §2.7).",
      (s, d) => {
        val c = Tables.customer(s, d).select(
          col("c_custkey").as("id"), col("c_name").as("name"),
          round(col("c_acctbal"), 4).as("acctbal"), lit("customer").as("src"))
        val sup = Tables.supplier(s, d).select(
          col("s_suppkey").as("id"), col("s_name").as("name"),
          lit("supplier").as("src"))
        c.unionByName(sup, allowMissingColumns = true).orderBy("src", "id")
      },
      Some("""SELECT c_custkey AS id, c_name AS name,
             |  floor((c_acctbal) * 10000 + 0.5) / 10000 AS acctbal, 'customer' AS src FROM customer
             |UNION ALL
             |SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE), 'supplier' FROM supplier
             |ORDER BY src, id""".stripMargin)
    ),
    Q(
      "u2_intersect",
      "INTERSECT of customer keys matching two predicates (distinct set op).",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
          .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |ORDER BY o_custkey""".stripMargin)
    ),
    Q(
      "u3_except",
      "EXCEPT of customer keys (distinct set difference).",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
          .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |ORDER BY o_custkey""".stripMargin)
    )
  )
}
