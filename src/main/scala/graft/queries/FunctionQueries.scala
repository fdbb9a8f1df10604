package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.Tables

/** Group F — scalar / array / JSON / higher-order functions (SURVEY §2.11
  * F6-F12). All built-ins (`org.apache.spark.sql.functions`), so everything
  * stays inside whole-stage codegen; no UDFs anywhere on this path.
  *
  * Float-fold determinism: array reductions use the sequential `aggregate`
  * HOF with a 0.0 seed; the DuckDB oracle uses `list_reduce` (first element
  * as seed — identical addition sequence since 0.0 + v0 == v0).
  */
object FunctionQueries {

  val defs: Seq[Q] = Seq(
    Q(
      "f6_string_funcs",
      "String functions over part.p_name: lower/substring/trim/split/concat.",
      (s, d) => {
        Tables.part(s, d).select(
          col("p_partkey"),
          lower(col("p_name")).as("lowered"),
          substring(col("p_name"), 1, 5).as("prefix5"),
          trim(col("p_name")).as("trimmed"),
          size(split(col("p_name"), " ")).cast(LongType).as("n_words"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type")
        ).orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, lower(p_name) AS lowered,
             |  substr(p_name, 1, 5) AS prefix5, trim(p_name) AS trimmed,
             |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
             |  p_brand || '/' || p_type AS brand_type
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),
    Q(
      "f7_date_funcs",
      "Date functions: month truncation and year extraction over NTZ " +
        "timestamps (DuckDB date_trunc returns DATE, Spark returns TIMESTAMP " +
        "— both sides normalize to DATE).",
      (s, d) => {
        Tables.orders(s, d).select(
          col("o_orderkey"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          year(col("o_orderdate")).cast(LongType).as("yr"),
          month(col("o_orderdate")).cast(LongType).as("mo")
        ).orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             |  CAST(year(o_orderdate) AS BIGINT) AS yr,
             |  CAST(month(o_orderdate) AS BIGINT) AS mo
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "f8_math_funcs",
      "Math functions over the discounted-price expression: round/abs/ceil/" +
        "floor (ceil/floor normalized to BIGINT on both sides).",
      (s, d) => {
        val base = col("l_extendedprice") * (lit(1) - col("l_discount"))
        Tables.lineitem(s, d).select(
          col("l_orderkey"),
          col("l_linenumber").cast(LongType).as("l_linenumber"),
          round(base, 2).as("disc_price"),
          ceil(base).cast(LongType).as("price_ceil"),
          floor(base).cast(LongType).as("price_floor"),
          round(abs(col("l_discount") - lit(0.05)), 4).as("disc_dev")
          // ALL output columns join the sort: (l_orderkey, l_linenumber)
          // is NOT unique in this corpus, so only a sort over the full
          // output row is a total order.
        ).orderBy("l_orderkey", "l_linenumber", "disc_price", "price_ceil",
          "price_floor", "disc_dev")
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |  floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS disc_price,
             |  CAST(ceil(l_extendedprice * (1 - l_discount)) AS BIGINT) AS price_ceil,
             |  CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT) AS price_floor,
             |  floor((abs(l_discount - 0.05)) * 10000 + 0.5) / 10000 AS disc_dev
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, disc_price, price_ceil, price_floor, disc_dev""".stripMargin)
    ),
    Q(
      "f9_json_extract",
      "JSON path extraction from events.props via get_json_object " +
        "(codegen'd JsonPath evaluation; never a UDF).",
      (s, d) => {
        Tables.events(s, d).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").try_cast(LongType).as("k_val")
        ).orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  TRY_CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS BIGINT) AS k_val
             |FROM events ORDER BY event_id""".stripMargin)
    ),
    Q(
      "f10_array_funcs",
      "Array functions over embeddings.embedding: size, element access, " +
        "slice + sequential fold, predicate filter count.",
      (s, d) => {
        Tables.embeddings(s, d).select(
          col("vec_id"),
          size(col("embedding")).cast(LongType).as("dim"),
          round(element_at(col("embedding"), 1).cast(DoubleType), 4).as("first_v"),
          round(aggregate(
            transform(slice(col("embedding"), 1, 8), x => x.cast(DoubleType)),
            lit(0.0), (acc, x) => acc + x), 4).as("head_sum"),
          size(filter(col("embedding"), x => x > 0)).cast(LongType).as("n_pos")
        ).orderBy("vec_id")
      },
      Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
             |  floor((CAST(embedding[1] AS DOUBLE)) * 10000 + 0.5) / 10000 AS first_v,
             |  floor((list_reduce(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), (a, b) -> a + b)) * 10000 + 0.5) / 10000 AS head_sum,
             |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
             |FROM embeddings ORDER BY vec_id""".stripMargin)
    ),
    Q(
      "f11_higher_order",
      "Higher-order functions: transform (vector scale) + aggregate (L2 " +
        "norm) — the codegen-friendly way to do vector math on array columns.",
      (s, d) => {
        Tables.embeddings(s, d).select(
          col("vec_id"),
          round(sqrt(aggregate(
            transform(col("embedding"), x => x.cast(DoubleType) * x.cast(DoubleType)),
            lit(0.0), (acc, x) => acc + x)), 4).as("l2_norm"),
          round(element_at(
            transform(col("embedding"), x => x.cast(DoubleType) * lit(2.0)), 1), 4)
            .as("scaled_first")
        ).orderBy("vec_id")
      },
      Some("""SELECT vec_id,
             |  floor((sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))) * 10000 + 0.5) / 10000 AS l2_norm,
             |  floor((CAST(embedding[1] AS DOUBLE) * 2.0) * 10000 + 0.5) / 10000 AS scaled_first
             |FROM embeddings ORDER BY vec_id""".stripMargin)
    ),
    Q(
      "f12_conditional",
      "Conditional expressions: CASE WHEN / nullif / coalesce.",
      (s, d) => {
        Tables.orders(s, d).select(
          col("o_orderkey"),
          when(col("o_totalprice") > 200000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("tier"),
          nullif(col("o_orderstatus"), lit("O")).as("non_open_status"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status2")
        ).orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_totalprice > 200000 THEN 'high'
             |       WHEN o_totalprice > 100000 THEN 'mid'
             |       ELSE 'low' END AS tier,
             |  nullif(o_orderstatus, 'O') AS non_open_status,
             |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    )
  )
}
