package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.QueryCatalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine itself lives in the `graft.*` packages (schema kernel, ingest,
  * query catalog, streaming, dedup/similarity/text/multimodal); this object
  * is the thin declared surface the driver exercises.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A representative slice of the engine: multi-way join + broadcast dims +
    * decimal-exact aggregation (SURVEY §2.11 J3/A1 shape).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val l = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(38, 6))).cast(DoubleType), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("c_mktsegment")
  }

  /** One entry per implemented operator from SURVEY.md §2 (the declared
    * inventory, §2.11).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for ops whose base hash (murmur3/
    * xxhash64) or typed mapPartitions step DuckDB cannot express — those get
    * the driver's rows-only check and a ScalaTest semantic assertion instead.
    */
  def oracleSql: Map[String, String] =
    QueryCatalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
