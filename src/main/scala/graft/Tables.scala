package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's TPC-H-ish parquet corpus (TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst sees a declarative scan: column
  * pruning and predicate pushdown reach the parquet reader (visible as
  * `ReadSchema`/`PushedFilters` in `.explain("formatted")`). Never cache here —
  * at 100 TB the corpus does not fit in memory and every query should prune
  * its own columns at the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS, isAdjustedToUTC=false), which
    * Spark's reader rejects outright. With
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as epoch-nanos
    * Long; convert to TIMESTAMP_NTZ by *truncating* to micros (integer
    * `div`, never double division — 2^53 loses ns precision at 2024 epochs).
    * Truncation matches DuckDB, which truncates ns→µs when reading the same
    * file. The original nanos ride along as `ts_ns` for exact arithmetic.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "CAST(timestamp_micros(ts_ns div 1000) AS TIMESTAMP_NTZ)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
