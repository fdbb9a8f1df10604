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

  /** `events.ts` has shipped in two physical parquet encodings across corpus
    * vintages, so the loader branches on the dtype Spark actually read and
    * normalizes both to the same logical schema —
    * `ts: TIMESTAMP_NTZ` (micros) + `ts_ns: BIGINT` (epoch nanoseconds):
    *
    *  - TIMESTAMP(NANOS, isAdjustedToUTC=0): Spark's reader rejects NANOS
    *    outright; with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    *    GraftSession — a no-op on MICROS files) it arrives as epoch-nanos
    *    Long. Convert to NTZ by *truncating* to micros (integer `div`, never
    *    double division — 2^53 loses ns precision at 2024 epochs). Truncation
    *    matches DuckDB, which truncates ns→µs reading the same file.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=0) (corpus regenerated 2026-08-13):
    *    read natively as TIMESTAMP_NTZ; derive `ts_ns` as epoch-micros×1000
    *    (exact — downstream tie-breaks/arithmetic keep nanosecond units).
    *    The NTZ epoch is taken with `timestampdiff` against the NTZ epoch
    *    literal — a wall-clock difference, so the result is identical in
    *    EVERY session timezone (an `unix_micros(CAST(ts AS TIMESTAMP))`
    *    form would silently shift by the session's UTC offset in any
    *    session that didn't pin UTC).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // legacy NANOS vintage via nanosAsLong
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts",
            expr("CAST(timestamp_micros(ts_ns div 1000) AS TIMESTAMP_NTZ)"))
      case TimestampNTZType => // MICROS vintage, native NTZ read
        raw.withColumn("ts_ns", expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000L"))
      case TimestampType => // defensive: isAdjustedToUTC=1 vintage, if ever
        raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
          .withColumn("ts", expr("CAST(ts AS TIMESTAMP_NTZ)"))
      case other =>
        throw new IllegalStateException(
          s"events.ts arrived as unexpected type $other — new corpus vintage?")
    }
  }

  /** The table as the ENGINE's declared schema exposes it: `events` through
    * its vintage-adaptive normalization, everything else a plain scan. The
    * one dispatch point for every consumer (fuzz builds, SQL-surface views,
    * schema canaries) — don't re-implement the events special case.
    */
  def loadNormalized(s: SparkSession, d: String, name: String): DataFrame =
    if (name == "events") events(s, d) else load(s, d, name)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
