package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The single most load-bearing function of the engine (SURVEY §1.3): align
  * an incoming DataFrame to a target schema with the reference's three rules
  * (reference `big_uery_handler.py:147-156`):
  *
  *   1. column in both        → safe cast: bad value → NULL, never an error
  *                              (`SAFE_CAST`, reference `big_uery_handler.py:32-42`);
  *                              STRING targets use a plain cast because any
  *                              value casts to string (`:38-39`).
  *   2. column only in target → NULL literal of the target type (`:153-154`).
  *   3. column only in source → silently dropped (the projection iterates
  *                              target columns only, `:148`).
  *
  * Implementation is a single `select` — pure projection, no shuffle, fully
  * codegen'd, and Catalyst prunes the dropped source columns all the way down
  * to the scan. At 100 TB this is a zero-cost map-side transform.
  *
  * Safe-cast is expressed with `try_cast` so the semantics hold regardless of
  * the session's ANSI mode.
  */
object SchemaAlign {

  /** try_cast(col AS t) — NULL on failure under both ANSI and legacy mode. */
  def safeCast(c: Column, t: DataType): Column = t match {
    case StringType => c.cast(StringType) // plain cast: anything → string
    case _          => c.try_cast(t)
  }

  /** Quote an UNTRUSTED identifier for SQL/attribute contexts: wrap in
    * backticks with inner backticks doubled. The single home of this
    * invariant — used by the align kernel's column references AND the
    * ingest DDL builder, so a future quoting fix can't miss one path.
    */
  def quoteIdent(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Reference a column by its LITERAL name. Bare `col(name)` parses the
    * string as a multi-part attribute path, so an untrusted header
    * containing a backtick throws (or, with a dot, silently resolves as
    * struct-field access). Quote and double inner backticks — the exact
    * name, whatever the file put in it.
    */
  private def colExact(name: String): Column = col(quoteIdent(name))

  def alignToSchema(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.map(n => n.toLowerCase -> n).toMap
    val cols: Seq[Column] = target.fields.toSeq.map { f =>
      present.get(f.name.toLowerCase) match {
        case Some(src) => safeCast(colExact(src), f.dataType).as(f.name)
        case None      => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols: _*)
  }

  /** Alignment with data-quality counters riding the SAME job: for every
    * safe-cast column, `observe` counts rows where the source value was
    * present but the cast produced NULL (= the reference's silent
    * SAFE_CAST data loss, made visible). `CollectMetricsExec` accumulates
    * on the executors during the write itself — no second scan, no extra
    * shuffle, which is the only acceptable cost model at 100 TB. Read the
    * counts from the returned Observation after the ingest action:
    * `obs.get("bad_<col>")`.
    */
  def alignToSchemaObserved(df: DataFrame, target: StructType)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val present = df.columns.map(n => n.toLowerCase -> n).toMap
    val casted = target.fields.toSeq.flatMap { f =>
      present.get(f.name.toLowerCase).map { src =>
        (f.name, count(when(colExact(src).isNotNull &&
          safeCast(colExact(src), f.dataType).isNull, 1)).as(s"bad_${f.name}"))
      }
    }
    val obs = org.apache.spark.sql.Observation()
    val aligned = alignToSchema(df.observe(obs, count(lit(1)).as("rows_in"),
      casted.map(_._2): _*), target)
    (aligned, obs)
  }

  /** R5: stamp/backfill the ingestion-date audit column in the same ingest
    * (write-time `coalesce` replaces the reference's post-hoc
    * `UPDATE … WHERE Ingestion_date IS NULL`, `big_uery_handler.py:183-194`).
    * `runDate` is captured once per pipeline run for determinism (SURVEY §7
    * risk 3) rather than calling `current_date()` per expression.
    */
  def stampIngestionDate(df: DataFrame, runDate: java.sql.Date,
                         colName: String = "Ingestion_date"): DataFrame = {
    val base =
      if (df.columns.exists(_.equalsIgnoreCase(colName))) df
      else df.withColumn(colName, lit(null).cast(DateType))
    base.withColumn(colName, coalesce(col(colName), lit(runDate)))
  }
}
