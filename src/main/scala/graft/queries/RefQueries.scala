package graft.queries

import java.sql.Date

import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.Tables
import graft.ingest.Ingest
import graft.schema.SchemaAlign

/** Group R — the reference's own semantics as oracle-checkable queries
  * (SURVEY §2.11 R1-R8). The CSV→table paths (R1/R2/R6/R7) are exercised by
  * the ScalaTest ingest suite; here the *expression-level* semantics are
  * declared against the corpus so the DuckDB oracle can check them.
  */
object RefQueries {

  // Fixed run date so the query is deterministic across engines and runs
  // (SURVEY §7 risk 3: the reference bakes a Python date literal the same way,
  // big_uery_handler.py:95).
  private val RunDate = "2026-08-12"

  val defs: Seq[Q] = Seq(
    Q(
      "r2_safe_cast",
      "SAFE_CAST semantics (big_uery_handler.py:32-42): bad value → NULL, " +
        "never an error; STRING target uses a plain cast.",
      (s, d) => {
        val part = Tables.part(s, d)
        part.select(
          col("p_partkey"),
          col("p_name").try_cast(LongType).as("bad_cast"),
          col("p_size").cast(StringType).try_cast(LongType).as("good_cast"),
          col("p_brand").cast(StringType).as("str_cast")
        ).orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |  TRY_CAST(p_name AS BIGINT) AS bad_cast,
             |  TRY_CAST(CAST(p_size AS VARCHAR) AS BIGINT) AS good_cast,
             |  CAST(p_brand AS VARCHAR) AS str_cast
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),
    Q(
      "r3_align_schema",
      "alignToSchema three rules (big_uery_handler.py:147-156): shared column " +
        "cast, missing column NULL-filled, extra columns dropped.",
      (s, d) => {
        val target = StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_name", StringType),
          StructField("missing_col", DoubleType),
          StructField("c_acctbal", DoubleType)))
        SchemaAlign.alignToSchema(Tables.customer(s, d), target)
          .withColumn("c_acctbal", round(col("c_acctbal"), 4))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name,
             |  CAST(NULL AS DOUBLE) AS missing_col,
             |  floor((c_acctbal) * 10000 + 0.5) / 10000 AS c_acctbal
             |FROM customer ORDER BY c_custkey""".stripMargin)
    ),
    Q(
      "r5_ingestion_stamp",
      "Write-time Ingestion_date stamping (replaces the post-hoc UPDATE at " +
        "big_uery_handler.py:183-194): NULLs backfilled with the run date.",
      (s, d) => {
        val stamped = SchemaAlign.stampIngestionDate(
          Tables.region(s, d), Date.valueOf(RunDate))
        stamped.select(
          col("r_regionkey").cast(LongType).as("r_regionkey"),
          col("r_name"),
          col("Ingestion_date").as("ingestion_date")
        ).orderBy("r_regionkey")
      },
      Some(s"""SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name,
              |  DATE '$RunDate' AS ingestion_date
              |FROM region ORDER BY r_regionkey""".stripMargin)
    ),
    Q(
      "r8_run_window",
      "Date-range derivation as real DateType params (replaces the '%m%d' " +
        "strings at fresh_picked_leads.py:143-147).",
      (s, d) => {
        val (start, end) = Ingest.runWindow(Date.valueOf(RunDate))
        s.range(1).select(
          lit(start).as("start_date"),
          lit(end).as("end_date"),
          date_format(lit(start), "MMdd").as("start_fmt"),
          date_format(lit(end), "dd").as("end_fmt"))
      },
      Some(s"""SELECT DATE '$RunDate' - 1 AS start_date,
              |  DATE '$RunDate' AS end_date,
              |  strftime(DATE '$RunDate' - 1, '%m%d') AS start_fmt,
              |  strftime(DATE '$RunDate', '%d') AS end_fmt""".stripMargin)
    ),
    Q(
      "r13_ingest_report",
      "Per-run ingest observability (engine-native form of the reference's " +
        "log_handler.py:24-40 + exception_logger.py:3-10): a real drop-dir " +
        "run — one good file landing in a pre-created table with a drifted " +
        "column type, one unreadable file — persisted to the " +
        "ingest_run_report table with rows-in and per-column safe-cast loss " +
        "counters observed ON the ingest job itself. The oracle recomputes " +
        "the loaded row's facts from the raw corpus (rows = count(part), " +
        "bad_p_name = values a BIGINT cast would NULL).",
      (s, d) => {
        import java.nio.file.Files
        val runId = "r13_" + java.util.UUID.randomUUID().toString
        // Per-invocation namespace: every catalog object this demo touches
        // carries the run's own suffix, so concurrent or back-to-back
        // builds (bench warmup vs measure, parallel harnesses) can never
        // race on shared table names. The suffix is stripped from the
        // OUTPUT columns below — the hash-compared contract stays stable
        // while the operational names stay unique.
        val sfx = runId.takeRight(12)
        val demoTable = s"rpt_demo_$sfx"
        val reportTable = s"rpt_ingest_report_$sfx"
        val drop = Files.createTempDirectory("graft-r13-drop")
        val stage = Files.createTempDirectory("graft-r13-stage")
        // land part's columns as one CSV named for the target table
        Tables.part(s, d).select("p_partkey", "p_name", "p_size")
          .coalesce(1).write.option("header", "true")
          .mode("overwrite").csv(stage.toString)
        import scala.jdk.CollectionConverters._
        val csv = scala.util.Using.resource(Files.list(stage)) { st =>
          st.iterator().asScala
            .find(_.getFileName.toString.endsWith(".csv")).get
        }
        Files.move(csv, drop.resolve(s"$demoTable.csv"))
        Files.writeString(drop.resolve("rpt_zz_empty.csv"), "") // read fails: no schema
        // Unique names make cross-run collisions impossible, but the managed
        // LOCATION must still be cleared when the table is dropped below —
        // resolve it through the CURRENT database's locationUri (never a
        // bare <warehouse>/<table> concat, which points at the default db's
        // namespace under USE <other_db>).
        def dropWithLocation(t: String): Unit = {
          s.sql(s"DROP TABLE IF EXISTS $t") // catalog-known: deletes data too
          val dbLoc = s.catalog.getDatabase(s.catalog.currentDatabase).locationUri
          val path = new org.apache.hadoop.fs.Path(dbLoc, t)
          val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(path)) fs.delete(path, true) // catalog-forgotten leftover
        }
        // pre-created target with p_name : BIGINT → every name safe-casts
        // to NULL and the observe counter records exactly how many
        s.sql(s"""CREATE TABLE $demoTable
                 |  (p_partkey BIGINT, p_name BIGINT, p_size BIGINT,
                 |   Ingestion_date DATE)
                 |USING parquet PARTITIONED BY (Ingestion_date)""".stripMargin)
        Ingest.runDropDirReport(s, drop.toString, Date.valueOf(RunDate), runId,
          reportTable = reportTable)
        // the drop dir is drained on success and the failed fixture plus the
        // staging leftovers are ours to clean — don't leak tens of MB of
        // temp CSV per verification run
        def rmTree(p: java.nio.file.Path): Unit =
          if (Files.exists(p)) {
            scala.util.Using.resource(Files.walk(p)) { w =>
              w.sorted(java.util.Comparator.reverseOrder())
                .forEach(f => Files.deleteIfExists(f))
            }
          }
        rmTree(stage); rmTree(drop)
        // The persisted round-trip is the thing under test: the report rows
        // are read back THROUGH the catalog table, then pinned into a
        // table-independent DataFrame so the namespaced tables can be
        // dropped right here — nothing leaks into the warehouse, and the
        // lazy result the harness re-executes never references a table
        // another invocation may have since removed.
        val reportDf = s.table(reportTable)
          .where(col("run_id") === runId)
          .select(
            replace(element_at(split(col("file"), "/"), -1),
              lit(s"_$sfx"), lit("")).as("file_name"),
            replace(col("table_name"), lit(s"_$sfx"), lit("")).as("table_name"),
            col("outcome"), col("rows_in"),
            col("bad_casts").getItem("p_name").as("bad_p_name"))
          .orderBy("file_name")
        val pinned = s.createDataFrame(
          java.util.Arrays.asList(reportDf.collect(): _*), reportDf.schema)
        dropWithLocation(demoTable)
        dropWithLocation(reportTable)
        pinned.orderBy("file_name")
      },
      Some("""SELECT 'rpt_demo.csv' AS file_name, 'rpt_demo' AS table_name,
             |  'loaded' AS outcome, count(*) AS rows_in,
             |  count(*) FILTER (WHERE p_name IS NOT NULL
             |    AND TRY_CAST(p_name AS BIGINT) IS NULL) AS bad_p_name
             |FROM part
             |UNION ALL
             |SELECT 'rpt_zz_empty.csv', NULL, 'failed', NULL, NULL
             |ORDER BY file_name""".stripMargin)
    )
  )
}
