package graft.ingest

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Date

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.schema.SchemaAlign

import scala.util.control.NonFatal

/** CSV → managed-table ingest, the reference's actual capability surface
  * re-expressed Spark-first (SURVEY §2.1 S2-S9, §2.11 R1-R8).
  *
  * The reference's lifecycle per file (reference `big_uery_handler.py:93-106`):
  * table absent → autodetect load with truncate; table present → load to a
  * staging table, SAFE_CAST-align to the target schema, INSERT…SELECT append,
  * drop staging. In Spark the staging hop disappears: read → align → append is
  * one lazy plan, so the "staging table" is just an unmaterialized DataFrame
  * and the whole path is a single distributed job with no extra I/O.
  */
object Ingest {

  /** S3: header + schema inference, mirroring `autodetect=True` +
    * `skip_leading_rows=1` (reference `big_uery_handler.py:110-118`).
    * `mode=PERMISSIVE` keeps the never-error posture of the load path.
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** JSON-lines sibling of readCsv: same inference + never-error posture.
    * Beyond the reference's surface (it only ships CSVs) but the alignment
    * semantics downstream are format-agnostic by construction.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .json(path)

  /** Self-describing columnar siblings: parquet/ORC carry their own schema,
    * so no inference step — the alignment semantics downstream stay
    * identical (a drifted column still SAFE_CASTs to the target type).
    */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Extension-dispatched reader for the drop dir. */
  def readAuto(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".jsonl") || lower.endsWith(".json")) readJsonl(spark, path)
    else if (lower.endsWith(".parquet")) readParquet(spark, path)
    else if (lower.endsWith(".orc")) readOrc(spark, path)
    else readCsv(spark, path)
  }

  /** R7: table name = lowercase(stem(filename)) (reference `big_uery_handler.py:74`). */
  def tableNameFor(fileName: String): String = {
    val stem = fileName.lastIndexOf('.') match {
      case -1 => fileName
      case i  => fileName.substring(0, i)
    }
    stem.toLowerCase
  }

  /** R8: run window = [yesterday, today] as real DateType params, replacing
    * the reference's "%m%d"/"%d" UI strings (`fresh_picked_leads.py:143-147`).
    * Captured once per run for determinism (SURVEY §7 risk 3).
    */
  def runWindow(runDate: Date): (Date, Date) =
    (Date.valueOf(runDate.toLocalDate.minusDays(1)), runDate)

  /** Per-file ingest: create-overwrite when the table is new (R1, S4),
    * align-append when it exists (R2-R4, S5). Ingestion_date is stamped at
    * write time (R5). Tables are partitioned by Ingestion_date on create —
    * our scale improvement: daily ingests append whole partitions, and any
    * query filtering on ingestion date gets partition pruning for free.
    */
  /** Table + the run-report facts the write itself observed: row count and
    * per-column safe-cast loss counters (`bad_<col>` → count of rows whose
    * source value was present but cast to NULL). The counters ride the
    * ingest job via `observe` — no second scan (SchemaAlign
    * .alignToSchemaObserved); the create path has no target schema to cast
    * to, so it reports rows only.
    */
  final case class IngestResult(table: String, rowsIn: Long,
                                badCasts: Map[String, Long])

  def ingestFile(spark: SparkSession, filePath: String, runDate: Date,
                 evolveSchema: Boolean = false): String =
    ingestFileObserved(spark, filePath, runDate, evolveSchema).table

  def ingestFileObserved(spark: SparkSession, filePath: String, runDate: Date,
                         evolveSchema: Boolean = false): IngestResult = {
    val table = tableNameFor(Paths.get(filePath).getFileName.toString)
    val raw   = readAuto(spark, filePath)
    if (!spark.catalog.tableExists(table)) {
      val obs = org.apache.spark.sql.Observation()
      SchemaAlign.stampIngestionDate(
          raw.observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("rows_in")), runDate)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("Ingestion_date")
        .saveAsTable(table)
      IngestResult(table, obs.get("rows_in").asInstanceOf[Long], Map.empty)
    } else {
      // Opt-in schema evolution: the reference's rule is "existing tables
      // never gain columns" (extra CSV columns silently dropped,
      // big_uery_handler.py:148 — reproduced by alignToSchema's default).
      // With evolveSchema=true, genuinely new columns are ADDed to the
      // table first (metadata-only ALTER; historical rows read NULL, no
      // rewrite at any scale) and the file then aligns to the widened
      // schema. Existing columns still SAFE_CAST to their current type —
      // evolution adds, never mutates.
      if (evolveSchema) {
        val existing = spark.table(table).schema.fieldNames
          .map(_.toLowerCase).toSet
        val newCols = raw.schema.fields.filterNot(f =>
          existing.contains(f.name.toLowerCase))
        if (newCols.nonEmpty) {
          // quoteIdent: a column name from an UNTRUSTED drop-dir header
          // must never break out of the quoted identifier and inject DDL
          // (the injection class r12_parameterized exists to close on the
          // query side)
          val ddl = newCols
            .map(f => s"${SchemaAlign.quoteIdent(f.name)} ${f.dataType.sql}")
            .mkString(", ")
          // the table name is filename-derived (tableNameFor) — just as
          // untrusted as the headers, so it gets the same quoting
          spark.sql(
            s"ALTER TABLE ${SchemaAlign.quoteIdent(table)} ADD COLUMNS ($ddl)")
        }
      }
      val target  = spark.table(table).schema
      val (aligned, obs) = SchemaAlign.alignToSchemaObserved(raw, target)
      SchemaAlign.stampIngestionDate(aligned, runDate)
        .write.mode(SaveMode.Append)
        .partitionBy("Ingestion_date") // must match the create-path layout
        .saveAsTable(table)
      val m = obs.get
      IngestResult(table, m("rows_in").asInstanceOf[Long],
        m.collect { case (k, v) if k.startsWith("bad_") =>
          k.stripPrefix("bad_") -> v.asInstanceOf[Long]
        })
    }
  }

  sealed trait FileOutcome { def file: String }
  final case class Loaded(file: String, table: String) extends FileOutcome
  final case class Failed(file: String, error: String) extends FileOutcome

  /** One run-report row per file — the engine-native form of the
    * reference's logging sinks (`log_handler.py:24-40`) + Sentry capture
    * (`exception_logger.py:3-10`): what loaded, where, how many rows, how
    * many values each safe-cast silently NULLed, and what failed with what
    * error — persisted (see runDropDirReport), not printed.
    */
  final case class FileReport(file: String, tableName: Option[String],
                              outcome: String, rowsIn: Option[Long],
                              badCasts: Map[String, Long],
                              error: Option[String])

  /** S2 + R6 + S9: scan the drop directory, ingest every `*.csv`, isolate
    * per-file failures (one bad file never stops the batch, reference
    * `big_uery_handler.py:78-83`). Deliberate divergence from the reference
    * (SURVEY §1.4): the reference deletes the file even when the upload
    * failed (`finally:` at `big_uery_handler.py:84-89`) — silent data loss.
    * Here: delete on success, archive to `failedDir` on failure.
    */
  def runDropDir(spark: SparkSession, dropDir: String, runDate: Date,
                 deleteOnSuccess: Boolean = true,
                 failedDir: Option[String] = None,
                 extensions: Set[String] = Set(".csv")): Seq[FileOutcome] =
    ingestBatch(spark, dropDir, runDate, deleteOnSuccess, failedDir, extensions)
      .map(_._1)

  /** runDropDir + a persisted run report: every file's outcome (rows
    * ingested, per-column safe-cast loss, error on failure) is appended to
    * `reportTable`, partitioned by run_date so report retention/pruning is
    * metadata-only like every other ingested table. The report write is a
    * driver-side handful of rows — its cost is one tiny append regardless
    * of data scale, and the counters it carries were accumulated ON the
    * ingest jobs themselves (observe), never by a second scan.
    */
  def runDropDirReport(spark: SparkSession, dropDir: String, runDate: Date,
                       runId: String,
                       reportTable: String = "ingest_run_report",
                       deleteOnSuccess: Boolean = true,
                       failedDir: Option[String] = None,
                       extensions: Set[String] = Set(".csv")): Seq[FileReport] = {
    val reports =
      ingestBatch(spark, dropDir, runDate, deleteOnSuccess, failedDir, extensions)
        .map(_._2)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("run_id", StringType),
      StructField("file", StringType),
      StructField("table_name", StringType),
      StructField("outcome", StringType),
      StructField("rows_in", LongType),
      StructField("bad_casts", MapType(StringType, LongType)),
      StructField("error", StringType),
      StructField("run_date", DateType)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    reports.foreach { r =>
      rows.add(Row(runId, r.file, r.tableName.orNull, r.outcome,
        r.rowsIn.map(Long.box).orNull, r.badCasts, r.error.orNull, runDate))
    }
    spark.createDataFrame(rows, schema)
      .write.mode(SaveMode.Append)
      .partitionBy("run_date")
      .saveAsTable(reportTable)
    reports
  }

  private def ingestBatch(spark: SparkSession, dropDir: String, runDate: Date,
                          deleteOnSuccess: Boolean, failedDir: Option[String],
                          extensions: Set[String])
      : Seq[(FileOutcome, FileReport)] = {
    import scala.jdk.CollectionConverters._
    // Files.list holds a directory handle until closed (try-with-resources
    // contract) — materialize the listing inside Using so it never leaks.
    // Default extension filter is CSV-only, matching the reference
    // (`big_uery_handler.py:71-72`); pass Set(".csv", ".jsonl") to widen.
    val files = scala.util.Using.resource(Files.list(Paths.get(dropDir))) { s =>
      s.iterator().asScala
        .filter(p => extensions.exists(
          p.getFileName.toString.toLowerCase.endsWith))
        .toSeq
    }.sortBy(_.getFileName.toString)
    files.map { p =>
      try {
        val res = ingestFileObserved(spark, p.toString, runDate)
        // Post-success cleanup failure must NOT demote the outcome to
        // Failed (the rows are already in the table) — but the file must
        // also not stay in the drop dir, or the next runDropDir pass would
        // re-ingest it via the align-append path and duplicate its rows.
        // Escalation: delete → retry delete → move out to `.ingested/`
        // (out of the listing, so out of future runs either way).
        if (deleteOnSuccess) removeIngested(p)
        (Loaded(p.toString, res.table),
          FileReport(p.toString, Some(res.table), "loaded",
            Some(res.rowsIn), res.badCasts, None))
      } catch {
        case NonFatal(e) =>
          // Archiving is best-effort: a failed move must not escape and
          // abort the batch ("one bad file never stops the batch").
          failedDir.foreach { d =>
            try {
              val dst = Paths.get(d)
              Files.createDirectories(dst)
              Files.move(p, dst.resolve(p.getFileName), StandardCopyOption.REPLACE_EXISTING)
            } catch {
              case NonFatal(e2) => System.err.println(
                s"[ingest] could not archive failed file $p: ${e2.getMessage}")
            }
          }
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          (Failed(p.toString, msg),
            FileReport(p.toString, None, "failed", None, Map.empty, Some(msg)))
      }
    }
  }

  /** The streaming-idiomatic drop dir (SURVEY §2.1 S2's second form): a
    * file-source stream over the directory, aligned and stamped per
    * micro-batch into a managed table.
    *
    * Delivery semantics, honestly: the checkpoint's file log gives
    * exactly-once file PICKUP (a file is never read into two different
    * batches), and foreachBatch is at-least-once (the last batch can
    * replay after a crash between the write and the checkpoint commit) —
    * so the write goes through `EventStreams.writeBatchIdempotent`: each
    * batch OVERWRITES exactly its own `_batch_id=<id>` partition, and a
    * replay rewrites the same partition with the same rows. End to end
    * that is effectively-once into the table, with no delete-on-success —
    * the batch path's crash-between-ingest-and-cleanup double-ingest
    * window does not exist here. The cost: the stream table is laid out
    * by `_batch_id` (the idempotence key), not `Ingestion_date`; the
    * stamp column is still present for predicates, it's just not the
    * partition key.
    *
    * Schema discipline, honestly: file-source streams bind a user schema
    * to CSV POSITIONALLY (the header row is skipped, not matched by
    * name), so a drifted file could silently land values in the wrong
    * columns. `enforceSchema=false` makes Spark validate each file's
    * header against the schema instead — drift FAILS THE STREAM loudly
    * rather than mis-binding silently. Drift-tolerant ingestion (align by
    * name, SAFE_CAST, never error) is the BATCH path's contract
    * (`runDropDir`); the streaming path trades that tolerance for
    * continuous exactly-once pickup.
    *
    * `runDate = Some(d)` pins the stamp (drain-style runs, backfills,
    * tests); `None` stamps each micro-batch with its own processing date,
    * which is what a long-running `ProcessingTime` trigger needs — a
    * week-old stream must not stamp today's rows with its start date.
    */
  def streamDropDir(spark: SparkSession, dropDir: String,
                    fileSchema: org.apache.spark.sql.types.StructType,
                    table: String, runDate: Option[Date], checkpointDir: String,
                    trigger: org.apache.spark.sql.streaming.Trigger =
                      org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema(fileSchema)
      .option("header", "true")
      .option("enforceSchema", "false") // header drift fails loudly, see doc
      .option("mode", "PERMISSIVE")
      .csv(dropDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestStreamBatch(batch.toDF(), table, runDate, batchId)
        spark.catalog.refreshTable(table)
      }
      .start()

  /** The foreachBatch body of [[streamDropDir]], extracted so the
    * crash-replay contract is directly drivable in tests: applying the same
    * (batch, batchId) twice must leave the table in an identical state.
    *
    * The processing-date stamp (runDate = None) is REPLAY-STABLE: before
    * stamping, the batch's own `_batch_id` partition is probed (a
    * partition-pruned, metadata-cheap read) and a prior stamp is reused —
    * so a crash-between-write-and-checkpoint-commit replay that straddles
    * midnight rewrites the partition with the ORIGINAL date, not a new one.
    * A fresh batch stamps the current UTC date (`LocalDate.now(UTC)`, never
    * the JVM-default zone — the engine contract is UTC everywhere, and the
    * session TZ is pinned to UTC while driver wall-clock may not be).
    */
  private[graft] def ingestStreamBatch(batch: DataFrame, table: String,
                                       runDate: Option[Date],
                                       batchId: Long): Unit = {
    // foreachBatch runs on a CLONED session (the micro-batch branch) — do
    // all catalog work through it; the caller refreshes its own session,
    // whose relation cache otherwise serves stale file listings after the
    // clone's write (same hazard mergeBatchUpsert documents)
    val s = batch.sparkSession
    val tableExists = s.catalog.tableExists(table)
    val aligned =
      if (tableExists) {
        val target = org.apache.spark.sql.types.StructType(
          s.table(table).schema.filterNot(_.name == "_batch_id"))
        SchemaAlign.alignToSchema(batch, target)
      } else batch
    val stamp = runDate.getOrElse {
      val prior =
        if (tableExists) {
          import org.apache.spark.sql.functions.{col, max}
          val r = s.table(table)
            .where(col("_batch_id") === batchId) // partition-pruned probe
            .agg(max(col("Ingestion_date"))).collect()(0)
          if (r.isNullAt(0)) null else r.getDate(0)
        } else null
      if (prior != null) prior // replay: keep the original batch stamp
      else Date.valueOf(java.time.LocalDate.now(java.time.ZoneOffset.UTC))
    }
    graft.streaming.EventStreams.writeBatchIdempotent(
      SchemaAlign.stampIngestionDate(aligned, stamp), table, batchId)
  }

  /** Remove a successfully-ingested file from the drop dir so it can never
    * be picked up again: delete, retry the delete once (transient holders —
    * AV scanners, still-closing readers — usually release between attempts),
    * and as a last resort archive it into a `.ingested/` subdirectory, which
    * `runDropDir`'s non-recursive listing never revisits. Only if all three
    * fail is the file left in place (loudly), the one state that risks a
    * double ingest.
    */
  /** Backfill NULL `Ingestion_date` stamps left by EXTERNAL writers — the
    * reference's post-hoc `UPDATE … SET Ingestion_date = CURRENT_DATE()
    * WHERE Ingestion_date IS NULL` (big_uery_handler.py:183-194). The
    * engine's own ingests stamp at write time (R5) and never need this;
    * this is the entry point for tables populated outside the engine
    * (SURVEY §1.3's one remaining reference-semantics delta, closed r13).
    *
    * Cost posture: when the table is partitioned by `Ingestion_date` (the
    * engine's create-path layout) the NULL-stamped rows live in EXACTLY one
    * partition — the Hive default partition — so the rewrite scans only
    * those rows (partition-pruned `IS NULL` filter), appends them re-stamped
    * into the `asOf` partition, and drops the emptied NULL partition:
    * O(null rows), never O(table), at any scale. When the table is NOT
    * partitioned by the stamp column (an external layout), the honest cost
    * of an unpartitioned UPDATE is a full rewrite, staged then overwritten.
    * A missing `Ingestion_date` column is first ADDed (metadata-only ALTER;
    * every row then reads NULL and takes the same backfill path).
    *
    * Returns the number of rows backfilled. The staged copy exists because
    * Spark cannot read and append/overwrite the same table in one job; the
    * stage directory is deleted on success.
    */
  def backfillStamp(spark: SparkSession, table: String, asOf: Date): Long = {
    import org.apache.spark.sql.functions.col
    if (!spark.table(table).columns.exists(_.equalsIgnoreCase("Ingestion_date")))
      spark.sql(s"ALTER TABLE ${SchemaAlign.quoteIdent(table)} " +
        "ADD COLUMNS (`Ingestion_date` DATE)")
    val partitioned = spark.catalog.listColumns(table).collect()
      .exists(c => c.isPartition && c.name.equalsIgnoreCase("Ingestion_date"))
    val nulls = spark.table(table).where(col("Ingestion_date").isNull)
    val stage = Files.createTempDirectory("graft_backfill_").toString
    try {
      if (partitioned) {
        // partition-wise: stage only the NULL partition's rows, re-stamped
        val staged = SchemaAlign.stampIngestionDate(nulls, asOf)
        staged.write.mode(SaveMode.Overwrite).parquet(stage)
        val back = spark.read.parquet(stage)
        val n = back.count()
        if (n > 0) {
          back.write.mode(SaveMode.Append)
            .partitionBy("Ingestion_date").saveAsTable(table)
          spark.sql(s"ALTER TABLE ${SchemaAlign.quoteIdent(table)} " +
            "DROP IF EXISTS PARTITION " +
            "(Ingestion_date = '__HIVE_DEFAULT_PARTITION__')")
          spark.catalog.refreshTable(table)
        }
        n
      } else {
        val n = nulls.count()
        if (n > 0) {
          // unpartitioned external layout: full rewrite through the stage
          SchemaAlign.stampIngestionDate(spark.table(table), asOf)
            .write.mode(SaveMode.Overwrite).parquet(stage)
          val back = spark.read.parquet(stage)
          back.write.mode(SaveMode.Overwrite).saveAsTable(table)
          spark.catalog.refreshTable(table)
        }
        n
      }
    } finally {
      // best-effort stage cleanup (the table's own data is never staged
      // longer than the job)
      try {
        val walk = Files.walk(Paths.get(stage))
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(Files.deleteIfExists(_))
        finally walk.close()
      } catch { case NonFatal(_) => () }
    }
  }

  private def removeIngested(p: java.nio.file.Path): Unit = {
    def tryDelete(): Boolean =
      try { Files.deleteIfExists(p); true } catch { case NonFatal(_) => false }
    // the pause is the point of the retry — a back-to-back second attempt
    // would hit the same transient holder
    def retryDelete(): Boolean = { Thread.sleep(100); tryDelete() }
    if (!tryDelete() && !retryDelete()) {
      try {
        val archived = p.resolveSibling(".ingested")
        Files.createDirectories(archived)
        Files.move(p, archived.resolve(p.getFileName), StandardCopyOption.REPLACE_EXISTING)
        System.err.println(
          s"[ingest] loaded $p but could not delete it; archived to $archived")
      } catch {
        case NonFatal(e) => System.err.println(
          s"[ingest] loaded $p but could not delete OR archive it — " +
            s"MANUAL REMOVAL REQUIRED to avoid double ingest: ${e.getMessage}")
      }
    }
  }
}
