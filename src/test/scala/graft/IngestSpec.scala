package graft

import java.nio.file.{Files, Path}
import java.sql.Date

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Ingest

/** SURVEY §5.4: end-to-end drop-dir ingest scenarios against the FIXTURES.md
  * fixture family (R1-R8 semantics from the reference load path).
  */
class IngestSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  val run: Date = Date.valueOf("2026-08-12")

  private def tmp(): Path = Files.createTempDirectory("graft-drop")
  private def write(dir: Path, name: String, content: String): Unit =
    Files.writeString(dir.resolve(name), content)

  val batch1: String =
    """lead_id,full_name,asking_price,motivated
      |1001,Jane Smith,250000.5,true
      |1002,Bob Jones,180000.0,false
      |""".stripMargin

  test("R1/R7: fresh CSV creates table named lowercase(stem), inferred schema") {
    val dir = tmp()
    write(dir, "Leads_A.csv", batch1)
    val out = Ingest.runDropDir(spark, dir.toString, run)
    assert(out == Seq(Ingest.Loaded(dir.resolve("Leads_A.csv").toString, "leads_a")))
    val t = spark.table("leads_a")
    assert(t.count() == 2)
    assert(Set("integer", "long").contains(t.schema("lead_id").dataType.typeName))
    assert(t.schema("asking_price").dataType.typeName == "double")
    assert(t.columns.contains("Ingestion_date"))
    // R5: every ingested row stamped with the run date
    assert(t.where(s"Ingestion_date = date'$run'").count() == 2)
  }

  test("R2: append with matching schema accumulates rows") {
    val dir = tmp()
    write(dir, "leads_b.csv", batch1)
    Ingest.runDropDir(spark, dir.toString, run)
    write(dir, "leads_b.csv",
      "lead_id,full_name,asking_price,motivated\n1003,Ann Ray,99000.0,true\n")
    Ingest.runDropDir(spark, dir.toString, run)
    assert(spark.table("leads_b").count() == 3)
  }

  test("R3: appended CSV missing a column → NULL-filled") {
    val dir = tmp()
    write(dir, "leads_c.csv", batch1)
    Ingest.runDropDir(spark, dir.toString, run)
    write(dir, "leads_c.csv", "lead_id,full_name,motivated\n1004,No Price,true\n")
    Ingest.runDropDir(spark, dir.toString, run)
    val t = spark.table("leads_c")
    assert(t.where("lead_id = 1004 AND asking_price IS NULL").count() == 1)
  }

  test("R4: appended CSV with extra column → extra silently dropped") {
    val dir = tmp()
    write(dir, "leads_d.csv", batch1)
    Ingest.runDropDir(spark, dir.toString, run)
    write(dir, "leads_d.csv",
      "lead_id,full_name,asking_price,motivated,agent_notes\n1005,Extra Col,1.0,true,call asap\n")
    Ingest.runDropDir(spark, dir.toString, run)
    val t = spark.table("leads_d")
    assert(!t.columns.contains("agent_notes"))
    assert(t.where("lead_id = 1005").count() == 1)
  }

  test("R2 type drift: bad values become NULL, never an error (SAFE_CAST)") {
    val dir = tmp()
    write(dir, "leads_e.csv", batch1)
    Ingest.runDropDir(spark, dir.toString, run)
    write(dir, "leads_e.csv",
      "lead_id,full_name,asking_price,motivated\n1006,Drifter,call me,maybe\n")
    val out = Ingest.runDropDir(spark, dir.toString, run)
    assert(out.forall(_.isInstanceOf[Ingest.Loaded]), out.mkString("; "))
    val r = spark.table("leads_e").where("lead_id = 1006").collect()(0)
    assert(r.isNullAt(r.fieldIndex("asking_price")))
    assert(r.isNullAt(r.fieldIndex("motivated")))
  }

  test("R6: corrupt file skipped, batch continues, file archived not deleted") {
    val dir = tmp()
    val failed = dir.resolve("failed")
    // A file whose *read* fails outright: a directory path masquerading as csv
    // won't fail read; instead make ingest fail via an unreadable file name
    // conflict: simplest reliable failure = a file that is a directory.
    Files.createDirectory(dir.resolve("broken.csv"))
    write(dir, "good.csv", batch1)
    val out = Ingest.runDropDir(spark, dir.toString, run,
      failedDir = Some(failed.toString))
    assert(out.exists { case Ingest.Loaded(f, "good") => f.endsWith("good.csv"); case _ => false })
    assert(out.exists(_.isInstanceOf[Ingest.Failed]))
    assert(spark.table("good").count() == 2)
  }

  test("non-CSV files ignored by the extension filter (P5)") {
    val dir = tmp()
    write(dir, "notes.txt", "not a csv")
    write(dir, "data_f.csv", batch1)
    val out = Ingest.runDropDir(spark, dir.toString, run)
    assert(out.map(_.file).forall(_.endsWith(".csv")))
    assert(Files.exists(dir.resolve("notes.txt")))
  }

  test("successful ingest deletes the source file (S9, delete-on-success)") {
    val dir = tmp()
    write(dir, "leads_g.csv", batch1)
    Ingest.runDropDir(spark, dir.toString, run)
    assert(!Files.exists(dir.resolve("leads_g.csv")))
  }

  test("R8: run window derives yesterday→today as DateType") {
    val (start, end) = Ingest.runWindow(Date.valueOf("2026-08-12"))
    assert(start == Date.valueOf("2026-08-11"))
    assert(end == Date.valueOf("2026-08-12"))
  }

  test("R7: table naming = lowercase(stem)") {
    assert(Ingest.tableNameFor("Fresh_Picked_LEADS.CSV".toLowerCase) == "fresh_picked_leads")
    assert(Ingest.tableNameFor("Buyers.csv") == "buyers")
    assert(Ingest.tableNameFor("noext") == "noext")
  }

  test("JSON-lines ingest: create then align-append with type drift → NULL") {
    val dir = tmp()
    write(dir, "leads_j.jsonl",
      """{"lead_id": 1, "name": "Jane", "price": 250000.5}
        |{"lead_id": 2, "name": "Bob", "price": 180000.0}
        |""".stripMargin)
    val out1 = Ingest.runDropDir(spark, dir.toString, run,
      extensions = Set(".csv", ".jsonl"))
    assert(out1 == Seq(Ingest.Loaded(dir.resolve("leads_j.jsonl").toString, "leads_j")))
    assert(spark.table("leads_j").count() == 2)
    // append: price arrives as a non-numeric string → safe-cast to NULL;
    // extra column dropped (R2/R4 semantics, format-agnostic)
    write(dir, "leads_j.jsonl",
      """{"lead_id": 3, "name": "Ann", "price": "call me", "extra": true}
        |""".stripMargin)
    Ingest.runDropDir(spark, dir.toString, run, extensions = Set(".jsonl"))
    val t = spark.table("leads_j")
    assert(t.count() == 3)
    assert(!t.columns.contains("extra"))
    assert(t.where("lead_id = 3").collect()(0).getAs[Any]("price") == null)
  }

  test("ORC/parquet ingest: self-describing schema, same align-append semantics") {
    import org.apache.spark.sql.functions.col
    val dir = tmp()
    // Spark writes directories; land a real single-file .orc in the drop dir
    def landFile(format: String, name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val stage = Files.createTempDirectory("graft-stage")
      df.coalesce(1).write.format(format).mode("overwrite").save(stage.toString)
      import scala.jdk.CollectionConverters._
      val part = scala.util.Using.resource(Files.list(stage)) { s =>
        s.iterator().asScala.find(_.getFileName.toString.startsWith("part-")).get
      }
      Files.move(part, dir.resolve(name))
    }
    import spark.implicits._
    landFile("orc", "leads_o.orc",
      Seq((1L, "Jane", 250000.5), (2L, "Bob", 180000.0))
        .toDF("lead_id", "name", "price"))
    val out1 = Ingest.runDropDir(spark, dir.toString, run, extensions = Set(".orc"))
    assert(out1 == Seq(Ingest.Loaded(dir.resolve("leads_o.orc").toString, "leads_o")))
    assert(spark.table("leads_o").count() == 2)
    // append from parquet with a type-drifted price (string) and an extra
    // column: SAFE_CAST → NULL, extra dropped — format-agnostic R2/R4
    landFile("parquet", "leads_o.parquet",
      Seq((3L, "Ann", "call me", true))
        .toDF("lead_id", "name", "price", "extra"))
    Ingest.runDropDir(spark, dir.toString, run, extensions = Set(".parquet"))
    val t = spark.table("leads_o")
    assert(t.count() == 3)
    assert(!t.columns.contains("extra"))
    assert(t.where(col("lead_id") === 3).head.getAs[Any]("price") == null)
  }

  test("default extension filter stays CSV-only (reference semantics)") {
    val dir = tmp()
    write(dir, "skipme.jsonl", """{"a": 1}""" + "\n")
    val out = Ingest.runDropDir(spark, dir.toString, run)
    assert(out.isEmpty)
    assert(Files.exists(dir.resolve("skipme.jsonl")))
  }

  test("opt-in schema evolution: new column ADDed, old rows read NULL; default still drops") {
    val dir = tmp()
    write(dir, "leads_evo.csv", batch1)
    Ingest.ingestFile(spark, dir.resolve("leads_evo.csv").toString, run)
    // default path (reference semantics): extra column dropped
    write(dir, "leads_evo2.csv",
      "lead_id,full_name,asking_price,motivated,agent\n2001,With Agent,1.0,true,Ava\n")
    Files.move(dir.resolve("leads_evo2.csv"), dir.resolve("leads_evo.csv"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Ingest.ingestFile(spark, dir.resolve("leads_evo.csv").toString, run)
    assert(!spark.table("leads_evo").columns.contains("agent"))
    // evolveSchema=true: the column is added; historical rows read NULL
    write(dir, "leads_evo.csv",
      "lead_id,full_name,asking_price,motivated,agent\n2002,Evolved,2.0,false,Bo\n")
    Ingest.ingestFile(spark, dir.resolve("leads_evo.csv").toString, run,
      evolveSchema = true)
    val t = spark.table("leads_evo")
    assert(t.columns.contains("agent"))
    assert(t.where("lead_id = 2002 AND agent = 'Bo'").count() == 1)
    assert(t.where("lead_id < 2002 AND agent IS NULL").count() == 3)
    // existing column types are never mutated by evolution
    assert(t.schema("asking_price").dataType.typeName == "double")
  }

  test("run report: loaded/failed/drift rows persisted with observed counters") {
    val dir = tmp()
    // success (create path), drift (append path with a bad value), failure
    write(dir, "rep_a.csv", batch1)
    Files.createDirectory(dir.resolve("rep_broken.csv")) // read fails
    val runId = "test_" + System.nanoTime()
    val r1 = Ingest.runDropDirReport(spark, dir.toString, run, runId)
    assert(r1.map(_.outcome).sorted == Seq("failed", "loaded"))
    val loaded = r1.find(_.outcome == "loaded").get
    assert(loaded.tableName.contains("rep_a") && loaded.rowsIn.contains(2L))
    assert(loaded.badCasts.isEmpty, "create path has no cast targets")
    val failed = r1.find(_.outcome == "failed").get
    assert(failed.error.nonEmpty && failed.rowsIn.isEmpty)
    // drift append: asking_price 'call me' → NULL, counted by the observer
    write(dir, "rep_a.csv",
      "lead_id,full_name,asking_price,motivated\n1007,Drifty,call me,true\n")
    val r2 = Ingest.runDropDirReport(spark, dir.toString, run, runId)
    val drift = r2.find(_.outcome == "loaded").get
    assert(drift.rowsIn.contains(1L))
    assert(drift.badCasts.get("asking_price").contains(1L),
      s"expected one observed cast loss: ${drift.badCasts}")
    assert(drift.badCasts.get("lead_id").contains(0L))
    // both runs persisted under the same run_id, queryable like any table
    // (rep_broken.csv is still in the dir, so it fails in BOTH runs: 4 rows)
    val persisted = spark.table("ingest_run_report")
      .where(s"run_id = '$runId'")
    assert(persisted.count() == 4)
    assert(persisted.where("outcome = 'failed'").count() == 2)
    assert(persisted
      .where("outcome = 'loaded' AND bad_casts['asking_price'] = 1").count() == 1)
  }

  test("schema evolution escapes backticks in untrusted headers (no DDL injection)") {
    val dir = tmp()
    write(dir, "leads_bt.csv", batch1)
    Ingest.ingestFile(spark, dir.resolve("leads_bt.csv").toString, run)
    // a header that would break out of the quoted identifier unescaped
    write(dir, "leads_bt.csv",
      "lead_id,full_name,asking_price,motivated,evil`price\n1008,BT,1.0,true,boom\n")
    Ingest.ingestFile(spark, dir.resolve("leads_bt.csv").toString, run,
      evolveSchema = true)
    val t = spark.table("leads_bt")
    assert(t.columns.contains("evil`price"), // the LITERAL column name, added safely
      s"evolved column should be the literal header text: ${t.columns.mkString(",")}")
    assert(t.columns.length == 6) // 4 original + Ingestion_date + 1 evolved
    assert(t.where("lead_id = 1008").select("`evil``price`").head.getString(0) == "boom")
  }

  test("streaming drop dir: exactly-once pickup via checkpoint, align on drift") {
    import org.apache.spark.sql.types._
    val dir = tmp()
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val schema = StructType(Seq(
      StructField("lead_id", LongType), StructField("full_name", StringType),
      StructField("asking_price", DoubleType), StructField("motivated", BooleanType)))
    val table = "leads_stream_" + System.nanoTime()
    write(dir, "s1.csv", batch1)
    def drain(): Unit = {
      val q = Ingest.streamDropDir(spark, dir.toString, schema, table, Some(run), ckpt)
      assert(q.awaitTermination(120000), "stream drain timed out")
      info("progress: " + q.recentProgress.map(p =>
        s"batch=${p.batchId} rows=${p.numInputRows}").mkString("; "))
    }
    drain()
    assert(spark.table(table).count() == 2)
    assert(spark.table(table).where(s"Ingestion_date = date'$run'").count() == 2)
    // restart with the SAME checkpoint: s1.csv must NOT re-ingest (the file
    // is still in the dir — no delete-on-success needed for exactly-once);
    // a new file is picked up and aligned to the table schema
    write(dir, "s2.csv",
      "lead_id,full_name,asking_price,motivated\n1009,Stream Two,5.0,false\n")
    drain()
    val t = spark.table(table)
    assert(t.count() == 3, "checkpoint must dedup already-ingested files")
    assert(t.where("lead_id = 1009").count() == 1)
    // batches land in their own _batch_id partitions (the replay-idempotence
    // layout writeBatchIdempotent provides)
    assert(t.select("_batch_id").distinct().count() == 2)
    // a file with a DRIFTED header must fail the stream loudly, not bind
    // values positionally into the wrong columns (enforceSchema=false)
    write(dir, "s3.csv", "lead_id,motivated\n1010,true\n")
    val bad = Ingest.streamDropDir(spark, dir.toString, schema, table, Some(run), ckpt)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      bad.awaitTermination(120000)
    }
    // the header check surfaces a few causes deep (FAILED_READ_FILE wraps it)
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ").toLowerCase
    assert(chain.contains("header") || chain.contains("s3.csv"),
      s"expected a header-validation failure on s3.csv, got: $chain")
    assert(spark.table(table).count() == 3, "failed batch must not write rows")
    spark.sql(s"DROP TABLE $table")
  }

  test("crash replay: same _batch_id applied twice → identical table state, original stamp kept") {
    // The effectively-once claim rests on writeBatchIdempotent's partition
    // overwrite PLUS a replay-stable stamp. Drive the foreachBatch body
    // directly with the same (batch, batchId) twice — the at-least-once
    // window foreachBatch leaves open (crash between the write and the
    // checkpoint commit).
    val table = "leads_replay_" + System.nanoTime()
    val s = spark
    import s.implicits._
    val batch = Seq((1001L, "Jane", 1.5), (1002L, "Bob", 2.5))
      .toDF("lead_id", "full_name", "asking_price")
    def state(): Seq[String] = spark.table(table).selectExpr(
      "lead_id", "full_name", "asking_price",
      "CAST(Ingestion_date AS STRING)", "_batch_id")
      .collect().map(_.toString).sorted.toSeq
    // original write stamped on an earlier date (as if the batch first ran
    // just before midnight)
    Ingest.ingestStreamBatch(batch, table, Some(Date.valueOf("2026-08-10")), batchId = 7L)
    val before = state()
    // replay with runDate=None "after midnight": the stamp must be REUSED
    // from the batch's own partition, never recomputed from wall clock
    Ingest.ingestStreamBatch(batch, table, None, batchId = 7L)
    assert(state() == before,
      "replay of the same _batch_id must rewrite byte-identical rows (incl. stamp)")
    assert(spark.table(table).where("_batch_id = 7").count() == 2)
    // a genuinely new batch id still gets a fresh (UTC) processing date
    Ingest.ingestStreamBatch(batch, table, None, batchId = 8L)
    val utcToday = java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString
    assert(spark.table(table)
      .where(s"_batch_id = 8 AND Ingestion_date = date'$utcToday'").count() == 2)
    spark.sql(s"DROP TABLE $table")
  }

  test("runDate=None stamp is the UTC date even under a non-UTC JVM default zone") {
    val table = "leads_utc_" + System.nanoTime()
    val tzBefore = java.util.TimeZone.getDefault
    try {
      // UTC+14: the JVM-local date runs up to a full day AHEAD of UTC, so a
      // wall-clock-zone stamp would disagree with current_date() (session
      // TZ pinned to UTC) for most of every day
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("Pacific/Kiritimati"))
      val s = spark
      import s.implicits._
      val batch = Seq((1L, "A")).toDF("lead_id", "full_name")
      val utcBefore = java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString
      Ingest.ingestStreamBatch(batch, table, None, batchId = 0L)
      val utcAfter = java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString
      // CAST(date AS STRING) is zone-free — reads back the stored day value
      val stamps = spark.table(table)
        .selectExpr("CAST(Ingestion_date AS STRING)")
        .collect().map(_.getString(0)).toSet
      assert(stamps.subsetOf(Set(utcBefore, utcAfter)),
        s"stamp $stamps is not the UTC date (JVM zone here is UTC+14; " +
          s"UTC day was $utcBefore..$utcAfter)")
    } finally {
      java.util.TimeZone.setDefault(tzBefore)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("dotted header ingests as a literal column, not struct-field access") {
    // col("price.usd") parses as struct access; the align kernel must
    // reference the LITERAL name (regression for the colExact fix)
    val dir = tmp()
    write(dir, "leads_dot.csv", "lead_id,price.usd\n1,9.5\n")
    Ingest.ingestFile(spark, dir.resolve("leads_dot.csv").toString, run)
    write(dir, "leads_dot.csv", "lead_id,price.usd\n2,8.5\n")
    Ingest.ingestFile(spark, dir.resolve("leads_dot.csv").toString, run)
    val t = spark.table("leads_dot")
    assert(t.columns.contains("price.usd"))
    assert(t.count() == 2)
    assert(t.where("lead_id = 2").select("`price.usd`").head.getDouble(0) == 8.5)
  }

  test("compaction: many small files rewritten to few, rows and values intact") {
    import graft.ingest.Compaction
    val dir = Files.createTempDirectory("graft-compact").toString
    val orders = Tables.orders(spark, TestSpark.sf0001)
    orders.repartition(64).write.mode("overwrite").parquet(dir)
    val before = orders.count()
    val (nBefore, nAfter) = Compaction.compactDir(spark, dir,
      targetFileBytes = 8L * 1024 * 1024)
    assert(nBefore == 64 && nAfter < 8,
      s"expected 64 small files to compact to a few, got $nBefore -> $nAfter")
    val back = spark.read.parquet(dir)
    assert(back.count() == before)
    // value-level integrity, not just row count
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    // no leftover tmp/backup dirs
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".compact-tmp")))
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".pre-compact")))
    // idempotence: a second run is a no-op once already compact
    val (b2, a2) = Compaction.compactDir(spark, dir, 8L * 1024 * 1024)
    assert(b2 == a2)
  }

  test("compaction preserves evolved-schema dirs: union of columns, not one footer") {
    import graft.ingest.Compaction
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-compact-evo").toString
    // pre-evolution files: (id) only; post-evolution: (id, agent)
    spark.range(0, 100).selectExpr("id")
      .repartition(4).write.mode("overwrite").parquet(dir)
    spark.range(100, 200).selectExpr("id", "CAST(id AS STRING) AS agent")
      .repartition(4).write.mode("append").parquet(dir)
    val (b, a) = Compaction.compactDir(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(a < b)
    val back = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(back.columns.toSet == Set("id", "agent"))
    assert(back.count() == 200)
    assert(back.where(col("agent").isNotNull).count() == 100,
      "post-evolution column values must survive compaction")
  }

  test("retention: partitions older than the horizon dropped, newer intact") {
    import graft.ingest.Retention
    val dir = tmp()
    // three ingestion days into one table
    for (day <- Seq("2026-08-01", "2026-08-05", "2026-08-12")) {
      write(dir, "leads_ret.csv", batch1)
      Ingest.ingestFile(spark, dir.resolve("leads_ret.csv").toString,
        Date.valueOf(day))
    }
    assert(spark.table("leads_ret").count() == 6)
    val dropped = Retention.dropExpiredPartitions(
      spark, "leads_ret", keepDays = 7, asOf = Date.valueOf("2026-08-12"))
    assert(dropped == Seq(Date.valueOf("2026-08-01")),
      s"only the 11-day-old partition expires: $dropped")
    val t = spark.table("leads_ret")
    assert(t.count() == 4)
    assert(t.where("Ingestion_date = date'2026-08-01'").count() == 0)
    assert(t.where("Ingestion_date = date'2026-08-05'").count() == 2)
    // idempotent: nothing more to drop
    assert(Retention.dropExpiredPartitions(spark, "leads_ret", 7,
      Date.valueOf("2026-08-12")).isEmpty)
    spark.sql("DROP TABLE leads_ret")
  }

  test("compactTable: partition-wise compaction of a managed partitioned table") {
    import graft.ingest.Compaction
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val tbl = "t_compact_" + System.nanoTime()
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .withColumn("pd", pmod(col("o_orderkey"), lit(3)).cast("int"))
    orders.repartition(16).write.partitionBy("pd").saveAsTable(tbl)
    val want = spark.table(tbl)
    val before = want.count()
    val results = Compaction.compactTable(spark, tbl, 8L * 1024 * 1024)
    assert(results.length == 3, s"one result per partition dir: $results")
    assert(results.forall { case (_, b, a) => a <= b })
    assert(results.exists { case (_, b, a) => a < b },
      s"16-way-written leaves should actually compact: $results")
    val after = spark.table(tbl)
    assert(after.count() == before)
    assert(after.exceptAll(orders).isEmpty && orders.exceptAll(after).isEmpty)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("backfillStamp: NULL stamps from an external writer get the asOf date " +
    "(partition-wise on the engine layout)") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val tbl = "t_backfill_" + System.nanoTime()
    // simulate an EXTERNAL writer into the engine's partitioned layout:
    // half the rows carry a stamp, half are NULL (reference
    // big_uery_handler.py:183-194 backfill semantic)
    spark.range(0, 100)
      .withColumn("Ingestion_date",
        when(col("id") % 2 === 0, lit(Date.valueOf("2026-08-01")))
          .otherwise(lit(null).cast("date")))
      .write.partitionBy("Ingestion_date").saveAsTable(tbl)
    assert(spark.table(tbl).where(col("Ingestion_date").isNull).count() == 50)
    val asOf = Date.valueOf("2026-08-12")
    val n = Ingest.backfillStamp(spark, tbl, asOf)
    assert(n == 50, s"expected 50 backfilled rows, got $n")
    val t = spark.table(tbl)
    assert(t.count() == 100, "backfill must not lose or duplicate rows")
    assert(t.where(col("Ingestion_date").isNull).count() == 0)
    assert(t.where(col("Ingestion_date") === lit(asOf)).count() == 50)
    // pre-existing stamps untouched
    assert(t.where(col("Ingestion_date") === lit(Date.valueOf("2026-08-01")))
      .count() == 50)
    // idempotent: nothing left to backfill
    assert(Ingest.backfillStamp(spark, tbl, asOf) == 0)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("backfillStamp: unpartitioned external table falls back to full " +
    "rewrite; missing column is ADDed first") {
    import org.apache.spark.sql.functions.col
    val tbl = "t_backfill_ext_" + System.nanoTime()
    // external layout: no Ingestion_date column at all, not partitioned
    spark.range(0, 40).selectExpr("id", "CAST(id AS STRING) AS payload")
      .write.saveAsTable(tbl)
    val asOf = Date.valueOf("2026-08-12")
    val n = Ingest.backfillStamp(spark, tbl, asOf)
    assert(n == 40, s"every row lacked a stamp, got $n")
    val t = spark.table(tbl)
    assert(t.count() == 40)
    assert(t.where(col("Ingestion_date").isNull).count() == 0)
    assert(t.where(s"Ingestion_date = date'$asOf'").count() == 40)
    // payload survives the staged rewrite
    assert(t.where("CAST(id AS STRING) = payload").count() == 40)
    assert(Ingest.backfillStamp(spark, tbl, asOf) == 0)
    spark.sql(s"DROP TABLE $tbl")
  }
}
