package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** SURVEY §5.5: streaming ST1-ST3 verified by batch equivalence — the
  * converged result of the stream (AvailableNow over a multi-file directory,
  * so watermarks and incremental state actually engage) must equal the batch
  * query over the same data.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Events from the corpus (ts normalized to NTZ micros), split into 4
    * files so the file source delivers multiple micro-batches.
    */
  lazy val eventDir: String = {
    val dir = Files.createTempDirectory("graft-events").toString
    Tables.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(dir)
    // FileStreamSource orders batches by modification time; parallel part
    // writes can tie or invert it. Pin mtimes to the part-name (= ts-range)
    // order so delivery is deterministic and event-time-ascending.
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.list(java.nio.file.Paths.get(dir))) { s =>
      s.iterator().asScala.toSeq
    }.filter(_.getFileName.toString.startsWith("part-"))
      .sortBy(_.getFileName.toString)
      .zipWithIndex.foreach { case (p, i) =>
        p.toFile.setLastModified(1700000000000L + i * 60000L)
      }
    dir
  }

  private def runComplete(q: DataFrame => DataFrame): Array[org.apache.spark.sql.Row] = {
    val name = "sink_" + System.nanoTime()
    val stream = q(EventStreams.readEventStream(spark, eventDir))
    val query = stream.writeStream
      .format("memory").queryName(name).outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark.table(name).collect()
  }

  test("ST1: streaming tumbling counts converge to the batch result") {
    val got = runComplete(EventStreams.tumblingCounts)
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    val want = EventStreams.tumblingCounts(
      spark.read.schema(EventStreams.eventSchema).parquet(eventDir))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("ST2: streaming sliding sum converges to the batch result") {
    val got = runComplete(EventStreams.slidingSum)
      .map(r => (r.get(0).toString, r.getDouble(1), r.getLong(2))).toSet
    val want = EventStreams.slidingSum(
      spark.read.schema(EventStreams.eventSchema).parquet(eventDir))
      .collect().map(r => (r.get(0).toString, r.getDouble(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("ST4: streaming session windows converge to the batch result") {
    // wide watermark: file listing order is not event-time order (see ST3)
    val got = runComplete(EventStreams.sessionCounts(_, delay = "10000 hours"))
      .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString, r.getLong(3))).toSet
    val want = EventStreams.sessionCounts(
      spark.read.schema(EventStreams.eventSchema).parquet(eventDir), delay = "10000 hours")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString, r.getLong(3))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("ST5: stream-stream interval join converges to the batch join") {
    val name = "sink_ssj_" + System.nanoTime()
    val stream = EventStreams.purchaseClickJoin(
      EventStreams.readEventStream(spark, eventDir), delay = "10000 hours")
    val query = stream.writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = EventStreams.purchaseClickJoin(
      spark.read.schema(EventStreams.eventSchema).parquet(eventDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("mapGroupsWithState running counts converge to batch per-user counts") {
    val name = "sink_state_" + System.nanoTime()
    val stream = EventStreams.runningUserCounts(
      spark, EventStreams.readEventStream(spark, eventDir))
    val query = stream.writeStream
      .format("memory").queryName(name).outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    // last emitted row per user = cumulative total
    val finalCounts = spark.table(name)
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("running_count").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = spark.read.schema(EventStreams.eventSchema).parquet(eventDir)
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalCounts == batch)
  }

  test("transformWithState running totals converge to batch per-user cent sums") {
    // transformWithState requires the RocksDB state store provider; scope
    // the conf to this query and restore after (other suites keep HDFS-
    // backed state).
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val name = "sink_tws_" + System.nanoTime()
      val stream = EventStreams.runningUserTotalsTws(
        spark, EventStreams.readEventStream(spark, eventDir))
      val query = stream.writeStream
        .format("memory").queryName(name).outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      // last emitted row per user = final running total; select it by the
      // monotonic n_events (max(total_cents) would break if the corpus ever
      // gained negative values — totals aren't monotonic, event counts are)
      val finalRows = spark.table(name)
        .groupBy("user_id")
        .agg(max_by(col("total_cents"), col("n_events")).as("cents"),
          max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val batch = spark.read.schema(EventStreams.eventSchema).parquet(eventDir)
        .groupBy("user_id")
        .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"),
          count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(finalRows == batch)
      assert(finalRows.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("flatMapGroupsWithState timeout sessions: closed sessions match batch sessions") {
    val name = "sink_fmgs_" + System.nanoTime()
    val stream = EventStreams.timeoutSessions(
      spark, EventStreams.readEventStream(spark, eventDir))
    val query = stream.writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.nonEmpty, "no sessions closed — watermark never advanced past a timeout")
    // every closed session must match a batch session_window session on
    // (user, start±1s truncation, n_events); closed ⊆ batch (tail sessions
    // stay open past the final watermark and never emit)
    val want = EventStreams.sessionCounts(
      spark.read.schema(EventStreams.eventSchema).parquet(eventDir),
      delay = "10 minutes")
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.sql.Timestamp]("session_start").getTime, r.getLong(3)))
    got.foreach { case (user, startMs, n) =>
      assert(want.exists { case (u, s, m) =>
        u == user && math.abs(s - startMs) <= 1000 && m == n
      }, s"closed session (user=$user, start=$startMs, n=$n) has no batch match")
    }
    // per-user closed sessions are disjoint in time
    got.groupBy(_._1).values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.map(_._2).distinct.length == sorted.length)
    }
  }

  test("foreachBatch idempotent sink: replayed batch does not duplicate rows") {
    val table = "t_idem_" + System.nanoTime()
    val batch = Tables.events(spark, TestSpark.sf0001)
      .select("event_id", "user_id", "event_type")
    EventStreams.writeBatchIdempotent(batch.limit(100), table, batchId = 0L)
    EventStreams.writeBatchIdempotent(batch.limit(100), table, batchId = 0L) // replay
    assert(spark.table(table).count() == 100)
    EventStreams.writeBatchIdempotent(batch.limit(40), table, batchId = 1L)
    assert(spark.table(table).count() == 140)
    // replay of an *older* batch also converges (rewrites its own partition)
    EventStreams.writeBatchIdempotent(batch.limit(100), table, batchId = 0L)
    assert(spark.table(table).count() == 140)
    spark.sql(s"DROP TABLE $table")
  }

  test("appendToTable streams a directory into a batch-id-partitioned table") {
    val table = "t_stream_" + System.nanoTime()
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = EventStreams.appendToTable(
      EventStreams.readEventStream(spark, eventDir)
        .select("event_id", "user_id", "event_type"),
      table, ckpt)
    q.awaitTermination(60000)
    val total = spark.read.schema(EventStreams.eventSchema).parquet(eventDir).count()
    assert(spark.table(table).count() == total)
    assert(spark.table(table).select("_batch_id").distinct().count() >= 2)
    spark.sql(s"DROP TABLE $table")
  }

  test("ST3: streaming dedup emits each event_id once") {
    val name = "sink_dedup_" + System.nanoTime()
    // delay spans the whole corpus: file listing order is not event-time
    // order, so a short watermark would drop whole out-of-order files as late
    val stream = EventStreams.dedupEvents(
      EventStreams.readEventStream(spark, eventDir), delay = "10000 hours")
    val query = stream.writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val ids = spark.table(name).select("event_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length)
    val batchIds = spark.read.schema(EventStreams.eventSchema).parquet(eventDir)
      .select("event_id").distinct().count()
    assert(ids.length == batchIds)
  }

  test("stream-static enrichment join converges to the batch join") {
    val dim = Tables.customer(spark, TestSpark.sf0001)
      .select("c_custkey", "c_mktsegment")
    val got = runComplete(ev =>
      EventStreams.enrichWithDim(
        ev.select("event_id", "user_id"), dim)
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n")))
      .map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    val want = spark.read.schema(EventStreams.eventSchema).parquet(eventDir)
      .select("event_id", "user_id")
      .join(dim, col("user_id") === col("c_custkey"), "left")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    assert(got == want)
  }

  /** Expected state of the merge table: per user, the event with the
    * greatest (ts, event_id).
    */
  private def latestPerUser(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  test("mergeBatchUpsert: conditional latest-wins, replay- and order-safe") {
    val table = "t_merge_" + System.nanoTime()
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select("user_id", "ts", "event_id", "event_type", "value")
    val older = ev.where(col("event_id") % 2 === 0)
    val newer = ev.where(col("event_id") % 2 === 1)
    def merge(b: DataFrame) =
      EventStreams.mergeBatchUpsert(b, table, "user_id", "ts", "event_id", 8)
    // apply in an order that is NOT event-time order, then replay
    merge(newer); merge(older); merge(newer)
    val got = spark.table(table).drop("_bucket")
    val want = latestPerUser(ev)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "merge table must equal global latest-wins regardless of batch order")
    // only the touched buckets' partitions exist, each key in exactly one
    assert(spark.table(table)
      .groupBy("user_id").count().where(col("count") > 1).isEmpty)
    // a batch with PERMUTED column order must not bind positionally
    val permuted = newer.select("value", "event_id", "ts", "event_type", "user_id")
    EventStreams.mergeBatchUpsert(permuted, table, "user_id", "ts", "event_id", 8)
    val got2 = spark.table(table).drop("_bucket")
    assert(got2.exceptAll(want).isEmpty && want.exceptAll(got2).isEmpty,
      "permuted-column replay must be a no-op, not a column swap")
    spark.sql(s"DROP TABLE $table")
  }

  test("mergeBatchUpsert: one write pass regardless of bucket fan-out; type drift rejected") {
    val table = "t_merge_jobs_" + System.nanoTime()
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select("user_id", "ts", "event_id", "event_type", "value")
    def merge(b: DataFrame) =
      EventStreams.mergeBatchUpsert(b, table, "user_id", "ts", "event_id", 8)
    merge(ev) // seed the table (warms schema/listing jobs too)
    // a batch touching ONE bucket vs a batch touching ALL 8: the merge must
    // cost the same number of jobs — the pre-r5 per-bucket INSERT loop added
    // one sequential write job per affected bucket
    val oneBucket = ev.where(pmod(hash(col("user_id")), lit(8)) === 0)
    val costOne = TestSpark.countJobs("merge-one") { merge(oneBucket) }
    val costAll = TestSpark.countJobs("merge-all") { merge(ev) }
    assert(costAll == costOne,
      s"merge cost must not scale with affected buckets: 1-bucket=$costOne, 8-bucket=$costAll")
    // matching names with drifted types must be rejected, not NULL-cast
    val drifted = ev.withColumn("value", col("value").cast("float"))
    val e = intercept[IllegalArgumentException] { merge(drifted) }
    assert(e.getMessage.contains("value"))
    spark.sql(s"DROP TABLE $table")
  }

  test("streaming materialized view: update-mode agg + merge sink == batch totals") {
    // the serving-table pattern: per-user running (count, cent-total)
    // aggregates in update mode, each micro-batch upserted by version —
    // the converged table must equal the one-shot batch aggregate
    val table = "t_matview_" + System.nanoTime()
    val ckpt = Files.createTempDirectory("graft-mv-ckpt").toString
    val agg = EventStreams.readEventStream(spark, eventDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum((col("value") * 100).cast("long")).as("cents"),
        max(col("event_id")).as("version"))
    val q = agg.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // version = max event_id seen per user: monotone per key, so
        // latest-wins by (version, batch) applies newer snapshots only
        EventStreams.mergeBatchUpsert(
          b.toDF().withColumn("_b", lit(id)), table,
          "user_id", "version", "_b", nBuckets = 8)
      }
      .start()
    try {
      // a false return means timeout with the stream STILL RUNNING — assert
      // loudly instead of comparing against a half-converged table
      assert(q.awaitTermination(120000), "materialized-view stream timed out")
      val want = spark.read.schema(EventStreams.eventSchema).parquet(eventDir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum((col("value") * 100).cast("long")).as("cents"))
      val got = spark.table(table).select("user_id", "n_events", "cents")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "converged merge table must equal the batch aggregate")
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("property: any batch split and application order converges to latest-wins") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // random (key, ts-offset, seq, value) rows with deliberate key and
    // timestamp collisions (small domains), random 3-way batch split,
    // random application order — the merge must always equal latest-wins
    val rowGen = for {
      key <- Gen.choose(0L, 5L)
      tsOff <- Gen.choose(0L, 3L) // collides often → tiebreak exercised
      value <- Gen.choose(-1000, 1000).map(_ / 100.0)
    } yield (key, tsOff, 0L, value)
    val caseGen = for {
      rows <- Gen.listOfN(40, rowGen)
      assignment <- Gen.listOfN(40, Gen.choose(0, 2))
      order <- Gen.oneOf(Seq(0, 1, 2), Seq(2, 1, 0), Seq(1, 2, 0), Seq(2, 0, 1))
    } yield (rows, assignment, order)
    (0 until 4).foreach { i =>
      val (rows0, assignment, order) =
        caseGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      // seq = row index: unique per row, so (ts, seq) is a total order and
      // latest-wins has exactly one right answer per key
      val rows = rows0.zipWithIndex.map { case ((k, t, _, v), idx) =>
        (k, t, idx.toLong, v)
      }
      val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
      val df = rows.map { case (k, t, q, v) =>
        (k, new java.sql.Timestamp(base + t * 60000L), q, v)
      }.toDF("user_id", "ts", "event_id", "value")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
      val table = s"t_merge_prop_${i}_" + System.nanoTime()
      val batches = assignment.zip(rows).groupBy(_._1)
        .view.mapValues(_.map(_._2)).toMap
      order.foreach { b =>
        val rs = batches.getOrElse(b, Nil)
        if (rs.nonEmpty) {
          val bdf = rs.map { case (k, t, q, v) =>
            (k, new java.sql.Timestamp(base + t * 60000L), q, v)
          }.toDF("user_id", "ts", "event_id", "value")
            .withColumn("ts", col("ts").cast("timestamp_ntz"))
          EventStreams.mergeBatchUpsert(bdf, table, "user_id", "ts", "event_id", 4)
        }
      }
      val got = spark.table(table).drop("_bucket")
      val want = latestPerUser(df)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"case $i: merge diverged from latest-wins (order=$order)")
      spark.sql(s"DROP TABLE $table")
    }
  }

  test("mergeToTable: streamed micro-batches converge to global latest-wins") {
    val table = "t_merge_stream_" + System.nanoTime()
    val ckpt = Files.createTempDirectory("graft-merge-ckpt").toString
    val q = EventStreams.mergeToTable(
      EventStreams.readEventStream(spark, eventDir)
        .select("user_id", "ts", "event_id", "event_type", "value"),
      table, "user_id", "ts", "event_id", ckpt, nBuckets = 8)
    q.awaitTermination(120000)
    val ev = spark.read.schema(EventStreams.eventSchema).parquet(eventDir)
      .select("user_id", "ts", "event_id", "event_type", "value")
    val got = spark.table(table).drop("_bucket")
    val want = latestPerUser(ev)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    spark.sql(s"DROP TABLE $table")
  }
}
