package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming implementations of the ST group (SURVEY §2.11
  * ST1-ST3) over the `events` schema. Batch-equivalent forms (what the
  * DuckDB oracle checks) are in `queries.StreamEquivQueries`; the
  * StreamingSpec suite drives these with a file source and asserts the
  * converged streaming result equals the batch result.
  *
  * State-size doctrine for 100 TB streams: every stateful op here is keyed
  * by (window, key) and bounded by the watermark horizon — state never grows
  * with stream length. Late data beyond the watermark is dropped (counted by
  * the `numRowsDroppedByWatermark` metric), the semantics the reference's
  * batch re-runs approximate with its one-day window.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of parquet events (the streaming
    * analogue of the reference's drop-directory scan, SURVEY §2.1 S2).
    */
  def readEventStream(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Event-time watermarks require TimestampType (an instant); the corpus is
    * NTZ. With the session TZ pinned to UTC the cast is wall-clock-identical,
    * so streaming and batch results line up exactly.
    */
  private def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("ts", col("ts").cast(TimestampType))

  /** ST1: tumbling 1-hour counts by event_type, 10-minute watermark. */
  def tumblingCounts(events0: DataFrame): DataFrame = {
    val events = withEventTime(events0)
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))
  }

  /** ST2: sliding (1 hour, 15 min) sum(value); DECIMAL-summed for exactness. */
  def slidingSum(events0: DataFrame): DataFrame = {
    val events = withEventTime(events0)
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(round(sum(col("value").cast(DecimalType(38, 6))).cast(DoubleType), 4)
        .as("sum_value"),
        count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("sum_value"), col("cnt"))
  }

  /** ST4: streaming sessionization — session_window with a 30-min gap per
    * user. State per (user, open session), closed and emitted once the
    * watermark passes the session end.
    */
  def sessionCounts(events0: DataFrame, delay: String = "10 minutes"): DataFrame = {
    val events = withEventTime(events0)
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }

  /** ST5: stream-stream interval join — each purchase joined to the same
    * user's clicks in the preceding hour. Both sides are watermarked, so
    * join state is evicted once the interval condition can no longer match:
    * bounded state, the canonical streaming-join shape. `delay` widens the
    * watermark for tests (file sources deliver out of event-time order).
    */
  def purchaseClickJoin(events0: DataFrame, delay: String = "10 minutes"): DataFrame = {
    val events = withEventTime(events0)
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", delay)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", delay)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
  }

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * counts across micro-batches (the KeyValueGroupedDataset escape hatch
    * for state machines session_window can't express). Update-mode output:
    * one row per user per batch with the cumulative count.
    */
  def runningUserCounts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.selectExpr("user_id", "event_id").as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (user, total)
      }
      .toDF("user_id", "running_count")
  }

  final case class SessionAgg(user_id: Long, session_start: Long,
                              session_end: Long, n_events: Long)

  /** Timeout-driven sessionization via flatMapGroupsWithState — the full
    * custom-state escape hatch (mapGroupsWithState's 1-row-per-group shape
    * can't emit "zero rows until the session closes"). State per user is one
    * open session (start, last-seen, count); an event-time timeout at
    * last-seen + gap closes it and emits exactly one row. This is how state
    * machines beyond session_window (e.g. emit-on-close with custom
    * payload) are built; state is bounded by (users × one open session).
    */
  def timeoutSessions(spark: SparkSession, events0: DataFrame,
                      gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val events = withEventTime(events0)
    val gapMs = gapMinutes * 60L * 1000L
    // The watermark-annotated timestamp column must survive into the
    // stateful operator's input (EventTimeTimeout is rejected otherwise) —
    // so ts rides through the typed row and converts to ms in the lambda.
    events
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), SessionAgg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (start, last, n) = state.get
            state.remove()
            Iterator.single(SessionAgg(user, start, last, n))
          } else {
            val ts = rows.map(_._2.getTime).toArray.sorted
            val closed = Iterator.newBuilder[SessionAgg]
            var cur = state.getOption.getOrElse((ts.head, ts.head, 0L))
            ts.foreach { t =>
              cur = if (t - cur._2 >= gapMs) {
                closed += SessionAgg(user, cur._1, cur._2, cur._3)
                (t, t, 1L)
              } else {
                // late-but-in-gap events (above the watermark, behind the
                // stored last-seen) fold INTO the session: start may move
                // down, last-seen must never move backward or the next
                // gap test and the timeout both misfire early
                (math.min(cur._1, t), math.max(cur._2, t), cur._3 + 1L)
              }
            }
            // A file source delivers by modification time, not event time, so
            // a whole batch can arrive behind the watermark. A timeout in the
            // past is rejected by the state store — if the watermark already
            // passed this session's close point, emit it now instead.
            val wm = state.getCurrentWatermarkMs()
            if (cur._2 + gapMs <= wm) {
              closed += SessionAgg(user, cur._1, cur._2, cur._3)
              state.remove()
            } else {
              state.update(cur)
              state.setTimeoutTimestamp(cur._2 + gapMs)
            }
            closed.result()
          }
      }
      .toDF()
  }

  /** Effectively-once streaming table sink via foreachBatch: each
    * micro-batch OVERWRITES exactly its own `_batch_id=<id>` partition of
    * the target table (static-partition INSERT OVERWRITE, see
    * writeBatchIdempotent). foreachBatch is at-least-once (the last batch can
    * replay after a restart), but a replay rewrites the same partition with
    * the same rows, so the table converges — idempotence from the layout,
    * not from in-memory bookkeeping that a driver restart would lose. This
    * is the production "stream into a warehouse table" pattern when the sink
    * has no transactional MERGE.
    */
  def appendToTable(df: DataFrame, table: String, checkpointDir: String,
                    trigger: org.apache.spark.sql.streaming.Trigger =
                      org.apache.spark.sql.streaming.Trigger.AvailableNow()) =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        writeBatchIdempotent(batch.toDF(), table, batchId)
      }
      .start()

  /** One micro-batch commit: overwrite exactly the `_batch_id=<id>`
    * partition. First batch creates the partitioned table; subsequent ones
    * static-partition-overwrite their own partition (saveAsTable with
    * Overwrite would drop the whole table instead).
    */
  def writeBatchIdempotent(batch: DataFrame, table: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (!spark.catalog.tableExists(table)) {
      batch.withColumn("_batch_id", lit(batchId))
        .write.partitionBy("_batch_id").saveAsTable(table)
    } else {
      // STATIC partition overwrite of exactly `_batch_id=<id>`: the batch id
      // is a literal, so SQL's PARTITION (_batch_id = <id>) clause names the
      // one partition a replay must rewrite. Unlike toggling
      // spark.sql.sources.partitionOverwriteMode on the shared session conf
      // (observable — or revertible mid-write — by concurrent queries), or a
      // writer option (ignored by insertInto), a static spec truncates only
      // the named partition under EITHER overwrite mode.
      val cols = spark.table(table).columns.filterNot(_ == "_batch_id")
      val view = s"graft_batch_${batchId}_${System.nanoTime()}"
      batch.select(cols.map(col): _*).createOrReplaceTempView(view)
      try spark.sql(
        s"INSERT OVERWRITE TABLE $table PARTITION (_batch_id = $batchId) " +
          s"SELECT * FROM $view")
      finally spark.catalog.dropTempView(view)
    }
  }

  /** ST3: streaming dedup on event_id within the watermark horizon. The
    * delay is the dedup window AND the late-data cutoff: rows older than the
    * watermark are dropped entirely (file sources deliver files in listing
    * order, not event-time order, so tests use a horizon covering the span).
    */
  def dedupEvents(events0: DataFrame, delay: String = "10 minutes"): DataFrame = {
    val events = withEventTime(events0)
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("ts"), col("event_type"))
  }

  /** Spark 4's arbitrary-state API (`transformWithState`): running per-user
    * totals via a `StatefulProcessor` with a typed `ValueState` variable —
    * the v2 replacement for mapGroupsWithState's single state blob (named
    * state variables, timers, TTL, and schema evolution come with it).
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`), which is also the
    * right provider at scale: state lives off-heap/on-disk per partition
    * instead of in executor heap.
    *
    * Values are accumulated as integer cents, so the running total is exact
    * and independent of row-arrival order — the same discipline as the
    * DECIMAL sums in the batch queries.
    */
  def runningUserTotalsTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

    class TotalsProcessor
        extends StatefulProcessor[Long, (Long, Double), (Long, Long, Long)] {
      @transient private var totals: ValueState[(Long, Long)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        totals = getHandle.getValueState[(Long, Long)](
          "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)
      override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
                                   tv: TimerValues): Iterator[(Long, Long, Long)] = {
        var (cents, n) = if (totals.exists()) totals.get() else (0L, 0L)
        rows.foreach { case (_, v) => cents += math.round(v * 100); n += 1 }
        totals.update((cents, n))
        Iterator.single((user, cents, n))
      }
    }

    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new TotalsProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "total_cents", "n_events")
  }

  /** Stream-static enrichment join: each micro-batch of events joined to a
    * static dimension (the customer table standing in for a user dim).
    * No hint on purpose: the static side is planned per micro-batch, so
    * under spark.sql.autoBroadcastJoinThreshold it broadcasts (the stream
    * never shuffles), and a dim too big to broadcast degrades to a
    * shuffle per batch instead of a forced-broadcast driver OOM — at that
    * point you pre-bucket the dim on the key. No watermark needed: the
    * static side never changes mid-query, so there is no join state to
    * bound.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    eventKey: String = "user_id",
                    dimKey: String = "c_custkey"): DataFrame =
    events.join(dim, col(eventKey) === col(dimKey), "left")

  /** Streaming CDC apply: foreachBatch upsert of each micro-batch into a
    * key-bucketed table with latest-wins semantics (MERGE INTO on plain
    * parquet tables — the streaming form of r10_merge_upsert).
    *
    * Layout: the target is partitioned by `_bucket = pmod(hash(key),
    * nBuckets)`, so a micro-batch touches only the bucket partitions its
    * keys hash into — the rewrite is proportional to the batch's key
    * spread, never to table size. Per batch:
    *   1. read ONLY the affected bucket partitions (partition-pruned scan)
    *      and union the batch rows;
    *   2. keep the greatest-(ts, seq) row per key — a deterministic total
    *      order, so stored rows newer than the batch survive and replays
    *      pick the same winner;
    *   3. localCheckpoint the merged rows (severs the self-read so the
    *      overwrite below doesn't read the files it is replacing), then
    *      static-partition INSERT OVERWRITE each affected bucket.
    * At-least-once foreachBatch replays re-merge the same rows into the
    * same buckets — idempotent by construction, like writeBatchIdempotent.
    */
  def mergeToTable(updates: DataFrame, table: String, keyCol: String,
                   tsCol: String, seqCol: String, checkpointDir: String,
                   nBuckets: Int = 16,
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.AvailableNow()) =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        mergeBatchUpsert(batch.toDF(), table, keyCol, tsCol, seqCol, nBuckets)
      }
      .start()

  /** One micro-batch upsert commit (see mergeToTable). Also usable as the
    * batch-mode MERGE. Conditional upsert, not last-writer-wins: a stored
    * row survives if its (ts, seq) beats every incoming row for the key —
    * so late/replayed/out-of-order batches can never regress a key to an
    * older value (the WHEN MATCHED AND source.ts > target.ts form of
    * MERGE), and applying the same batch twice is a no-op.
    */
  /** Table property pinning a merge table's bucket count (see the layout
    * guard inside [[mergeBatchUpsert]]).
    */
  val BucketsProp = "graft.merge.nbuckets"

  /** Per-JVM cache of VALIDATED bucket pins (table name → nBuckets), so a
    * long-running stream pays the SHOW TBLPROPERTIES catalog round-trip
    * once per table, not once per micro-batch (r16 ADVICE). Consulted only
    * on exact match — a cached value that differs from the caller's count
    * falls through to the full catalog check, so the cache can never mint
    * a failure the catalog wouldn't. The one hazard it admits: an EXTERNAL
    * actor dropping and re-bucketing the table mid-stream behind an equal
    * cached value — already outside the merge contract (the stream's
    * checkpoint and partition layout assumptions break with it).
    */
  private val validatedPins =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  def mergeBatchUpsert(batch0: DataFrame, table: String, keyCol: String,
                       tsCol: String, seqCol: String, nBuckets: Int): Unit = {
    val spark = batch0.sparkSession
    def unpersistCk(df: DataFrame): Unit = graft.util.Checkpoints.unpersist(df)
    // winner per key = max (ts, seq) — a deterministic total order, so
    // replays and speculative retries resolve ties identically
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(seqCol).desc)
    def latestWins(df: DataFrame): DataFrame = df
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
    // checkpoint once: the batch otherwise re-evaluates for the emptiness
    // probe, the affected-bucket collect, AND the union below
    val batch = batch0
      .withColumn("_bucket", pmod(hash(col(keyCol)), lit(nBuckets)))
      .localCheckpoint(true)
    try {
      if (batch.isEmpty) return
      if (!spark.catalog.tableExists(table)) {
        latestWins(batch).write.partitionBy("_bucket").saveAsTable(table)
        spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
          s"('$BucketsProp' = '$nBuckets')")
        validatedPins.put(table, nBuckets)
        if (crashAfterCommit) throw new IllegalStateException(
          "mergeBatchUpsert: injected crash after create commit " +
            "(SinkFuzzSpec crash-point tier)")
        return
      }
      // Bucket-count pin (found by SinkFuzzSpec r16, drawn-restart tier):
      // `_bucket = pmod(hash(key), nBuckets)` is part of the TABLE LAYOUT —
      // a later merge with a different nBuckets computes different buckets
      // for the same keys, its partition-pruned read misses the stored
      // rows, and the table silently ends up with the same key in two
      // partitions (duplicate keys, broken pruning). The count is pinned
      // as a table property at create time and every merge must match.
      // The per-JVM cache short-circuits the catalog round-trip when this
      // exact (table, nBuckets) pair already validated (r16 ADVICE —
      // once per stream, not once per micro-batch).
      if (!validatedPins.get(table).contains(nBuckets)) {
        val storedBuckets = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
          .collectFirst { case r if r.getString(0) == BucketsProp => r.getString(1) }
        storedBuckets match {
          case Some(b) =>
            // guard the parse: a corrupted property value should explain
            // itself, not surface as a bare NumberFormatException
            val stored = scala.util.Try(b.trim.toInt).getOrElse(
              throw new IllegalStateException(
                s"mergeBatchUpsert: table property $BucketsProp on $table " +
                  s"holds '$b', which is not an int — the bucket-count pin " +
                  "is corrupted; restore it with ALTER TABLE ... SET " +
                  s"TBLPROPERTIES ('$BucketsProp' = '<count>') to match the " +
                  "layout the table was written with"))
            require(stored == nBuckets,
              s"mergeBatchUpsert: $table is bucketed with nBuckets=$stored " +
                s"but this merge drew nBuckets=$nBuckets — the bucket count " +
                "is part of the table layout; a mismatch would silently " +
                "split keys across partitions. Re-create the table to " +
                "re-bucket.")
          case None =>
            // Legacy (pre-pin) table: the caller's count is only safe to
            // ADOPT if it reproduces the stored layout — adopting blind
            // would key-split on this very merge and then pin the WRONG
            // count (r16 ADVICE, medium). Recompute the bucket for every
            // stored row and fail loudly on any mismatch: one full scan,
            // paid once — the pin written below makes every later merge a
            // property check (and in the steady state a cache hit).
            val misplaced = spark.table(table)
              .where(pmod(hash(col(keyCol)), lit(nBuckets)) =!= col("_bucket"))
            require(misplaced.isEmpty,
              s"mergeBatchUpsert: $table has no $BucketsProp pin and its " +
                s"stored _bucket layout does not match nBuckets=$nBuckets " +
                "— adopting this count would split keys across partitions. " +
                "Pass the count the table was written with (then the pin " +
                "records it), or re-create the table to re-bucket.")
            spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
              s"('$BucketsProp' = '$nBuckets')")
        }
        validatedPins.put(table, nBuckets)
      }
      // insertInto below binds by POSITION — select in the TABLE's column
      // order, never the batch's (a reordered batch would silently swap
      // same-typed columns), and require matching TYPES too: matching names
      // over different types would silently NULL-cast under ansi=false.
      val tableFields = spark.table(table).schema.fields.filterNot(_.name == "_bucket")
      val tableCols = tableFields.map(_.name)
      require(batch0.columns.map(_.toLowerCase).toSet ==
        tableCols.map(_.toLowerCase).toSet,
        s"mergeBatchUpsert: batch columns ${batch0.columns.mkString(",")} " +
          s"must match table columns ${tableCols.mkString(",")}")
      val batchTypes = batch0.schema.fields
        .map(f => f.name.toLowerCase -> f.dataType).toMap
      tableFields.foreach { f =>
        val bt = batchTypes(f.name.toLowerCase)
        // catalogString ignores nested nullability flags (containsNull /
        // valueContainsNull / field nullable) — strict DataType equality
        // would spuriously reject a batch whose array<string> merely has a
        // narrower containsNull than the parquet-read table schema
        require(bt.catalogString == f.dataType.catalogString,
          s"mergeBatchUpsert: column ${f.name} is ${bt.catalogString} in the " +
            s"batch but ${f.dataType.catalogString} in $table — positional " +
            "INSERT would silently cast; align the batch schema explicitly")
      }
      val affected = batch.select("_bucket").distinct()
        .collect().map(_.getInt(0)).sorted // ≤ nBuckets rows — driver-safe
      val target = spark.table(table)
        .where(col("_bucket").isin(affected.map(Integer.valueOf): _*))
      val merged = latestWins(target.unionByName(batch))
        .localCheckpoint(true) // sever the self-read before overwriting
      // ONE dynamic-overwrite INSERT for all affected buckets, executed on
      // a CLONED session (newSession: shared context + catalog, private
      // conf) so the dynamic partitionOverwriteMode toggle cannot leak to
      // concurrent writers on the main session — the hazard
      // writeBatchIdempotent documents. (The per-write DataFrameWriter
      // option is NOT honored by insertInto — verified empirically: static
      // overwrite wipes untouched partitions — hence the session clone.)
      // Dynamic mode replaces exactly the partitions present in `merged`,
      // which are exactly the affected buckets, in one write job instead of
      // O(|affected|) sequential INSERTs: at many-bucket scale the
      // scheduler sees a single write stage, not a serial loop. The
      // checkpointed plan is a LogicalRDD, so re-binding it to the clone is
      // a plan wrapper, not a data copy.
      val clone = spark.newSession()
      clone.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        org.apache.spark.sql.GraftBridge
          .dataset(clone, merged.queryExecution.analyzed)
          .select(tableCols.map(col).toSeq :+ col("_bucket"): _*)
          .write.mode("overwrite")
          .insertInto(table)
        if (crashAfterCommit) throw new IllegalStateException(
          "mergeBatchUpsert: injected crash after overwrite commit " +
            "(SinkFuzzSpec crash-point tier)")
      } finally {
        // The INSERT refreshed the CLONE's relation/file-index caches;
        // refresh the caller's session too or its next read lists the
        // replaced files and fails. In a FINALLY, not the happy path
        // (r16 verdict #6): a failure between the commit and the refresh
        // — an injected crash, an OOM the caller catches — would
        // otherwise leave THIS session's cache pointing at deleted files
        // while the table on disk is already the merged state. Refresh is
        // pure cache invalidation, safe to run whether or not the commit
        // happened. (A process-level crash needs no refresh: a fresh
        // session starts with a cold cache.)
        try spark.catalog.refreshTable(table) finally unpersistCk(merged)
      }
    } finally unpersistCk(batch)
  }

  /** TEST-ONLY crash injection (the SinkFuzzSpec crash-point tier): when
    * true, [[mergeBatchUpsert]] throws immediately after its overwrite
    * COMMITS and before control returns — the window where a real crash
    * leaves the table merged on disk but the caller un-notified. The
    * finally above still refreshes, so the property the tier pins is:
    * a caught crash-after-commit leaves the table readable and converged
    * in the same session, and replaying the same batch is a no-op.
    */
  private[graft] var crashAfterCommit: Boolean = false
}
