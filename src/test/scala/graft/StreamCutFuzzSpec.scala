package graft

import java.time.LocalDateTime

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Corpus event row for the MemoryStream encoder (file scope for encoder
  * derivation). LocalDateTime ⇒ TIMESTAMP_NTZ, matching
  * [[EventStreams.eventSchema]].
  */
case class CutFuzzEvent(event_id: Long, ts: LocalDateTime, user_id: Long,
                        event_type: String, value: Double, props: String)

/** Streaming cut-permutation fuzz (round-11 verdict item #7): the streaming
  * tier's convergence claim — "the converged stream result equals the batch
  * query over the same data" — was previously evidenced by ONE fixed 4-file
  * event-time-ascending split per query (StreamingSpec). This suite permutes
  * the micro-batch boundaries: per seed, the corpus events are SHUFFLED into
  * a random delivery order and split at 1-5 random cut points, each chunk
  * delivered as its own micro-batch through a MemoryStream (addData +
  * processAllAvailable = one batch per chunk, with exact boundary control a
  * file source cannot give). 50 seeded permutations per streaming query
  * (st1 tumbling counts, st2 sliding sum, st3 dedup, st4 session windows,
  * st5 stream-stream interval join) must all converge to the one batch
  * answer — state merge across every boundary placement, late arrivals in
  * every order.
  *
  * Watermark discipline mirrors StreamingSpec: st1/st2 run in complete mode
  * (where the watermark neither drops nor evicts, so convergence is exact
  * under ANY order); st3/st4/st5 take the wide-delay parameter their
  * append/complete forms need for out-of-event-time-order delivery — the
  * production 10-minute default is exercised by StreamingSpec's ascending
  * delivery, while THIS suite's subject is boundary placement.
  *
  * The CDC sink gets the same treatment: 50 seeded random splits + orders
  * of a collision-heavy synthetic update set through mergeBatchUpsert must
  * each converge to global latest-wins (extends StreamingSpec's 4-case
  * scalacheck property to fuzz scale).
  */
class StreamCutFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val nSeeds = 50

  /** The corpus events once, as encoder-typed rows. */
  lazy val allEvents: Vector[CutFuzzEvent] = {
    import spark.implicits._
    Tables.events(spark, TestSpark.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[CutFuzzEvent].collect().toVector.sortBy(_.event_id)
  }

  /** Per-seed cut permutation: shuffled delivery order, 2-6 chunks split at
    * distinct random positions.
    */
  private def cutChunks(seed: Int): Seq[Seq[CutFuzzEvent]] = {
    val rnd = new Random(seed)
    val order = rnd.shuffle(allEvents)
    val k = 2 + rnd.nextInt(5)
    val points = Seq.fill(k - 1)(1 + rnd.nextInt(order.length - 1))
      .distinct.sorted
    val bounds = (0 +: points) :+ order.length
    bounds.sliding(2).map { case Seq(a, b) => order.slice(a, b) }.toSeq
  }

  /** Run `q` over the chunks as one-micro-batch-per-chunk, return the
    * converged sink rows canonicalized.
    */
  private def streamed(chunks: Seq[Seq[CutFuzzEvent]],
                       q: DataFrame => DataFrame, mode: String): Seq[String] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[CutFuzzEvent]
    val name = "cutfz_" + System.nanoTime()
    val query = q(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try {
      chunks.foreach { c =>
        mem.addData(c)
        query.processAllAvailable()
      }
    } finally query.stop()
    val rows = spark.table(name).collect().map(_.toString).sorted.toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  private def batchDf: DataFrame = {
    import spark.implicits._
    allEvents.toDF()
  }

  private def checkQuery(label: String, q: DataFrame => DataFrame,
                         mode: String): Unit = {
    val want = q(batchDf).collect().map(_.toString).sorted.toSeq
    assert(want.nonEmpty, s"$label: batch reference is empty — weak evidence")
    (1 to nSeeds).foreach { seed =>
      val got = streamed(cutChunks(seed), q, mode)
      assert(got == want,
        s"$label seed $seed (${cutChunks(seed).map(_.size).mkString("+")} cut) " +
          s"diverged from batch: ${got.length} vs ${want.length} rows; " +
          s"first diff ${got.zipAll(want, "<missing>", "<missing>")
            .find { case (a, b) => a != b }}")
    }
  }

  test(s"st1 tumbling counts: $nSeeds cut permutations converge to batch") {
    checkQuery("st1", EventStreams.tumblingCounts, "complete")
  }

  test(s"st2 sliding sum: $nSeeds cut permutations converge to batch") {
    checkQuery("st2", EventStreams.slidingSum, "complete")
  }

  test(s"st3 dedup: $nSeeds cut permutations + injected duplicates converge to the unique set") {
    // dropDuplicatesWithinWatermark has no batch form (analysis error), so
    // the reference is the projected UNIQUE row set — and to make the test
    // actually exercise dedup state across boundaries (corpus event_ids are
    // unique), each permutation re-delivers 50 random events into random
    // LATER-or-same chunks: converged output must still be one row per
    // event_id, identical for every cut. Duplicate copies are full-row
    // identical, so survivor choice cannot leak into the compare.
    val q = (df: DataFrame) => EventStreams.dedupEvents(df, delay = "10000 hours")
    val want = batchDf.withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "ts", "event_type")
      .collect().map(_.toString).sorted.toSeq
    assert(want.nonEmpty)
    (1 to nSeeds).foreach { seed =>
      val rnd = new Random(100000 + seed)
      val base = cutChunks(seed).map(_.toVector).toVector
      val withDups = Seq.fill(50)(()).foldLeft(base) { (chunks, _) =>
        val ev = allEvents(rnd.nextInt(allEvents.length))
        val at = rnd.nextInt(chunks.length)
        chunks.updated(at, chunks(at) :+ ev)
      }
      val got = streamed(withDups, q, "append")
      assert(got == want,
        s"st3 seed $seed diverged: ${got.length} vs ${want.length} rows")
    }
  }

  test(s"st4 session windows: $nSeeds cut permutations converge to batch") {
    checkQuery("st4", EventStreams.sessionCounts(_, delay = "10000 hours"), "complete")
  }

  test(s"st5 stream-stream interval join: $nSeeds cut permutations converge to batch") {
    checkQuery("st5", EventStreams.purchaseClickJoin(_, delay = "10000 hours"), "append")
  }

  test(s"CDC merge sink: $nSeeds random splits + orders converge to latest-wins") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    (1 to nSeeds).foreach { seed =>
      val rnd = new Random(seed)
      // collision-heavy updates: 6 keys × 4 ts values force real tiebreaks;
      // seq = row index keeps (ts, seq) a total order per key, so
      // latest-wins has exactly one right answer
      val rows = Vector.tabulate(40) { idx =>
        (rnd.nextInt(6).toLong, rnd.nextInt(4).toLong, idx.toLong,
          rnd.nextInt(2001) / 100.0 - 10.0)
      }
      def toDf(rs: Seq[(Long, Long, Long, Double)]): DataFrame =
        rs.map { case (k, t, q, v) =>
          (k, new java.sql.Timestamp(base + t * 60000L), q, v)
        }.toDF("user_id", "ts", "event_id", "value")
          .withColumn("ts", col("ts").cast("timestamp_ntz"))
      val k = 2 + rnd.nextInt(3)
      val assignment = rows.map(_ => rnd.nextInt(k))
      val order = rnd.shuffle((0 until k).toVector)
      val table = s"t_cutfz_${seed}_" + System.nanoTime()
      order.foreach { b =>
        val rs = assignment.zip(rows).filter(_._1 == b).map(_._2)
        if (rs.nonEmpty)
          EventStreams.mergeBatchUpsert(toDf(rs), table, "user_id", "ts",
            "event_id", 4)
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      val want = toDf(rows).withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1).drop("_rn")
      val got = spark.table(table).drop("_bucket")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"CDC seed $seed: merge diverged from latest-wins " +
          s"(k=$k, order=${order.mkString(",")})")
      spark.sql(s"DROP TABLE $table")
    }
  }
}
