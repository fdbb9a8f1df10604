package graft.queries

import java.time.LocalDateTime

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.fuzz.StreamFuzzGen

/** Corpus event row for the MemoryStream encoder (main scope — the fzst
  * catalog tier runs REAL streaming queries inside Verify/Bench, not just
  * inside ScalaTest). LocalDateTime ⇒ TIMESTAMP_NTZ, matching the corpus
  * events schema through Tables.events' vintage normalization.
  */
final case class StreamFuzzEvent(event_id: Long, ts: LocalDateTime,
                                 user_id: Long, event_type: String,
                                 value: Double, props: String)

/** The STREAMING slice of the driver-checked catalog (r17 verdict #3):
  * frozen StreamFuzzGen v6 dedup-WIDE draws run as real Structured
  * Streaming queries — dropDuplicatesWithinWatermark over a seeded cut
  * permutation with injected replays — and hash-compared by the driver's
  * DuckDB oracle against relational DISTINCT of the same key projection.
  *
  * Why this tier is oracle-able when the rest of the streaming fuzz is
  * not: under a WIDE watermark ("10000 hours") dedup state never evicts,
  * so the emitted row set is a pure function of the input SET — every key
  * emits exactly once regardless of delivery order, micro-batch
  * boundaries, or replays. `emitted ≡ SELECT DISTINCT keys` therefore
  * holds EXACTLY, and a second engine can check it. (Finite-delay draws
  * only guarantee the emitted key SET matches — re-emission after state
  * expiry means row multiplicity is delivery-dependent — so they stay in
  * the ScalaTest tier, StreamFuzzSpec.)
  *
  * Delivery is the StreamFuzzSpec discipline, seeded and deterministic:
  * shuffled order, 2-6 chunks at random boundaries, 50 replayed rows
  * scattered into later-or-same chunks. The collect-to-driver +
  * MemoryStream harness is the test-delivery mechanism (exact boundary
  * control a file source cannot give), not the production path — the
  * production streaming surface is EventStreams over readStream sources.
  *
  * Scale posture: the dedup operator itself is a keyed state-store
  * exchange — the same hash-shuffle shape as batch DISTINCT — so the plan
  * scales like any streaming dedup; only the harness is driver-side, and
  * it is bounded by the corpus SF (100k rows × 6 narrow columns at
  * sf0.1).
  */
object StreamFuzzQueries {

  /** Frozen v6 dedup-wide seeds, key-shape diverse (scanned 1-200 via
    * tools/StScan; all four key draws represented):
    *  - event_id (unique key — every duplicate is an injected replay):
    *    35, 52, 159
    *  - user_id (genuinely repeated across the corpus span): 6, 13, 76, 199
    *  - (user_id, event_type): 33, 96, 124, 150
    *  - (user_id%km, event_type) buckets, km ∈ {5,4,3,6,2}: 4, 25, 62,
    *    58, 177
    */
  val declaredSeedsSt: Seq[Int] =
    Seq(4, 6, 13, 25, 33, 35, 52, 58, 62, 76, 96, 124, 150, 159, 177, 199)

  private def loadEvents(spark: SparkSession, sfDir: String): Vector[StreamFuzzEvent] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[StreamFuzzEvent].collect().toVector.sortBy(_.event_id)
  }

  /** Seeded cut permutation (the StreamFuzzSpec discipline, reproduced
    * independently): shuffled delivery, 2-6 chunks at random boundaries.
    */
  private def cutChunks(all: Vector[StreamFuzzEvent], seed: Int): Seq[Seq[StreamFuzzEvent]] = {
    val rnd = new Random(seed)
    val order = rnd.shuffle(all)
    val k = 2 + rnd.nextInt(5)
    val points = Seq.fill(k - 1)(1 + rnd.nextInt(order.length - 1))
      .distinct.sorted
    val bounds = (0 +: points) :+ order.length
    bounds.sliding(2).map { case Seq(a, b) => order.slice(a, b) }.toSeq
  }

  /** Run the draw's streaming build over the chunks through a MemoryStream
    * + memory sink, return the (converged, for complete / appended, for
    * append) sink rows as a local DataFrame.
    */
  private def runStream(spark: SparkSession, build: org.apache.spark.sql.DataFrame => DataFrame,
                        chunks: Seq[Seq[StreamFuzzEvent]], mode: String, tag: String): DataFrame = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[StreamFuzzEvent]
    val name = s"${tag}_${System.nanoTime()}"
    val query = build(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try {
      chunks.foreach { c =>
        mem.addData(c)
        query.processAllAvailable()
      }
    } finally query.stop()
    val sink = spark.table(name)
    val rows = sink.collect().toSeq
    val schema = sink.schema
    spark.catalog.dropTempView(name)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  private def runDedupWide(spark: SparkSession, sfDir: String, seed: Int): DataFrame = {
    val g = StreamFuzzGen.query(seed, 6)
    require(g.shape == "dedup-wide",
      s"fzst seed $seed drew ${g.shape}; the catalog tier is wide-only")
    val all = loadEvents(spark, sfDir)
    // cut permutation + replays (the v6 discipline): 50 drawn rows
    // re-delivered into later-or-same chunks
    val chunks0 = cutChunks(all, seed)
    val rndDup = new Random(seed)
    val dups = Vector.fill(50)(all(rndDup.nextInt(all.length)))
    val chunks = chunks0.zipWithIndex.map { case (c, i) =>
      c ++ dups.filter(_ => rndDup.nextInt(chunks0.length) <= i)
    }
    val out = runStream(spark, g.build, chunks, "append", s"fzst_$seed")
    // total order on the key columns (distinct keys ⇒ total): the driver
    // determinism contract
    out.orderBy(out.columns.map(col).toIndexedSeq: _*)
  }

  /** fzsw: v1 TUMBLING windowed aggregation in COMPLETE mode — the
    * converged sink is exactly the batch aggregation (the watermark
    * neither drops nor evicts in complete mode), which the oracle renders
    * as an epoch-bucketed GROUP BY. w_start/w_end cast to BIGINT epoch
    * seconds under the session's pinned UTC, so timestamp FORMATTING
    * never enters the hash.
    */
  private def runTumblingComplete(spark: SparkSession, sfDir: String, seed: Int): DataFrame = {
    val g = StreamFuzzGen.query(seed, 1)
    require(g.shape == "tumbling" && g.oracleSql.isDefined,
      s"fzsw seed $seed drew ${g.shape} (oracle=${g.oracleSql.isDefined}); " +
        "the catalog tier is oracle-able-tumbling-only")
    val all = loadEvents(spark, sfDir)
    val out = runStream(spark, g.build, cutChunks(all, seed), "complete", s"fzsw_$seed")
    val projected = out.select(
      (Seq(col("w_start").cast("long").as("w_start"),
        col("w_end").cast("long").as("w_end")) ++
        out.columns.filterNot(c => c == "w_start" || c == "w_end").map(col).toSeq): _*)
    // (w_start, k0) is the grouping key ⇒ ordering by all columns is total
    projected.orderBy(projected.columns.map(col).toIndexedSeq: _*)
  }

  /** Frozen v1 tumbling seeds for the fzsw tier (scanned 1-400 via
    * tools/StScan; every oracle-able aggregate and all three key draws
    * represented across all six window sizes):
    *  - keyless: 11 (60m n_click), 17 (15m 2-agg), 28 (360m), 54 (1440m),
    *    88 (30m 2-agg), 119 (60m sum_cents)
    *  - key=event_type: 26 (15m 3-agg), 33 (120m 3-agg), 44 (30m 3-agg),
    *    58 (1440m 3-agg), 70 (60m 3-agg), 91 (1440m 3-agg)
    *  - key=user_id%km: 136 (360m km=4), 162 (15m km=3), 225 (15m 3-agg
    *    km=3)
    */
  val declaredSeedsSw: Seq[Int] =
    Seq(11, 17, 26, 28, 33, 44, 54, 58, 70, 88, 91, 119, 136, 162, 225)

  val defs: Seq[Q] = declaredSeedsSt.map { seed =>
    val g = StreamFuzzGen.query(seed, 6)
    Q(
      s"fzst$seed",
      s"Generated STREAMING dedup differential (StreamFuzzGen v6 seed $seed): " +
        s"real dropDuplicatesWithinWatermark over a seeded cut permutation " +
        s"with injected replays, vs DuckDB relational DISTINCT. Draw: ${g.desc}",
      (s, d) => runDedupWide(s, d, seed),
      g.oracleSql)
  } ++ declaredSeedsSw.map { seed =>
    val g = StreamFuzzGen.query(seed, 1)
    Q(
      s"fzsw$seed",
      s"Generated STREAMING windowed-aggregation differential (StreamFuzzGen " +
        s"v1 seed $seed): real complete-mode tumbling aggregation over a " +
        s"seeded cut permutation, vs DuckDB epoch-bucketed GROUP BY. " +
        s"Draw: ${g.desc}",
      (s, d) => runTumblingComplete(s, d, seed),
      g.oracleSql)
  }
}
