package graft

import java.nio.file.Files
import java.sql.Date

import scala.util.Random

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{Compaction, Retention}

/** Seeded property tier for the MAINTENANCE operators (VERDICT r14 #8):
  * Compaction and Retention were spec-covered by fixed forms only
  * (IngestSpec) while every query operator also rides a generated tier.
  * Per seed this suite draws a layout — partition count, files per
  * partition, rows per file, a schema-evolution point, target file size,
  * retention horizon — materializes it, runs the operator, and asserts the
  * PROPERTIES the fixed tests assert for one layout:
  *
  *  - compaction preserves the row multiset and the UNION schema (files
  *    written before an evolution point lack the evolved column; their
  *    rows must surface with NULLs, never truncated to one footer);
  *  - compaction never increases the file count, cleans its tmp/backup
  *    dirs, and is idempotent once compact;
  *  - a crashed swap (data dir missing, backup present — simulated at the
  *    exact window the compactDir doc declares) is auto-recovered on the
  *    next entry with content intact;
  *  - retention drops EXACTLY the partitions strictly older than
  *    `asOf - keepDays` (computed independently here), keeps the rest
  *    byte-identical, and a second run drops nothing;
  *  - compactTable → retention compose on one catalog table (the REFRESH
  *    TABLE interplay: retention must see post-swap listings).
  *
  * In-suite soak is [[nSeeds]] seeds; widen with GRAFT_MAINT_FUZZ_SEEDS.
  * Per-shape floors keep the seed range honest (a generator edit that
  * silently starves the evolution or crash draw fails here, not in
  * review). All dates and sizes are seed-drawn — no wall clock anywhere.
  */
class MaintFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val nSeeds: Int =
    sys.env.get("GRAFT_MAINT_FUZZ_SEEDS").map(_.toInt).getOrElse(12)

  /** Canonical content snapshot: union-schema read, columns normalized by
    * name, rows rendered and sorted (multiset compare, order-free).
    */
  private def snapshot(path: String): Seq[String] = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toString).toSeq.sorted
  }

  private def partFiles(dir: String): Int = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s => s.isFile && s.getPath.getName.startsWith("part-"))
  }

  test(s"compactDir property: $nSeeds seeded layouts — multiset + union " +
    "schema preserved, monotone file count, idempotent, crash-recoverable") {
    var compacted = 0; var evolved = 0; var crashed = 0
    (1 to nSeeds).foreach { seed =>
      val rnd = new Random(seed)
      val dir = Files.createTempDirectory(s"graft-maintfz-$seed").toString
      val nFiles = 2 + rnd.nextInt(7)               // 2..8 appended files
      val evolveAt =                                 // files >= this carry
        if (rnd.nextInt(2) == 0) Some(1 + rnd.nextInt(nFiles)) else None
      var base = 0L
      (0 until nFiles).foreach { i =>
        val rows = 50L + rnd.nextInt(300)
        val df0 = spark.range(base, base + rows)
          .select(col("id").as("lead_id"),
            (col("id") % 97).cast("double").as("score"))
        val df = evolveAt match {
          case Some(e) if i >= e =>
            df0.withColumn("agent", concat(lit("a"), col("lead_id").cast("string")))
          case _ => df0
        }
        df.coalesce(1).write.mode("append").parquet(dir)
        base += rows
      }
      val want = snapshot(dir)
      val before = partFiles(dir)
      val target = Seq(64L * 1024, 256L * 1024, 1024L * 1024)(rnd.nextInt(3))
      val (b, a) = Compaction.compactDir(spark, dir, target)
      assert(b == before, s"seed $seed: reported before-count $b != $before")
      assert(a <= b, s"seed $seed: compaction grew the file count $b -> $a")
      if (a < b) compacted += 1
      if (evolveAt.isDefined) evolved += 1
      assert(snapshot(dir) == want,
        s"seed $seed: content changed across compaction (evolveAt=$evolveAt)")
      assert(!Files.exists(java.nio.file.Paths.get(dir + ".compact-tmp")) &&
        !Files.exists(java.nio.file.Paths.get(dir + ".pre-compact")),
        s"seed $seed: leftover swap dirs")
      // idempotence: once compact, a second run must be a no-op
      val (b2, a2) = Compaction.compactDir(spark, dir, target)
      assert(b2 == a2, s"seed $seed: second compaction was not a no-op ($b2 -> $a2)")
      // crash simulation at the declared vulnerable window: original moved
      // aside, replacement not yet in place → next entry must auto-recover
      if (rnd.nextInt(3) == 0) {
        crashed += 1
        val p = new HPath(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        assert(fs.rename(p, new HPath(dir + ".pre-compact")),
          s"seed $seed: crash-sim rename failed")
        val (b3, a3) = Compaction.compactDir(spark, dir, target)
        assert(a3 <= b3)
        assert(snapshot(dir) == want,
          s"seed $seed: crash recovery lost or changed rows")
      }
    }
    info(s"$nSeeds layouts: $compacted actually compacted, $evolved evolved-schema, $crashed crash-recovered")
    assert(compacted >= nSeeds / 2, s"compaction starved: $compacted")
    assert(evolved >= nSeeds / 4, s"evolution draw starved: $evolved")
    assert(crashed >= nSeeds / 6, s"crash draw starved: $crashed")
  }

  test(s"compactTable + retention property: $nSeeds seeded partitioned " +
    "tables — exact expiry set, survivors intact, idempotent, post-compaction") {
    var droppedSome = 0; var keptAll = 0; var droppedAll = 0
    (1 to nSeeds).foreach { seed =>
      val rnd = new Random(1000 + seed)
      val tbl = s"maintfz_$seed"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val day0 = Date.valueOf("2026-07-01").toLocalDate
      val dates = Seq.fill(2 + rnd.nextInt(5))(day0.plusDays(rnd.nextInt(45).toLong))
        .distinct.sorted(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
      // 1..3 appends per partition date → small files for compactTable
      var wrote = false
      dates.foreach { d =>
        (0 to rnd.nextInt(3)).foreach { j =>
          val rows = 30L + rnd.nextInt(120)
          val df = spark.range(j * 1000, j * 1000 + rows)
            .select(col("id").as("lead_id"),
              (col("id") % 53).cast("double").as("score"))
            .withColumn("Ingestion_date", lit(Date.valueOf(d)))
          if (!wrote) {
            df.write.partitionBy("Ingestion_date").saveAsTable(tbl); wrote = true
          } else df.write.mode("append").insertInto(tbl)
        }
      }
      val wantByDate = spark.table(tbl).groupBy("Ingestion_date").count()
        .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
      // compact first: retention must operate on post-swap listings
      val results = Compaction.compactTable(spark, tbl, 256L * 1024)
      assert(results.length == dates.length,
        s"seed $seed: one compaction result per partition: $results")
      assert(results.forall { case (_, b, a) => a <= b })
      // independently computed expiry set
      val keepDays = rnd.nextInt(40)
      val asOf = dates.last.plusDays(rnd.nextInt(10).toLong)
      val cutoff = asOf.minusDays(keepDays.toLong)
      val expected = dates.filter(_.isBefore(cutoff)).map(d => Date.valueOf(d))
      val dropped = Retention.dropExpiredPartitions(
        spark, tbl, keepDays, Date.valueOf(asOf))
      assert(dropped == expected,
        s"seed $seed: dropped $dropped, expected $expected " +
          s"(dates=$dates keepDays=$keepDays asOf=$asOf)")
      if (expected.isEmpty) keptAll += 1
      else if (expected.length == dates.length) droppedAll += 1
      else droppedSome += 1
      val after = spark.table(tbl).groupBy("Ingestion_date").count()
        .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
      val expectedAfter = wantByDate -- expected.map(_.toString)
      assert(after == expectedAfter,
        s"seed $seed: survivors wrong — got $after, expected $expectedAfter")
      // idempotent: nothing more to expire at the same horizon
      assert(Retention.dropExpiredPartitions(spark, tbl, keepDays,
        Date.valueOf(asOf)).isEmpty, s"seed $seed: second expiry not empty")
      spark.sql(s"DROP TABLE $tbl")
    }
    info(s"$nSeeds tables: $droppedSome partial expiry, $keptAll kept-all, $droppedAll dropped-all")
    assert(droppedSome + droppedAll >= nSeeds / 4,
      s"expiry never exercised: $droppedSome+$droppedAll")
    assert(keptAll >= 1, s"kept-all horizon never drawn: $keptAll")
  }
}
