package graft

import java.nio.file.{Files, Path}
import java.sql.Date

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Ingest

/** Seeded property tier for the DROP-DIR INGEST semantics (the R1-R8
  * reference family) — the ingest analogue of MaintFuzzSpec: IngestSpec
  * pins each semantic on one fixed fixture; this suite draws multi-round
  * layouts and asserts the same contracts hold for arbitrary compositions.
  *
  * Per seed: 2-4 ingest rounds into one table. Round 1 creates (R1/R7
  * naming + inference); each later round draws one mutation —
  * conforming append (R2), missing column → NULL-fill (R3), extra column
  * → dropped (reference drop-extra, big_uery_handler.py:148), type drift →
  * SAFE_CAST NULL + per-column bad-cast counters (P2/R13), or a corrupt
  * entry (a directory masquerading as .csv) beside a good file → per-file
  * isolation (R6: the batch continues, the corrupt entry archives to
  * failedDir, the sibling loads). The EXPECTED state (row count, NULL-fill
  * count, bad-cast count, schema, stamp) is computed independently from
  * the drawn content, never read back from the code under test.
  *
  * In-suite soak is [[nSeeds]] seeds; widen with GRAFT_INGEST_FUZZ_SEEDS.
  * Per-shape floors keep the draw distribution honest.
  */
class IngestFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val nSeeds: Int =
    sys.env.get("GRAFT_INGEST_FUZZ_SEEDS").map(_.toInt).getOrElse(14)

  private def write(dir: Path, name: String, content: String): Unit =
    Files.writeString(dir.resolve(name), content)

  test(s"drop-dir ingest property: $nSeeds seeded multi-round layouts — " +
    "NULL-fill, drop-extra, safe-cast counters, per-file isolation, stamp") {
    var appends = 0; var nullFills = 0; var extras = 0
    var drifts = 0; var corrupts = 0
    (1 to nSeeds).foreach { seed =>
      val rnd = new Random(seed)
      val tbl = s"ingfz_$seed"
      val stem = s"$tbl.csv"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val dir = Files.createTempDirectory(s"graft-ingfz-$seed")
      val failedDir = dir.resolve("failed")
      val run = Date.valueOf("2026-08-16")

      var nextId = 1000
      def rows(n: Int, priceOf: Int => String): Seq[(Int, String)] =
        (0 until n).map { _ =>
          val id = nextId; nextId += 1
          (id, priceOf(id))
        }

      // round 1: conforming create — full schema, inferred types
      val r1 = rows(3 + rnd.nextInt(8), id => s"${id * 10}.5")
      write(dir, stem, "lead_id,agent,price,flag\n" +
        r1.map { case (id, p) => s"$id,a$id,$p,true" }.mkString("\n") + "\n")
      val out1 = Ingest.runDropDir(spark, dir.toString, run,
        failedDir = Some(failedDir.toString))
      assert(out1 == Seq(Ingest.Loaded(dir.resolve(stem).toString, tbl)),
        s"seed $seed round 1: $out1")

      var expectRows = r1.size.toLong
      var expectNullPrice = 0L
      val rounds = 1 + rnd.nextInt(3) // 1..3 mutation rounds
      (1 to rounds).foreach { round =>
        val shape = rnd.nextInt(5)
        val n = 2 + rnd.nextInt(6)
        shape match {
          case 0 => // conforming append
            appends += 1
            val rs = rows(n, id => s"${id * 10}.5")
            write(dir, stem, "lead_id,agent,price,flag\n" +
              rs.map { case (id, p) => s"$id,a$id,$p,false" }.mkString("\n") + "\n")
            val out = Ingest.runDropDir(spark, dir.toString, run,
              failedDir = Some(failedDir.toString))
            assert(out.forall(_.isInstanceOf[Ingest.Loaded]), s"seed $seed: $out")
            expectRows += n

          case 1 => // missing 'price' column → NULL-filled
            nullFills += 1
            val rs = rows(n, _ => "")
            write(dir, stem, "lead_id,agent,flag\n" +
              rs.map { case (id, _) => s"$id,a$id,true" }.mkString("\n") + "\n")
            Ingest.runDropDir(spark, dir.toString, run,
              failedDir = Some(failedDir.toString))
            expectRows += n; expectNullPrice += n

          case 2 => // extra 'bonus' column → dropped, never in the schema
            extras += 1
            val rs = rows(n, id => s"${id * 10}.5")
            write(dir, stem, "lead_id,agent,price,flag,bonus\n" +
              rs.map { case (id, p) => s"$id,a$id,$p,true,999" }.mkString("\n") + "\n")
            Ingest.runDropDir(spark, dir.toString, run,
              failedDir = Some(failedDir.toString))
            expectRows += n
            assert(!spark.table(tbl).columns.map(_.toLowerCase).contains("bonus"),
              s"seed $seed round $round: extra column leaked into the table")

          case 3 => // type drift: k of n prices uncastable → SAFE_CAST NULL
            drifts += 1
            val nBad = 1 + rnd.nextInt(n)
            val rs = rows(n, id => s"${id * 10}.5").zipWithIndex.map {
              case ((id, p), i) => (id, if (i < nBad) s"junk$id" else p)
            }
            write(dir, stem, "lead_id,agent,price,flag\n" +
              rs.map { case (id, p) => s"$id,a$id,$p,true" }.mkString("\n") + "\n")
            // the report path: bad-cast counters ride the ingest job itself
            val reports = Ingest.runDropDirReport(spark, dir.toString, run,
              runId = s"ingfz-$seed-$round", reportTable = s"${tbl}_report",
              failedDir = Some(failedDir.toString))
            assert(reports.length == 1 && reports.head.outcome == "loaded")
            assert(reports.head.rowsIn.contains(n.toLong),
              s"seed $seed round $round: rows_in ${reports.head.rowsIn} != $n")
            assert(reports.head.badCasts.getOrElse("price", -1L) == nBad.toLong,
              s"seed $seed round $round: bad_price " +
                s"${reports.head.badCasts} != $nBad")
            assert(reports.head.badCasts.filterNot(_._1 == "price")
                .forall(_._2 == 0L),
              s"seed $seed round $round: spurious bad-cast counts " +
                s"${reports.head.badCasts}")
            expectRows += n; expectNullPrice += nBad

          case _ => // corrupt entry beside a good file: per-file isolation
            corrupts += 1
            val badStem = s"${tbl}_bad$round.csv"
            Files.createDirectory(dir.resolve(badStem))
            val rs = rows(n, id => s"${id * 10}.5")
            write(dir, stem, "lead_id,agent,price,flag\n" +
              rs.map { case (id, p) => s"$id,a$id,$p,true" }.mkString("\n") + "\n")
            val out = Ingest.runDropDir(spark, dir.toString, run,
              failedDir = Some(failedDir.toString))
            assert(out.count(_.isInstanceOf[Ingest.Failed]) == 1 &&
              out.count(_.isInstanceOf[Ingest.Loaded]) == 1,
              s"seed $seed round $round: isolation broken: $out")
            assert(Files.exists(failedDir.resolve(badStem)),
              s"seed $seed round $round: corrupt entry not archived")
            expectRows += n
        }
        // success files leave the drop dir after every round (S9)
        assert(!Files.exists(dir.resolve(stem)),
          s"seed $seed round $round: ingested file still in the drop dir")
      }

      val t = spark.table(tbl)
      assert(t.count() == expectRows,
        s"seed $seed: ${t.count()} rows, expected $expectRows")
      assert(t.where("price IS NULL").count() == expectNullPrice,
        s"seed $seed: NULL-price count != $expectNullPrice " +
          "(NULL-fill + safe-cast draws)")
      assert(t.where(s"Ingestion_date = date'$run'").count() == expectRows,
        s"seed $seed: stamp missing on some rows")
      assert(t.columns.map(_.toLowerCase).sorted.toSeq ==
        Seq("agent", "flag", "ingestion_date", "lead_id", "price"),
        s"seed $seed: schema drifted: ${t.columns.mkString(",")}")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_report")
    }
    info(s"$nSeeds layouts: $appends append, $nullFills null-fill, " +
      s"$extras drop-extra, $drifts safe-cast-drift, $corrupts isolation")
    Seq("append" -> appends, "null-fill" -> nullFills, "drop-extra" -> extras,
      "drift" -> drifts, "isolation" -> corrupts).foreach { case (s, c) =>
      assert(c >= nSeeds / 8, s"$s draw starved: $c of $nSeeds seeds")
    }
  }
}
