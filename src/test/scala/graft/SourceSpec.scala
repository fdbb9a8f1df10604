package graft

import java.nio.file.Files
import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{Ingest, Source}

/** End-to-end over the acquisition boundary: a fixture-backed Source lands
  * files (the test stand-in for the reference's Selenium stage), the
  * pipeline ingests the drop dir, and the result is queryable tables plus
  * a persisted run report — the whole `main.py` flow in one call.
  */
class SourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val run: Date = Date.valueOf("2026-08-12")

  test("fetch → drop dir → ingest → query, with run report") {
    // stage fixture files somewhere that is NOT the drop dir
    val staging = Files.createTempDirectory("graft-src-staging")
    Files.writeString(staging.resolve("src_leads.csv"),
      """lead_id,full_name,asking_price
        |1,Jane Smith,250000.5
        |2,Bob Jones,180000.0
        |""".stripMargin)
    Files.writeString(staging.resolve("src_buyers.csv"),
      "buyer_id,budget\n7,300000\n")
    val source = new Source.Fixture(Seq(
      staging.resolve("src_leads.csv"), staging.resolve("src_buyers.csv")))

    val drop = Files.createTempDirectory("graft-src-drop")
    val runId = "src_" + System.nanoTime()
    val reports = Source.runPipeline(spark, source, drop, run, runId)

    assert(reports.map(_.outcome) == Seq("loaded", "loaded"))
    assert(reports.map(_.tableName.get).sorted == Seq("src_buyers", "src_leads"))
    // landed files consumed from the drop dir (delete-on-success)
    assert(!Files.exists(drop.resolve("src_leads.csv")))
    // tables queryable with stamped ingestion date
    assert(spark.table("src_leads").where(s"Ingestion_date = date'$run'")
      .count() == 2)
    assert(spark.table("src_buyers").count() == 1)
    // report persisted and attributable to this run
    assert(spark.table("ingest_run_report")
      .where(s"run_id = '$runId' AND outcome = 'loaded'").count() == 2)
    // fixtures untouched in staging (source COPIES, never moves)
    assert(Files.exists(staging.resolve("src_leads.csv")))
    spark.sql("DROP TABLE src_leads")
    spark.sql("DROP TABLE src_buyers")
  }

  test("window handed to the source is the derived run window") {
    var seen: Option[(Date, Date)] = None
    val probe = new Source {
      override def fetch(window: (Date, Date), dropDir: java.nio.file.Path) = {
        seen = Some(window); Seq.empty
      }
    }
    val drop = Files.createTempDirectory("graft-src-win")
    Source.runPipeline(spark, probe, drop, run, "src_win_" + System.nanoTime())
    assert(seen.contains(Ingest.runWindow(run)))
    assert(seen.get._1 == Date.valueOf("2026-08-11") && seen.get._2 == run)
  }
}
