package graft.ingest

import java.nio.file.{Files, Path, StandardCopyOption}
import java.sql.Date

import org.apache.spark.sql.SparkSession

/** The acquisition boundary as a TYPE (SURVEY §2.1 S1, §7 design stance):
  * anything that can land files in a drop directory for a run window.
  *
  * The reference's production implementation is a Selenium bot that logs
  * in, sets the date range, and downloads CSVs (reference
  * `fresh_picked_leads.py:23-215`) — out of engine scope by the declared
  * boundary: the ENGINE's contract starts at "files appeared in the drop
  * dir". Making that boundary a trait instead of a convention means the
  * pipeline runner can compose acquisition → ingest → report end-to-end
  * (the reference's `main.py` flow) while tests inject fixture-backed
  * sources, and a production `Source` (HTTP puller, SFTP sync, queue
  * drainer) plugs in without touching any ingest code.
  */
trait Source {

  /** Land whatever the run window demands into `dropDir`; return the
    * landed paths. Implementations own their own retry/auth/rate-limit
    * policy — the engine only sees files.
    */
  def fetch(window: (Date, Date), dropDir: Path): Seq[Path]
}

object Source {

  /** Fixture-backed source: copies prepared files into the drop dir —
    * the test stand-in the SURVEY promises for the Selenium stage.
    */
  final class Fixture(staged: Seq[Path]) extends Source {
    override def fetch(window: (Date, Date), dropDir: Path): Seq[Path] = {
      Files.createDirectories(dropDir)
      staged.map { p =>
        Files.copy(p, dropDir.resolve(p.getFileName),
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  /** The reference's whole `main.py` flow, engine-side: derive the run
    * window, let the source land files, ingest the drop dir with a
    * persisted run report. One call = acquisition → ingest → report.
    */
  def runPipeline(spark: SparkSession, source: Source, dropDir: Path,
                  runDate: Date, runId: String,
                  reportTable: String = "ingest_run_report",
                  failedDir: Option[String] = None,
                  extensions: Set[String] = Set(".csv"))
      : Seq[Ingest.FileReport] = {
    source.fetch(Ingest.runWindow(runDate), dropDir)
    Ingest.runDropDirReport(spark, dropDir.toString, runDate, runId,
      reportTable = reportTable, failedDir = failedDir,
      extensions = extensions)
  }
}
