package graft.ingest

import java.sql.Date

import org.apache.spark.sql.SparkSession

/** Retention enforcement for `Ingestion_date`-partitioned tables — the
  * data-lifecycle half of the reference's audit column (the reference only
  * ever stamps `Ingestion_date`, big_uery_handler.py:173-194; production
  * pipelines also have to expire on it).
  *
  * Expiry is partition DROP, never row DELETE: dropping a partition is a
  * metadata operation plus one directory removal — O(partitions),
  * independent of row count — while row-level deletes rewrite every file
  * they touch. This is exactly why ingest partitions by `Ingestion_date`
  * in the first place (Ingest.ingestFile); at 100 TB the difference is a
  * second versus a full-table rewrite.
  *
  * `asOf` is an explicit parameter (not `current_date()`) for the same
  * reason as Ingest.runWindow: retention decisions must be reproducible
  * and testable (SURVEY §7 risk 3).
  */
object Retention {

  /** Drop every `Ingestion_date` partition strictly older than
    * `asOf - keepDays`.
    * @return the dropped partition dates, oldest first
    */
  def dropExpiredPartitions(spark: SparkSession, table: String,
                            keepDays: Int, asOf: Date): Seq[Date] = {
    require(keepDays >= 0, "keepDays must be >= 0")
    val cutoff = Date.valueOf(asOf.toLocalDate.minusDays(keepDays.toLong))
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    // Case-insensitive column match (Hive metastores lowercase partition
    // column names), and a LOUD failure when the table isn't partitioned
    // on the audit column at all — a silent no-op here means data past
    // the horizon is retained forever with nobody noticing.
    val partCols = spark.sessionState.catalog.getTableMetadata(ident)
      .partitionColumnNames
    val dateCol = partCols.find(_.equalsIgnoreCase("Ingestion_date"))
      .getOrElse(throw new IllegalArgumentException(
        s"retention: $table is not partitioned by Ingestion_date " +
          s"(partition columns: ${partCols.mkString(", ")})"))
    val expired = spark.sessionState.catalog.listPartitions(ident)
      .flatMap(_.spec.find { case (k, _) => k.equalsIgnoreCase(dateCol) }
        .map(_._2))
      .flatMap { v =>
        // the null/default partition and malformed values are skipped
        // (loudly), never allowed to abort expiry of valid partitions
        try Some(Date.valueOf(v))
        catch {
          case _: IllegalArgumentException =>
            System.err.println(
              s"[retention] skipping unparseable $dateCol partition '$v' of $table")
            None
        }
      }
      .filter(_.before(cutoff))
      .sortBy(_.toLocalDate.toEpochDay)
    expired.foreach { d =>
      // PURGE skips any trash/recycle layer — expiry means gone
      spark.sql(
        s"ALTER TABLE $table DROP IF EXISTS PARTITION ($dateCol = '$d') PURGE")
    }
    expired
  }
}
