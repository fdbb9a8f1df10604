package graft.ingest

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance half of a drop-directory ingest.
  *
  * Per-file loads (one CSV → one append, reference `big_uery_handler.py:
  * 68-89`) accrete one parquet file per batch; after thousands of daily
  * loads a scan pays per-file open/footer costs and the scheduler drowns in
  * tiny splits. Compaction rewrites a directory into ~`targetFileBytes`
  * files: read (schema-merged across ALL footers — evolveSchema appends mean
  * old and new files legitimately differ, and inferring from one footer
  * would silently drop the newer columns' data) → `repartition(n)`
  * (round-robin, so output files are size-balanced regardless of input
  * skew) → write beside the original → swap directories.
  *
  * Swap semantics, honestly: two renames (original → `.pre-compact` backup,
  * tmp → original), each atomic, with a window between them where the data
  * path does not exist — a concurrent reader in that window sees an empty
  * partition, and a crash in it leaves the data only in `.pre-compact`.
  * compactDir therefore (a) auto-recovers a crashed prior swap on entry
  * (backup present + data path missing → restore), and (b) is meant to run
  * in a maintenance window / single-writer regime. A truly seamless swap
  * needs a catalog with atomic location updates (lakehouse table formats);
  * on a plain filesystem this recover-on-entry pattern is the honest
  * contract. At 100 TB you compact per partition (Ingestion_date dirs) —
  * bounded blast radius — never the whole table in one job.
  */
object Compaction {

  /** @return (filesBefore, filesAfter) */
  def compactDir(spark: SparkSession, dir: String,
                 targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new HPath(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new HPath(dir + ".pre-compact")
    // recover a crashed prior swap: data only in the backup → restore it
    if (!fs.exists(path) && fs.exists(bak) && !fs.rename(bak, path))
      throw new java.io.IOException(
        s"compaction: found orphaned backup $bak but could not restore it")
    val parts = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    val totalBytes = parts.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (parts.length <= n) return (parts.length, parts.length) // already compact

    val tmp = new HPath(dir + ".compact-tmp")
    fs.delete(tmp, true); fs.delete(bak, true)
    // mergeSchema: the union of every footer's columns; files missing a
    // column contribute NULLs (same semantics a reader of the mixed dir
    // gets) instead of the rewrite truncating to one arbitrary footer
    spark.read.option("mergeSchema", "true").parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: two renames; each is atomic on HDFS/posix directories
    if (!fs.rename(path, bak))
      throw new java.io.IOException(s"compaction: could not move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // restore — compaction failed, data intact
      throw new java.io.IOException(s"compaction: could not move $tmp into place")
    }
    fs.delete(bak, true)
    val after = fs.listStatus(path)
      .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
    (parts.length, after)
  }

  /** Compact a partitioned managed table one partition directory at a time —
    * the shape this runs in production: daily ingests append small files
    * into `Ingestion_date=<d>/` leaf dirs, and compaction walks the leaves
    * independently (bounded blast radius per swap, trivially parallel or
    * resumable across partitions, never a whole-table rewrite).
    * Metastore-registered file listings go stale after every swap, so
    * REFRESH TABLE runs in a finally — a failure on partition N must not
    * leave partitions 1..N-1 swapped but the session still holding their
    * old file listing (stale-cache FileNotFoundException on the next read).
    *
    * @return per-partition (location, filesBefore, filesAfter)
    */
  def compactTable(spark: SparkSession, table: String,
                   targetFileBytes: Long = 128L * 1024 * 1024)
      : Seq[(String, Int, Int)] = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val catalogTable = spark.sessionState.catalog.getTableMetadata(ident)
    val locations =
      if (catalogTable.partitionColumnNames.isEmpty)
        Seq(catalogTable.location.toString)
      else spark.sessionState.catalog.listPartitions(ident)
        .map(_.location.toString)
    try locations.map { loc =>
      val (b, a) = compactDir(spark, loc, targetFileBytes)
      (loc, b, a)
    } finally spark.sql(s"REFRESH TABLE $table")
  }
}
