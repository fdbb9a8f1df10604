package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance half of a drop-directory ingest.
  *
  * Per-file loads (one CSV → one append, reference `big_uery_handler.py:
  * 68-89`) accrete one parquet file per batch; after thousands of daily
  * loads a scan pays per-file open/footer costs and the scheduler drowns in
  * tiny splits. Compaction rewrites a directory into ~`targetFileBytes`
  * files: read → `repartition(n)` (round-robin, so output files are
  * size-balanced regardless of input skew) → write beside the original →
  * swap directories.
  *
  * The swap is rename-based (original → `.pre-compact` backup, new dir in),
  * so a crash mid-swap leaves either the old or the new complete directory
  * plus a leftover to clean — never a half-written mix readers could see.
  * At 100 TB you compact per partition (Ingestion_date dirs), never the
  * whole table in one job, and you take a partition-level lock or rely on
  * the catalog's atomic location swap; this operator is that per-partition
  * unit.
  */
object Compaction {

  /** @return (filesBefore, filesAfter) */
  def compactDir(spark: SparkSession, dir: String,
                 targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new HPath(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    val totalBytes = parts.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (parts.length <= n) return (parts.length, parts.length) // already compact

    val tmp = new HPath(dir + ".compact-tmp")
    val bak = new HPath(dir + ".pre-compact")
    fs.delete(tmp, true); fs.delete(bak, true)
    spark.read.parquet(dir).repartition(n)
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
    * Metastore-registered file listings go stale after the swap; REFRESH
    * TABLE drops the cached listing.
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
    val results = locations.map { loc =>
      val (b, a) = compactDir(spark, loc, targetFileBytes)
      (loc, b, a)
    }
    spark.sql(s"REFRESH TABLE $table")
    results
  }
}
