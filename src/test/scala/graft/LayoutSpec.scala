package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ClusteredWrite

/** ClusteredWrite's data-skipping contract: each output file covers a
  * narrow key range, consecutive files overlap in at most one boundary
  * value (range partitioning may split equal keys), and the clustered copy
  * answers filters identically to the source.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("writeClustered: per-file key ranges are ordered and touch at most at boundaries") {
    val dir = Files.createTempDirectory("graft-layout").toString
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    ClusteredWrite.writeClustered(orders, Seq(col("o_orderdate")), dir, 8)

    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
    assert(parts.length > 1, "expected multiple clustered files")
    // NTZ timestamps stringify as ISO — lexicographic order == time order
    val ranges = parts.flatMap { p =>
      val r = spark.read.parquet(p)
        .agg(min(col("o_orderdate")).cast("string"),
          max(col("o_orderdate")).cast("string"), count(lit(1))).head
      if (r.getLong(2) == 0L) None else Some((r.getString(0), r.getString(1)))
    }
    ranges.foreach { case (lo, hi) => assert(lo <= hi) }
    ranges.sortBy(_._1).sliding(2).foreach { pair =>
      if (pair.length == 2)
        assert(pair(0)._2 <= pair(1)._1,
          s"file ranges overlap beyond a boundary value: $pair")
    }

    // row preservation + filter correctness over the clustered copy
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    val cut = lit("1997-06-01").cast("timestamp_ntz")
    assert(back.where(col("o_orderdate") < cut).count() ==
      orders.where(col("o_orderdate") < cut).count())
  }

  test("ZOrder.zValue: interleaving is exact and order-embeds both keys") {
    import graft.ingest.ZOrder
    val rows = spark.range(0, 1024)
      .select((org.apache.spark.sql.functions.col("id") / 32).cast("long").as("a"),
        (org.apache.spark.sql.functions.col("id") % 32).cast("long").as("b"))
      .withColumn("z", ZOrder.zValue(col("a"), col("b"), bits = 5))
      .collect()
    def refZ(a: Long, b: Long): Long =
      (0 until 5).map(i => (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))).reduce(_ | _)
    rows.foreach { r =>
      assert(r.getLong(2) == refZ(r.getLong(0), r.getLong(1)), s"bad z for $r")
    }
    // bijective on the 5-bit grid
    assert(rows.map(_.getLong(2)).distinct.length == 1024)
  }

  test("ZOrder layout prunes on BOTH dimensions where 1-D clustering cannot") {
    import graft.ingest.{ClusteredWrite, ZOrder}
    // 64x64 grid, one row per cell — deliberately uniform so the file
    // min/max geometry (not data skew) is what's under test
    val grid = spark.range(0, 4096)
      .select((org.apache.spark.sql.functions.col("id") / 64).cast("long").as("a"),
        (org.apache.spark.sql.functions.col("id") % 64).cast("long").as("b"))
    def candidateFiles(dir: String, lo: Long, hi: Long): Int = {
      val parts = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      parts.count { p =>
        val r = spark.read.parquet(p.getAbsolutePath)
          .agg(org.apache.spark.sql.functions.min("b"),
            org.apache.spark.sql.functions.max("b")).head
        r.getLong(0) <= hi && r.getLong(1) >= lo // file's b-range overlaps
      }
    }
    val linDir = java.nio.file.Files.createTempDirectory("graft-lin").toString
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    ClusteredWrite.writeClustered(grid, Seq(col("a")), linDir, 16)
    ClusteredWrite.writeClustered(grid,
      Seq(ZOrder.zValue(col("a"), col("b"), bits = 6)), zDir, 16)
    // predicate on b ONLY (the non-leading dimension): b in [0, 7]
    val lin = candidateFiles(linDir, 0, 7)
    val z = candidateFiles(zDir, 0, 7)
    // a-clustered files each span all of b → no pruning; z-ordered files
    // are local in b too → most files' min/max excludes the band
    assert(lin >= 14, s"1-D layout should be unprunable on b, got $lin/16")
    assert(z <= 8, s"z-order should prune most files on b, got $z/16")
    // correctness: both layouts return identical rows for the band
    val wantRows = grid.where(col("b") <= 7).count()
    assert(spark.read.parquet(zDir).where(col("b") <= 7).count() == wantRows)
    assert(spark.read.parquet(linDir).where(col("b") <= 7).count() == wantRows)
  }
}
