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
}
