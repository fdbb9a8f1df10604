package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — multi-dimensional data skipping, the
  * generalization ClusteredWrite's 1-D sort can't reach: range-clustering
  * on key A makes every file span the full domain of key B, so a filter on
  * B alone prunes nothing. Interleaving the bits of both keys gives files
  * that are LOCAL in both dimensions at once — a predicate on either key
  * (or a box on both) overlaps only ~√(selectivity) of the files instead
  * of all of them.
  *
  * The z-value is a pure Column expression (shift/mask/or terms — fully
  * codegen'd, no UDF), so `ClusteredWrite.writeClustered(df,
  * Seq(ZOrder.zValue(a, b)), …)` is the whole integration: range
  * partitioning on z + in-file sort by z gives tight per-file min/max
  * stats on BOTH source columns, which is what parquet row-group pruning
  * and file skipping read. This is the lakehouse OPTIMIZE ZORDER BY
  * primitive on plain parquet.
  *
  * Keys must be non-negative; values are used modulo 2^bits (callers
  * bucket/rescale first — rank-based normalization beats raw values for
  * skewed domains, same as any Z-order implementation).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative long columns:
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * Default 21 bits per key keeps the result inside a positive Long.
    */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }
}
