package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stable 0-based global row index over a total order — the scalable form
  * of `row_number() OVER (ORDER BY …)`, which plans a SINGLE-partition
  * window (every row through one task; the classic 100 TB serialization
  * trap). A training pipeline needs this for global example ids.
  *
  * Shape: range-partition by the order columns, sort within partitions,
  * then `RDD.zipWithIndex` — which internally runs one lightweight
  * count-per-partition job and assigns each partition a cumulative offset;
  * both passes are fully parallel. This is the documented "RDD only for
  * genuine per-partition imperative logic" case: the offset assignment has
  * no Catalyst operator.
  *
  * Requirement: `orderCols` must be a TOTAL order (unique key). Range
  * partition boundaries may split ties across partitions, which would make
  * tied rows' indices run-dependent.
  */
object GlobalIndex {

  def withGlobalIndex(df: DataFrame, orderCols: Seq[Column],
                      indexCol: String = "global_idx"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(indexed,
      StructType(sorted.schema.fields :+ StructField(indexCol, LongType, nullable = false)))
  }
}
