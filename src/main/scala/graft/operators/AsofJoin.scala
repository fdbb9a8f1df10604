package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (last-value-at-or-before) join — an operator Spark lacks natively.
  *
  * Implemented with the distributed idiom, not a range join: tag both sides,
  * union on (key, time), and take the running `max` of the right-side
  * payload struct over a (key, time)-ordered window. One shuffle on the key,
  * per-partition sort, no O(left × right-per-key) intermediate — this is the
  * shape that survives 100 TB (a theta/range join would rescan the right
  * side per left row).
  *
  * Semantics: for each left row, the right row with the greatest
  * `rightTime <= leftTime` for the same key; ties on time break by the
  * remaining payload struct fields (pass a unique id right after the time
  * field for determinism). Right rows sort before left rows at equal time,
  * so `<=` is inclusive.
  */
object AsofJoin {

  /** @param payload right-side columns to attach; MUST start with the right
    *                time column and a unique tiebreak id so the struct max
    *                is deterministic.
    */
  def asofLeft(left: DataFrame, leftKey: Column, leftTime: Column,
               right: DataFrame, rightKey: Column, rightTime: Column,
               payload: Seq[Column]): DataFrame = {
    val leftCols = left.columns
    val l = left.select(
      leftKey.as("_k"), leftTime.as("_t"), lit(1).as("_side"),
      lit(null).cast(right.select(struct(payload: _*)).schema.head.dataType).as("_p"),
      struct(leftCols.map(col): _*).as("_row"))
    // A null rightTime would sort NULLS FIRST and poison the running max for
    // left rows preceding any real match — drop such rows to keep the
    // documented `rightTime <= leftTime` contract. Null keys likewise: under
    // SQL equi-join semantics NULL never matches anything, but the union
    // idiom would group null `_k` partitions together, so a null-key right
    // row could leak into null-key left rows. (Left rows with null leftTime
    // sort NULLS FIRST and correctly see no prior right row → null `_asof`.)
    val r = right.where(rightTime.isNotNull && rightKey.isNotNull).select(
      rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
      struct(payload: _*).as("_p"),
      lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType).as("_row"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", max(col("_p")).over(w))
      .where(col("_side") === 1)
      .select((leftCols.map(n => col(s"_row.$n").as(n)) :+ col("_asof")): _*)
  }
}
