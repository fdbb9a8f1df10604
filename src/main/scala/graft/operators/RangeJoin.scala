package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: `left.time ∈ [right.start, right.start + width)` with
  * an equi-join shuffle instead of Spark's broadcast-nested-loop fallback
  * for inequality conditions.
  *
  * Both sides are quantized to `width`-sized epoch buckets; a right row's
  * window can only overlap its own bucket and the next, so the right side is
  * duplicated into those two buckets and the join becomes an equality on
  * (key, bucket), refined by the exact range predicate afterwards. Cost is
  * O(matches) with a 2× duplication of the right side — the shape that
  * survives 100 TB, where a theta join would rescan per row.
  */
object RangeJoin {

  /** @param width window length in seconds (also the bucket size). */
  def bandedRangeJoin(left: DataFrame, leftKey: Column, leftTime: Column,
                      right: DataFrame, rightKey: Column, rightStart: Column,
                      width: Long): DataFrame = {
    // unix_timestamp needs an instant; NTZ columns resolve via the (UTC)
    // session zone, deterministic for bucketing purposes
    val l = left.withColumn("_bucket",
      floor(unix_timestamp(leftTime.cast("timestamp")) / width).cast("long"))
    val r = right
      .withColumn("_rstart", rightStart)
      .withColumn("_b0",
        floor(unix_timestamp(rightStart.cast("timestamp")) / width).cast("long"))
      .withColumn("_bucket", explode(array(col("_b0"), col("_b0") + 1)))
      .drop("_b0")
    l.join(r, l("_bucket") === r("_bucket") && leftKey === rightKey)
      .where(leftTime >= col("_rstart") &&
        leftTime < col("_rstart") + expr(s"INTERVAL $width SECONDS"))
      .drop("_bucket", "_rstart")
  }
}
