package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}
import org.apache.spark.sql.types.DoubleType

/** Engine-independent rounding for oracle-compared doubles.
  *
  * Spark's `round` rounds the *shortest decimal repr* of the double HALF_UP
  * (`BigDecimal.valueOf`), while DuckDB rounds the true binary value — e.g.
  * the double nearest 1222.745 renders "1222.745", Spark rounds it to
  * 1222.75, DuckDB (seeing ...744999999) to 1222.74. Observed on 116/60k
  * lineitem rows at scale 2.
  *
  * `floor(x·10ⁿ + 0.5)/10ⁿ` uses only IEEE ops that both engines evaluate
  * bit-identically, so results always hash-match. Every declared query uses
  * this via the shadow-import `import graft.queries.Canon.round`, and the
  * oracle SQL spells out the same formula.
  */
object Canon {
  def round(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c.cast(DoubleType) * f + lit(0.5)).cast(DoubleType) / f
  }

  /** Decimal-exact double sum: route the addition through DECIMAL(38,6) so
    * the result is independent of partition/accumulation order, then cast
    * back at the call site. One definition — the precision/scale choice is
    * part of the oracle contract and must not drift per query file.
    */
  def dsum(c: Column): Column =
    org.apache.spark.sql.functions.sum(
      c.cast(org.apache.spark.sql.types.DecimalType(38, 6)))
}
