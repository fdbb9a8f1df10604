package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All LSH probe buckets of an embedding in ONE expression —
  * `array<long>` of length `numTables * nProbe`, laid out
  * `[t0 probes..., t1 probes..., ...]` (probe 0 of each table = the exact
  * sign-bit bucket; probes 1.. = multi-probe single-bit flips, smallest
  * |projection| first — Lv et al. VLDB'07).
  *
  * Why an expression and not Column algebra: the Column form renders the
  * six plane projections of a table inside EVERY probe expression
  * (bucket + each XOR flip + the magnitude sort each re-inline the six
  * 64-literal dot products), so 8 tables × 5 probes explodes to ~430
  * dot-product bodies in one codegen function — past janino's 64 KB
  * method limit, and Spark silently falls back to INTERPRETED evaluation
  * of exactly that duplicated tree (the 100k-vector AnnSoak measured the
  * fallback at 37 s vs ~2 s for the equality-join IVF paths; the same
  * fallback was burning the sf0.1 bench). Here the projections are
  * computed ONCE per (row, table) in a tight compiled loop; codegen emits
  * a single call into [[LshPlanes.compute]], so the stage stays inside
  * WholeStageCodegen with constant-size generated code at any probe
  * count.
  *
  * Bit/probe semantics are BIT-IDENTICAL to the Column fold they replace
  * (AnnSpec pins the equivalence): plane j of table t is the Knuth-hash
  * pseudo-random vector (graft.similarity.Ann.planeVec formula, float
  * components widened to double exactly like FloatVectorDot), the first
  * plane is the bucket's MSB, projections `> 0` set the bit, and flip
  * order sorts (|proj|, bitWeight) ascending — the same lexicographic
  * order sort_array gave the (magnitude, weight) structs.
  *
  * Null semantics: null input → null (nullSafeEval); a null ELEMENT
  * poisons the whole result to null (corpora never carry null elements;
  * the Column form silently treated null projections as 0-bits, which was
  * never exercised — poisoning is the honest contract).
  */
case class LshProbeBuckets(child: Expression, numPlanes: Int, numTables: Int,
                           nProbe: Int) extends UnaryExpression {

  // Single-bit multi-probe has exactly 1 + numPlanes distinct probes per
  // table (the bucket plus one flip per plane); a larger nProbe would
  // index past the flip list. Loud at construction, not per row. (The
  // Column form it replaced silently produced NULL probes past the list —
  // element_at out of bounds — which the candidate join then dropped.)
  require(nProbe >= 1 && nProbe <= numPlanes + 1,
    s"lsh_probe_buckets: nProbe=$nProbe out of range 1..${numPlanes + 1} " +
      "(bucket + one single-bit flip per plane)")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkFloatArrays(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_probe_buckets"

  private lazy val planes: Array[Array[Float]] =
    LshPlanes.planes(numPlanes * numTables)

  /** Shared by eval and codegen; null iff a null element is seen. */
  def computeBuckets(x: ArrayData): GenericArrayData = {
    val out = LshPlanes.compute(x, planes, numPlanes, numTables, nProbe)
    if (out == null) null else new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    computeBuckets(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("lshExpr", this,
        classOf[LshProbeBuckets].getName)
      s"""
         |${ev.value} = $self.computeBuckets($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshPlanes {

  /** Deterministic pseudo-random hyperplane component — the same Knuth
    * multiplicative hash as Ann.planeVec, float-rounded then widened, so
    * projections match the typedLit(planeVec) dot products bit for bit.
    */
  def planeValue(j: Int, i: Int): Float =
    (((j.toLong * 64 + i + 1) * 2654435761L % 1048576L + 1048576L) % 1048576L
      / 1048576.0 - 0.5).toFloat

  def planes(n: Int): Array[Array[Float]] =
    Array.tabulate(n)(j => Array.tabulate(64)(i => planeValue(j, i)))

  /** All probe buckets; null on a null element or non-64 length mismatch
    * against the plane dimension is NOT an error (dot truncates at the
    * shorter length like a zero-pad would not — embeddings are 64-dim by
    * corpus contract; shorter vectors simply project over their prefix,
    * matching the sequential HOF dot over zip_with's null-pad ONLY when
    * lengths equal 64, which the corpus guarantees and specs pin).
    */
  def compute(x: ArrayData, planes: Array[Array[Float]], numPlanes: Int,
              numTables: Int, nProbe: Int): Array[Long] = {
    val n = x.numElements()
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    val out = new Array[Long](numTables * nProbe)
    val projs = new Array[Double](numPlanes)
    var t = 0
    while (t < numTables) {
      var b = 0L
      var j = 0
      while (j < numPlanes) {
        val plane = planes(t * numPlanes + j)
        val m = math.min(n, plane.length)
        var acc = 0.0
        var d = 0
        while (d < m) {
          acc += x.getFloat(d).toDouble * plane(d).toDouble
          d += 1
        }
        projs(j) = acc
        b = b * 2 + (if (acc > 0) 1L else 0L)
        j += 1
      }
      out(t * nProbe) = b
      if (nProbe > 1) {
        // flip order: (|proj|, bitWeight) ascending — identical to the
        // sort_array(struct(abs(p), weight)) lexicographic order
        val order = (0 until numPlanes)
          .map(j => (math.abs(projs(j)), 1L << (numPlanes - 1 - j)))
          .sorted
        var p = 1
        while (p < nProbe) {
          out(t * nProbe + p) = b ^ order(p - 1)._2
          p += 1
        }
      }
      t += 1
    }
    out
  }
}

object LshExpressions {
  /** Column wrapper: all `numTables * nProbe` probe buckets of `e`. */
  def lshAllProbes(e: Column, numPlanes: Int, numTables: Int,
                   nProbe: Int): Column =
    GraftBridge.column(LshProbeBuckets(
      GraftBridge.expression(e), numPlanes, numTables, nProbe))
}
