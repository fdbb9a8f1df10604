package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe side of the count-min sketch, as a native codegen'd expression.
  *
  * Spark ships the BUILD side (`count_min_sketch` aggregate) but no probe
  * expression — the runtime-bloom-filter pattern's `BloomFilterMightContain`
  * has no CMS sibling, so probing an aggregated sketch normally falls back
  * to a Scala UDF over a broadcast, which breaks whole-stage codegen at the
  * exact place a sketch probe wants to be cheap. This is the missing
  * sibling: the serialized sketch rides as a foldable binary literal,
  * deserialized once per task (lazy, like `BloomFilterMightContain`'s
  * filter), and `doGenCode` emits a direct `estimateCount` call on the
  * referenced sketch object.
  *
  * String hashing matches the aggregate exactly: `count_min_sketch` adds
  * UTF-8 bytes of each string, and `CountMinSketch.estimateCount(String)`
  * hashes the same UTF-8 bytes, so estimates equal what a driver-side probe
  * of the same sketch would return, bit for bit.
  */
case class CmsEstimateCount(sketchExpr: Expression, valueExpr: Expression)
  extends BinaryExpression {

  override def left: Expression = sketchExpr
  override def right: Expression = valueExpr
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!sketchExpr.foldable) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires the sketch argument to be a constant (foldable) binary")
    } else (sketchExpr.dataType, valueExpr.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (s, v) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string) arguments, got " +
          s"(${s.catalogString}, ${v.catalogString})")
    }

  // Deserialized once per expression instance (per task after plan ship),
  // not per row — the literal bytes evaluate driver-side at construction.
  @transient private lazy val sketch: CountMinSketch = {
    val bytes = sketchExpr.eval().asInstanceOf[Array[Byte]]
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(cmsBytes: Any, value: Any): Any =
    sketch.estimateCount(value.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmsRef = ctx.addReferenceObj("cmsSketch", sketch, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, v) =>
      s"${ev.value} = $cmsRef.estimateCount($v.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketchExpr = newLeft, valueExpr = newRight)
}

object SketchExpressions {

  /** `estimateCount(value)` against a serialized count-min sketch. */
  def cmsEstimate(sketchBytes: Array[Byte], value: Column): Column =
    GraftBridge.column(CmsEstimateCount(
      Literal.create(sketchBytes, BinaryType), GraftBridge.expression(value)))
}
