package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for float-vector math — the (b)-tier custom
  * extension from the design doctrine: a scalar function Spark's built-ins
  * can only express as interpreted HOFs (`zip_with`+`aggregate` never enter
  * whole-stage codegen and re-evaluate inlined inputs per lambda).
  *
  * `doGenCode` emits a tight primitive loop over the unsafe array data, so
  * vector similarity stays inside WholeStageCodegen. The accumulation order
  * is strictly sequential from 0.0 — bit-identical to the HOF form and to
  * the DuckDB oracle's `list_reduce`, so swapping implementations never
  * moves a hash-compared result.
  */
case class FloatVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  // Reject non-float arrays at analysis time: the eval/codegen paths read
  // UnsafeArrayData with a 4-byte getFloat stride, which would silently
  // return garbage over array<double>/array<int> inputs. (ExpectsInputTypes
  // is unusable outside org.apache.spark.sql: AbstractDataType is
  // private[sql], so we implement the public checkInputDataTypes hook.)
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkFloatArrays(prettyName, left.dataType, right.dataType)
  override def dataType: DataType = DoubleType
  // Can produce null even over non-null array columns (null *elements* poison
  // the sum), so nullability does not derive from the children. Also keeps
  // ev.isNull a real variable in codegen rather than the literal `false`.
  override def nullable: Boolean = true
  override def prettyName: String = "float_vector_dot"

  // Null semantics mirror the HOF form exactly: a null element poisons the
  // sum (`acc + null`), and mismatched lengths are null too — zip_with
  // null-pads the shorter array, so its products (and the fold) go null.
  // Truncating to the shorter prefix would return a plausible-looking wrong
  // similarity instead.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |double ${ev.value}_acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${ev.value}_acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a float vector: sqrt of the sequential sum of squares. */
case class FloatVectorNorm(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkFloatArrays(prettyName, child.dataType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_vector_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |double ${ev.value}_acc = 0.0;
         |boolean ${ev.value}_sawNull = false;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { ${ev.value}_sawNull = true; break; }
         |  double $v = (double) $a.getFloat($i);
         |  ${ev.value}_acc += $v * $v;
         |}
         |${ev.isNull} = ${ev.value}_sawNull;
         |${ev.value} = java.lang.Math.sqrt(${ev.value}_acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {

  /** Analysis-time gate shared by the vector expressions: every input must be
    * `array<float>` (any element nullability — null elements are handled at
    * eval time by poisoning the result to null). `ExpectsInputTypes` can't be
    * used from outside `org.apache.spark.sql` (`AbstractDataType` is
    * `private[sql]`), so this implements the public `checkInputDataTypes`
    * hook directly.
    */
  def checkFloatArrays(fn: String, types: DataType*): TypeCheckResult = {
    val bad = types.zipWithIndex.collectFirst {
      case (t, i) if (t match {
        case ArrayType(FloatType, _) => false  // any containsNull
        case _                       => true
      }) => (t, i)
    }
    bad match {
      case Some((t, i)) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn requires array<float> arguments, but argument ${i + 1} is ${t.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  def dotF(a: Column, b: Column): Column =
    GraftBridge.column(FloatVectorDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def normF(a: Column): Column =
    GraftBridge.column(FloatVectorNorm(GraftBridge.expression(a)))

  def cosineF(a: Column, b: Column): Column = dotF(a, b) / (normF(a) * normF(b))
}
