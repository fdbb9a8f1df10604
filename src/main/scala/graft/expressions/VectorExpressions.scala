package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

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
  extends BinaryExpression with ExpectsInputTypes {

  // Reject non-float arrays at analysis time: the eval/codegen paths read
  // UnsafeArrayData with a 4-byte getFloat stride, which would silently
  // return garbage over array<double>/array<int> inputs.
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
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
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) {
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
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  ${ev.value}_acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt(${ev.value}_acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  def dotF(a: Column, b: Column): Column =
    GraftBridge.column(FloatVectorDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def normF(a: Column): Column =
    GraftBridge.column(FloatVectorNorm(GraftBridge.expression(a)))

  def cosineF(a: Column, b: Column): Column = dotF(a, b) / (normF(a) * normF(b))
}
