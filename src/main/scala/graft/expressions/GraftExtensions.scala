package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of the native vector expressions as SQL functions.
  *
  * Two routes:
  *  - `GraftExtensions` for config-time injection
  *    (`spark.sql.extensions=graft.expressions.GraftExtensions`) — the
  *    deployment-grade SparkSessionExtensions path;
  *  - `GraftFunctions.register(spark)` for an already-built session (what
  *    GraftSession does), so `spark.sql("SELECT float_vector_dot(a, b)")`
  *    works everywhere including the Verify/Bench entry points.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBandRule)
  }
}

object GraftFunctions {
  type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def arity(name: String, expected: Int)(
      args: Seq[Expression]): Seq[Expression] = {
    if (args.length != expected) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> expected.toString,
          "actualNum" -> args.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    }
    args
  }

  val descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("float_vector_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "float_vector_dot"),
      (args: Seq[Expression]) => {
        val a = arity("float_vector_dot", 2)(args); FloatVectorDot(a(0), a(1))
      }),
    (FunctionIdentifier("float_vector_norm"),
      new ExpressionInfo(classOf[FloatVectorNorm].getName, "float_vector_norm"),
      (args: Seq[Expression]) => {
        val a = arity("float_vector_norm", 1)(args); FloatVectorNorm(a.head)
      }),
    (FunctionIdentifier("cms_estimate_count"),
      new ExpressionInfo(classOf[CmsEstimateCount].getName, "cms_estimate_count"),
      (args: Seq[Expression]) => {
        val a = arity("cms_estimate_count", 2)(args); CmsEstimateCount(a(0), a(1))
      })
  )

  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, id, info, builder)
    }
}
