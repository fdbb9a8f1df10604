package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.VectorExpressions
import graft.similarity.Ann

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val emb = Tables.embeddings(spark, TestSpark.sf0001)

  test("native dot/norm are bit-identical to the HOF reference forms") {
    val both = emb.limit(100).select(
      VectorExpressions.dotF(col("embedding"), col("embedding")).as("dot_native"),
      Ann.dot(col("embedding"), col("embedding")).as("dot_hof"),
      VectorExpressions.normF(col("embedding")).as("norm_native"),
      Ann.l2norm(col("embedding")).as("norm_hof")
    ).collect()
    both.foreach { r =>
      // exact equality, not tolerance: same IEEE op sequence by construction
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("expressions participate in whole-stage codegen") {
    val df = emb.select(VectorExpressions.dotF(col("embedding"), col("embedding")).as("d"))
    // the "*(n)" stage prefix marks operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [float_vector_dot"), plan)
  }

  test("functions are SQL-callable after registry registration") {
    graft.expressions.GraftFunctions.register(spark)
    Tables.embeddings(spark, TestSpark.sf0001).createOrReplaceTempView("emb_v")
    val viaSql = spark.sql(
      "SELECT float_vector_dot(embedding, embedding) AS d, float_vector_norm(embedding) AS n " +
        "FROM emb_v WHERE vec_id = 0").collect()(0)
    val viaApi = emb.where(col("vec_id") === 0).select(
      VectorExpressions.dotF(col("embedding"), col("embedding")),
      VectorExpressions.normF(col("embedding"))).collect()(0)
    assert(viaSql.getDouble(0) == viaApi.getDouble(0))
    assert(viaSql.getDouble(1) == viaApi.getDouble(1))
  }

  test("null vector and mismatched lengths yield null, matching the HOF form") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f, 5.0f))),
      (None: Option[Array[Float]], Some(Array(1.0f))),
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f)))
    ).toDF("a", "b")
    val out = df.select(
      VectorExpressions.dotF(col("a"), col("b")).as("native"),
      graft.similarity.Ann.dot(col("a"), col("b")).as("hof")).collect()
    // mismatched lengths: zip_with null-pads → null fold; native must agree
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).getDouble(0) == (1.0 * 3.0 + 2.0 * 4.0))
    assert(out(2).getDouble(0) == out(2).getDouble(1))
  }
}
