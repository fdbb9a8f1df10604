package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The engine's SQL face: corpus tables registered as views are queryable
  * through spark.sql with identical results to the DataFrame forms, and the
  * native vector expressions resolve from the FunctionRegistry — a user can
  * drive the whole declared surface from SQL alone.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = TestSpark.sf0001

  private def registerViews(): Unit =
    Tables.all.foreach { t =>
      // loadNormalized, not load: the SQL face must expose the ENGINE's
      // declared schema (events normalized to ts TIMESTAMP_NTZ + ts_ns),
      // not whatever physical encoding the corpus vintage shipped
      Tables.loadNormalized(spark, d, t).createOrReplaceTempView(t)
    }

  test("SQL and DataFrame forms of an aggregation query agree row-for-row") {
    registerViews()
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect()
    val df = Tables.lineitem(spark, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast("decimal(38,6)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(sql.toSeq == df.toSeq)
  }

  test("SQL join + window over views matches the DataFrame form") {
    registerViews()
    val sql = spark.sql(
      """SELECT o_orderkey, rn FROM (
        |  SELECT o_orderkey, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2 ORDER BY o_orderkey""".stripMargin).collect()
    assert(sql.nonEmpty)
    assert(sql.forall(_.getInt(1) <= 2))
  }

  test("native vector functions are callable from SQL") {
    registerViews()
    val rows = spark.sql(
      """SELECT vec_id,
        |  float_vector_dot(embedding, embedding) AS selfdot,
        |  float_vector_norm(embedding) AS norm
        |FROM embeddings ORDER BY vec_id LIMIT 10""".stripMargin).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (dot, norm) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(math.sqrt(dot) - norm) < 1e-9)
    }
  }

  test("GraftExtensions injects the functions at session build (deployment path)") {
    import org.apache.spark.sql.SparkSession
    val base = spark // force TestSpark init first
    // getOrCreate reuses the active/default session (whose registry already
    // has the functions) — clear both so the builder genuinely constructs a
    // NEW session over the shared SparkContext, applying the extensions;
    // restore the shared session afterwards.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.expressions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne base, "builder must have created a fresh session")
      val r = s2.sql(
        "SELECT float_vector_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
        .collect()(0).getDouble(0)
      assert(math.abs(r - 5.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("SQL type check rejects non-float arrays for vector functions") {
    registerViews()
    val e = intercept[Exception] {
      spark.sql("SELECT float_vector_norm(array(1.0, 2.0))").collect()
    }
    assert(e.getMessage.contains("array<float>"))
  }

  test("cms_estimate_count is callable from SQL against a built sketch") {
    registerViews()
    // build a sketch over document tokens, probe it from pure SQL
    val bytes = spark.sql(
      """SELECT count_min_sketch(tok, CAST(0.001 AS DOUBLE),
        |  CAST(0.99 AS DOUBLE), 42) FROM (
        |  SELECT explode(split(text, ' ')) AS tok FROM documents)""".stripMargin)
      .head().getAs[Array[Byte]](0)
    spark.range(1).createOrReplaceTempView("one")
    val hex = bytes.map(b => f"$b%02x").mkString
    val est = spark.sql(
      s"SELECT cms_estimate_count(unhex('$hex'), 'the') FROM one")
      .head().getLong(0)
    val exact = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT explode(split(text, ' ')) AS tok FROM documents)
        |WHERE tok = 'the'""".stripMargin).head().getLong(0)
    assert(est >= exact, "CMS must never undercount")
    // sketch is foldable-literal-gated: a non-constant first arg is rejected
    val e = intercept[Exception] {
      spark.sql("SELECT cms_estimate_count(CAST(text AS BINARY), 'x') FROM documents")
        .collect()
    }
    assert(e.getMessage.contains("constant"))
  }
}
