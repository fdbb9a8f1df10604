package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QueryCatalog

/** Smoke: every declared query runs on sf0.001 and yields rows; names unique;
  * oracle coverage documented. (Value-level correctness is the DuckDB gate,
  * replicated locally by tools/oracle_check.py.)
  */
class QueryCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("query names are unique") {
    val names = QueryCatalog.all.map(_.name)
    assert(names.distinct.length == names.length)
  }

  test("non-oracle queries are the documented hash-based/typed exceptions") {
    val noOracle = QueryCatalog.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == Set("x2_minhash_lsh", "dd_simhash", "sim_ann_lsh",
      "sim_ann_ivf", "sim_ann_ivf2", "sim_semantic_dedup",
      "mm_decode_features", "mm_resize", "a8_approx_distinct",
      "dd_lang_sketch", "dd_cluster_lsh", "x11_cms_heavy_hitters",
      "a18_approx_percentile"))
  }

  /** Frozen entries whose CORRECT result is zero rows — currently only
    * fz10012, the v18 subquery-level all-rows-vanish pin (`NOT IN` against
    * a subquery that always contains a NULL). The rows>0 rule guards
    * against accidentally-empty frozen picks; these are empty BY DESIGN
    * and the emptiness itself is the pinned semantics.
    */
  private val emptyByDesign = Set("fz10012")

  QueryCatalog.all.foreach { q =>
    if (emptyByDesign(q.name))
      test(s"${q.name} runs on sf0.001 and returns ZERO rows (vanish pin)") {
        assert(q.build(spark, TestSpark.sf0001).count() == 0,
          s"${q.name} is the all-rows-vanish pin; rows appearing means the " +
            "NOT IN three-valued semantics broke")
      }
    else
      test(s"${q.name} runs on sf0.001 and returns rows") {
        val n = q.build(spark, TestSpark.sf0001).count()
        assert(n > 0, s"${q.name} returned no rows")
      }
  }

  test("SparkEntry.entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Dtype-parity lint (r12 tpch_q12 bug class): DuckDB types
    * `sum(INTEGER)` as HUGEINT (int128) while Spark emits BIGINT, so the
    * driver's typed hasher diverges even when every value is identical.
    * Rule: every `sum(` in shared oracle SQL must either be wrapped
    * `CAST(sum(…) AS …)` or carry an inner `CAST(…)` in its argument that
    * fixes the aggregate's type identically in both engines. `count(*)` is
    * BIGINT in both and needs no cast.
    */
  test("every sum() in oracle SQL is explicitly cast (HUGEINT-vs-BIGINT guard)") {
    def sumSites(sql: String): Seq[(String, Boolean)] = {
      val up = sql.toUpperCase
      val out = Seq.newBuilder[(String, Boolean)]
      var i = up.indexOf("SUM(")
      while (i >= 0) {
        val wordBefore = i > 0 && (up(i - 1).isLetterOrDigit || up(i - 1) == '_')
        if (!wordBefore) {
          var depth = 0; var j = i + 3; var end = -1
          while (end < 0 && j < sql.length) {
            if (sql(j) == '(') depth += 1
            else if (sql(j) == ')') { depth -= 1; if (depth == 0) end = j }
            j += 1
          }
          val arg = if (end > 0) sql.substring(i + 4, end) else sql.substring(i + 4)
          val before = up.substring(0, i).reverse.dropWhile(_.isWhitespace)
          val wrapped = before.startsWith("(TSAC") // "CAST(" reversed
          out += ((arg, wrapped))
        }
        i = up.indexOf("SUM(", i + 4)
      }
      out.result()
    }
    val bad = for {
      q <- QueryCatalog.all
      sql <- q.oracle.toSeq
      (arg, wrapped) <- sumSites(sql)
      if !wrapped && !arg.toUpperCase.contains("CAST(")
    } yield s"${q.name}: sum(${arg.take(80)})"
    assert(bad.isEmpty,
      s"uncast sum() aggregates in shared oracle SQL (DuckDB would type " +
        s"them HUGEINT, Spark BIGINT/DECIMAL — driver hash diverges):\n" +
        bad.mkString("\n"))
  }

  /** Decimal-surface lint (r13 v27 bug class, the rendering layer below
    * r12's type-parity): the driver's typed hasher renders trailing-zero
    * DECIMAL cells through a shortest-repr float path on one side and a
    * scale-preserving path on the other, so a DECIMAL-typed result column
    * hash-diverges on the first `x.00`/`x.50` value even when every value
    * and dtype is engine-identical (27/28 frozen v27 seeds, r13). Rule: no
    * declared query's RESULT schema may contain DecimalType — decimal
    * arithmetic is fine inside a plan, but the rendered surface must be
    * DOUBLE, STRING, or integral.
    */
  test("no declared query renders a DECIMAL-typed result column (driver hasher guard)") {
    import org.apache.spark.sql.types.DecimalType
    val bad = QueryCatalog.all.flatMap { q =>
      q.build(spark, TestSpark.sf0001).schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] =>
          s"${q.name}.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty,
      "DECIMAL-typed result columns (driver hash diverges on trailing-zero " +
        "rendering — cast the surface to DOUBLE/STRING):\n" + bad.mkString("\n"))
  }
}
