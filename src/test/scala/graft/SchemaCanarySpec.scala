package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-corpus schema canary — the generalization of CorpusVintageSpec's
  * events lesson (r9: the driver regenerated testdata with a different
  * physical ts encoding and 19 queries died at analysis, diagnosed a round
  * late). Pins the NORMALIZED schema of every table the engine reads, so
  * the next silent regeneration — a re-encoded timestamp, a widened int, a
  * renamed or added column — fails HERE with the table named, not as a
  * scatter of downstream analysis errors.
  *
  * Regenerate the pins after a DELIBERATE corpus change:
  * `Test/runMain graft.tools.SchemaDump`, then review the diff — column
  * type changes usually also demand a look at the literal pools in
  * `fuzz.FuzzGen.catalog` and the caveats in FIXTURES.md §B.
  */
class SchemaCanarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val expected: Map[String, String] = Map(
    "region" -> "r_regionkey:INT,r_name:STRING",
    "nation" -> "n_nationkey:INT,n_name:STRING,n_regionkey:INT",
    "customer" ->
      "c_custkey:BIGINT,c_name:STRING,c_nationkey:INT,c_acctbal:DOUBLE,c_mktsegment:STRING",
    "supplier" -> "s_suppkey:BIGINT,s_name:STRING,s_nationkey:INT,s_acctbal:DOUBLE",
    "part" ->
      "p_partkey:BIGINT,p_name:STRING,p_brand:STRING,p_type:STRING,p_size:INT,p_retailprice:DOUBLE",
    "orders" ->
      "o_orderkey:BIGINT,o_custkey:BIGINT,o_orderstatus:STRING,o_totalprice:DOUBLE,o_orderdate:TIMESTAMP_NTZ,o_orderpriority:STRING",
    "lineitem" ->
      "l_orderkey:BIGINT,l_partkey:BIGINT,l_suppkey:BIGINT,l_linenumber:INT,l_quantity:DOUBLE,l_extendedprice:DOUBLE,l_discount:DOUBLE,l_tax:DOUBLE,l_returnflag:STRING,l_linestatus:STRING,l_shipdate:TIMESTAMP_NTZ",
    // post-normalization (Tables.events): both physical ts vintages land here
    "events" ->
      "event_id:BIGINT,ts:TIMESTAMP_NTZ,user_id:BIGINT,event_type:STRING,value:DOUBLE,props:STRING,ts_ns:BIGINT",
    "documents" -> "doc_id:BIGINT,text:STRING,lang:STRING,source:STRING,n_chars:BIGINT",
    "embeddings" -> "vec_id:BIGINT,embedding:ARRAY<FLOAT>,label:INT")

  Tables.all.foreach { t =>
    test(s"corpus table $t keeps its pinned schema") {
      val got = graft.tools.SchemaDump.render(
        Tables.loadNormalized(spark, TestSpark.sf0001, t))
      assert(got == expected(t),
        s"$t schema drifted — corpus regenerated? Review FIXTURES.md §B, " +
          "fuzz literal pools, and rerun Test/runMain graft.tools.SchemaDump")
    }
  }

  test("every corpus table is pinned (no table added without a canary)") {
    assert(Tables.all.toSet == expected.keySet)
  }

  /** Columns the engine RELIES on being unique — window ORDER BY keys in
    * the frozen fuzz seeds (FuzzGen.uniqueKeys) and FK-edge PKs. A corpus
    * regeneration that introduces duplicates would not change any schema,
    * but would make row_number/lag/lead/running-sum over these keys
    * tie-break-dependent and silently diverge between engines — fail HERE
    * with the key named instead.
    */
  private val uniqueCols: Map[String, String] = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "events" -> "event_id", "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  uniqueCols.foreach { case (t, k) =>
    test(s"corpus key $t.$k is still unique") {
      val df = Tables.loadNormalized(spark, TestSpark.sf0001, t)
      val total = df.count()
      val distinct = df.select(k).distinct().count()
      assert(total == distinct,
        s"$t.$k has duplicates ($distinct distinct of $total rows) — " +
          "window-function fuzz seeds ordering by it are no longer " +
          "deterministic; corpus regenerated?")
    }
  }

  /** Derived-CTE invariants for tpch q12/q21 (r12 verdict item #8): the
    * lineitemx CTE's commit/receipt/shipmode columns are hash-modulo
    * derivations of (l_orderkey, l_linenumber), so q12's conditional
    * counts and q21's waiting predicate are CORPUS-CONSTRUCTION-dependent.
    * Under uniform key hashes the exact weights are: early-commit
    * (ship < commit) = 30/60 = 0.500; late (receipt > commit) =
    * 0.5 + 0.5·(435/900) ≈ 0.742; MAIL|SHIP = 2/7 ≈ 0.286; the q12 filter
    * band (ship < commit < receipt) ≈ 0.242. Measured at sf0.001/0.01/0.1:
    * 0.496-0.501 / 0.738-0.744 / 0.275-0.286 / 0.239-0.241. A corpus
    * regeneration that shifts the key ranges (e.g. sparse or re-based
    * orderkeys) would silently re-weight q12's output through these
    * hashes — fail HERE with the drifted fraction named instead.
    */
  test("lineitemx derived-CTE weighting bands hold (q12/q21 canary)") {
    Tables.load(spark, TestSpark.sf0001, "lineitem")
      .createOrReplaceTempView("lineitem")
    val r = spark.sql(
      s"""WITH ${graft.queries.TpchQueries.lxCte}
         |SELECT
         |  avg(CASE WHEN l_shipdate < l_commitdate THEN 1.0 ELSE 0.0 END) AS early,
         |  avg(CASE WHEN l_receiptdate > l_commitdate THEN 1.0 ELSE 0.0 END) AS late,
         |  avg(CASE WHEN l_shipmode IN ('MAIL','SHIP') THEN 1.0 ELSE 0.0 END) AS mailship,
         |  avg(CASE WHEN l_shipdate < l_commitdate
         |       AND l_commitdate < l_receiptdate THEN 1.0 ELSE 0.0 END) AS q12band
         |FROM lineitemx""".stripMargin).collect()(0)
    def in(name: String, v: Double, lo: Double, hi: Double): Unit =
      assert(v >= lo && v <= hi,
        s"lineitemx $name fraction $v outside [$lo, $hi] — corpus key " +
          "ranges shifted; q12/q21 weights silently changed (see " +
          "TpchQueries.lxCte scaladoc)")
    in("early-commit", r.getDecimal(0).doubleValue(), 0.45, 0.55)
    in("late-receipt", r.getDecimal(1).doubleValue(), 0.69, 0.79)
    in("MAIL|SHIP", r.getDecimal(2).doubleValue(), 0.24, 0.33)
    in("q12-filter-band", r.getDecimal(3).doubleValue(), 0.19, 0.29)
  }
}
