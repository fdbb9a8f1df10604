package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fuzz.FuzzGen

/** Random differential testing (round-6 verdict item #2): seeded generated
  * relational queries, each rendered twice from one draw — a DataFrame-API
  * plan built from Column operators and the equivalent SQL text — must
  * produce identical rows. Two independent construction paths through
  * parser/analyzer/optimizer are the tier of correctness evidence above the
  * hand-declared 132: a bug in either rendering, in the generator's
  * determinism discipline (total ORDER BY, NULLS FIRST, no float
  * accumulation), or in an optimizer rule that only fires on one plan shape
  * shows up as a row diff with the seed to reproduce it.
  *
  * The cross-ENGINE differential for the same grammar is driver-run: the
  * fz* entries in FuzzQueries are fixed seeds whose SQL goes to DuckDB via
  * oracle_sql.json.
  */

/** Shared harness for the three FuzzSpec slices (r19, verdict #5: the
  * single 41-test suite was the test wall's long pole at ~21-33 min; three
  * slices run concurrently in their own forked JVMs — see build.sbt
  * testGrouping). Holds the session and the temp views every grammar
  * draws from; `views` is idempotent (createOrReplaceTempView), so slices
  * sharing a JVM would also be safe.
  */
trait FuzzSpecBase extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  protected lazy val views: Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t =>
        Tables.load(spark, TestSpark.sf0001, t).createOrReplaceTempView(t))
    // v6 draws events; the view is the NORMALIZED table (vintage-adaptive
    // ts — see Tables.events) so spark.sql sees the same relation the
    // DF-API build reads. DuckDB reads the raw parquet and agrees on
    // values because micros survive both paths exactly.
    Tables.events(spark, TestSpark.sf0001).createOrReplaceTempView("events")
    // v7 draws documents (plain scan, no normalization)
    Tables.load(spark, TestSpark.sf0001, "documents")
      .createOrReplaceTempView("documents")
    // v16 draws the embeddings-derived "emb" view; the spark.sql rendering
    // references the raw embeddings table inside its derived subquery
    Tables.load(spark, TestSpark.sf0001, "embeddings")
      .createOrReplaceTempView("embeddings")
  }
}
