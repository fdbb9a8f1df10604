package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Ingest
import graft.queries.QueryCatalog

/** Plan-shape guarantees, asserted — not just documented. Each test pins one
  * of the scale properties the engine is designed around; a regression that
  * silently drops pushdown, pruning, or a broadcast shows up here, not in a
  * 100 TB bill.
  */
class PlanAssertionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = TestSpark.sf0001

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("filter pushdown reaches the parquet scan") {
    val df = Tables.orders(spark, d).where(col("o_orderkey") < 100)
      .select("o_orderkey", "o_totalprice")
    val p = plan(df)
    assert(p.contains("PushedFilters:") &&
      p.contains("LessThan(o_orderkey,100)"), s"no pushed filter in:\n$p")
  }

  test("events filters push to the parquet scan on the native-NTZ vintage") {
    // On the legacy NANOS vintage every events column rode below a ts
    // conversion Project, but predicates on UNTOUCHED columns still pushed;
    // on the MICROS vintage (live corpus) ts itself is scan-native too.
    // Lock in both: event_type equality reaches PushedFilters, and the
    // ts_ns derivation doesn't block pruning of unused columns.
    val df = Tables.events(spark, d)
      .where(col("event_type") === "purchase")
      .select("event_id", "user_id")
    val p = plan(df)
    assert(p.contains("EqualTo(event_type,purchase)"),
      s"event_type filter not pushed to scan:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.nonEmpty, s"no ReadSchema line in formatted plan:\n$p")
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"events scan reads unprojected columns: $readSchema")
  }

  test("column pruning: scan reads only the projected columns") {
    val df = Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
    val p = plan(df)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.nonEmpty, s"no ReadSchema line in formatted plan:\n$p")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"scan reads unprojected columns: $readSchema")
  }

  test("partition pruning on Ingestion_date-partitioned ingested tables") {
    val dir = Files.createTempDirectory("graft-prune")
    Files.writeString(dir.resolve("prune_t.csv"),
      "id,v\n1,a\n2,b\n")
    Ingest.ingestFile(spark, dir.resolve("prune_t.csv").toString,
      Date.valueOf("2026-08-10"))
    Files.writeString(dir.resolve("prune_t.csv"), "id,v\n3,c\n")
    Ingest.ingestFile(spark, dir.resolve("prune_t.csv").toString,
      Date.valueOf("2026-08-11"))
    val df = spark.table("prune_t").where(col("Ingestion_date") === lit("2026-08-11"))
    assert(df.count() == 1)
    val p = plan(df)
    // the date predicate must land in PartitionFilters (metadata-only prune),
    // not in PushedFilters/post-scan Filter
    val pf = p.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("Ingestion_date"), s"no partition filter in:\n$p")
    spark.sql("DROP TABLE prune_t")
  }

  test("j2 plans a broadcast hash join, not a shuffle join") {
    val p = plan(QueryCatalog.byName("j2_join_broadcast").build(spark, d))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected sort-merge join in:\n$p")
  }

  test("j3 joins the dimensions by broadcast, never by shuffling a dimension") {
    val p = plan(QueryCatalog.byName("j3_join_multiway").build(spark, d))
    // customer/nation/region must ride broadcasts; at sf0.001 even
    // lineitem⋈orders broadcasts (4 total), at scale it becomes the plan's
    // single shuffle join — either is correct, a shuffled dimension is not
    assert(p.split("BroadcastHashJoin").length >= 4, s"missing broadcasts in:\n$p")
    assert(p.split("SortMergeJoin").length <= 2, s">1 shuffle join in:\n$p")
  }

  test("a1 aggregation is partial+final (map-side combine)") {
    val p = plan(QueryCatalog.byName("a1_agg_pricing").build(spark, d))
    assert(p.split("HashAggregate").length >= 3,
      s"expected partial and final HashAggregate in:\n$p")
  }

  test("tq_redact_pii is a shuffle-free projection (scrub scales as a map)") {
    val df = QueryCatalog.byName("tq_redact_pii").build(spark, d)
    // drop the final presentation ORDER BY: the operator under test is the
    // scrub projection, which must introduce no exchange of its own
    val scrub = df.queryExecution.analyzed match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort =>
        org.apache.spark.sql.GraftBridge.dataset(spark, s.child)
      case _ => df
    }
    val p = plan(scrub)
    assert(!p.contains("Exchange"), s"PII scrub must not shuffle:\n$p")
  }

  test("tq_top_word_ratio aggregates partial+final at both levels, no window") {
    val p = plan(QueryCatalog.byName("tq_top_word_ratio").build(spark, d))
    assert(p.split("HashAggregate").length >= 5,
      s"expected partial+final HashAggregate at (doc,tok) and (doc) levels:\n$p")
    assert(!p.contains("Window"), s"repetition gate must not use a window:\n$p")
  }

  test("o2 top-k per group gets the rank-limit pushdown (WindowGroupLimit)") {
    val p = plan(QueryCatalog.byName("o2_topk_per_group").build(spark, d))
    // Spark 3.5+ InferWindowGroupLimit turns rank<=k filters into a
    // per-partition top-k before the full window sort — the difference
    // between sorting every group and keeping k rows per group at 100 TB
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("AQE finalizes and coalesces the shuffle at runtime") {
    val df = QueryCatalog.byName("j1_join_inner").build(spark, d)
    df.collect() // execute THIS QueryExecution (a write plans its own)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), s"AQE did not finalize:\n$p")
    // at sf0.001 the tiny shuffles must be coalesced below the static 4
    assert(p.contains("AQEShuffleRead coalesced") || p.contains("coalesced"),
      s"AQE did not coalesce partitions:\n$p")
  }

  test("native vector expressions stay inside WholeStageCodegen") {
    val df = Tables.embeddings(spark, d).select(
      graft.expressions.VectorExpressions.dotF(col("embedding"), col("embedding"))
        .as("selfdot"))
    val p = plan(df)
    // FormattedMode marks codegen'd operators with `[codegen id : N]`; the
    // Project evaluating the expression must carry one
    val projLine = p.linesIterator.find(l =>
      l.contains("Project") && l.contains("codegen id")).getOrElse("")
    assert(projLine.nonEmpty, s"expression Project not codegen'd in:\n$p")
    assert(p.contains("float_vector_dot"), s"expression missing from plan:\n$p")
    assert(!p.contains("CodegenFallback"), s"codegen fallback in:\n$p")
  }
}
