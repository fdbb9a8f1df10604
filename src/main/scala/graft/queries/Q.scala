package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query (SURVEY §2.11): a Spark build function plus, when the
  * semantics are SQL-expressible, the equivalent DuckDB oracle SQL the driver
  * hash-compares against.
  *
  * Determinism contract (SURVEY §2.11 preamble) every query obeys:
  *  - ends in a total-order ORDER BY with explicit NULL placement on the
  *    oracle side (Spark's `asc` = NULLS FIRST, `desc` = NULLS LAST; DuckDB
  *    defaults differ, so the SQL always spells it out);
  *  - double aggregations go through DECIMAL so the sum is exact and
  *    independent of partition/accumulation order, then cast back to DOUBLE
  *    and `round(_, 4)`;
  *  - integer outputs are BIGINT on both sides;
  *  - per-element float folds use sequential semantics on both sides
  *    (Spark `aggregate` HOF vs DuckDB `list_reduce`) so IEEE addition order
  *    is identical.
  */
final case class Q(
    name: String,
    doc: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryCatalog {
  lazy val all: Seq[Q] =
    RefQueries.defs ++
      RelationalQueries.defs ++
      FunctionQueries.defs ++
      StreamEquivQueries.defs ++
      TextQueries.defs ++
      DedupQueries.defs ++
      SimilarityQueries.defs ++
      MultimodalQueries.defs ++
      AdvancedQueries.defs ++
      ExtendedQueries.defs ++
      Round4Queries.defs ++
      Round4bQueries.defs ++
      TpchQueries.defs ++
      FuzzQueries.defs ++
      StreamFuzzQueries.defs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
