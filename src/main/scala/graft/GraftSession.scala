package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the test rig (local[32], 128 GiB) but every setting is chosen
  * for cluster-scale semantics first:
  *
  *  - `spark.sql.ansi.enabled=false`: the reference's load path never errors
  *    on a bad value — `SAFE_CAST` turns it into NULL
  *    (reference `big_uery_handler.py:32-42`). Non-ANSI cast is the engine-wide
  *    equivalent; individual queries additionally use `try_cast` so they stay
  *    correct even under an ANSI session.
  *  - AQE on (default in Spark 4): runtime coalescing of shuffle partitions,
  *    skew-join splitting, and dynamic broadcast conversion are exactly the
  *    re-planning we want at 100 TB where static stats are stale.
  *  - `spark.sql.shuffle.partitions=32` locally; on a real cluster this is
  *    superseded by AQE's coalescing from
  *    `spark.sql.adaptive.coalescePartitions.initialPartitionNum`.
  *  - UTC session TZ: deterministic date/timestamp rendering against the
  *    DuckDB oracle; corpus timestamps are NTZ so they never shift anyway.
  */
object GraftSession {
  def cpus(defaultCpus: String = "32"): String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)

  def builder(appName: String, defaultCpus: String = "32"): SparkSession.Builder = {
    val n = cpus(defaultCpus)
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // ansi=false drags in legacy sizeOfNull (size(NULL) = -1), which would
      // silently diverge from the DuckDB oracle's NULL on null arrays —
      // e.g. a PERMISSIVE-ingested null text row would count -1 tokens.
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet stores ts as TIMESTAMP(NANOS) which the Spark reader
      // rejects; read as epoch-nanos Long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark 4 SQL scripting (BEGIN…END control flow) — r11_sql_script
      .config("spark.sql.scripting.enabled", "true")
      // NOT IN (subquery) plans as a null-aware anti join; by default Spark
      // executes that as BroadcastNestedLoopJoin — O(fact × dim) looping
      // lookup, the one quadratic plan in the engine (fz11051: 2.7 s at
      // sf0.1 against a 15k-row dim; unusable against a real dimension at
      // 100 TB). This flag re-plans single-column NAAJ into
      // BroadcastHashJoin with isNullAwareAntiJoin=true — O(fact) hash
      // lookups, same three-valued semantics. The extraction only fires on
      // the exact shape Or(EqualTo(fk,v), IsNull(EqualTo(fk,v))): SQL-text
      // NOT IN rewrites to it, and since r13 the fuzz DF renderings emit it
      // too (FuzzGen.notInAntiCond) — except the one frozen
      // expanded-condition contrast seed (fz10012), which deliberately
      // keeps the un-extracted BNLJ form pinned in plan_signatures.tsv.
      // Validated by the v18/v19 NOT-IN fuzz slices' oracle pins (the
      // grammar exists precisely to catch a semantic drift here).
      .config("spark.sql.optimizeNullAwareAntiJoin", "true")
      .config("spark.ui.enabled", "false")
  }

  def getOrCreate(appName: String = "graft", defaultCpus: String = "32"): SparkSession = {
    val spark = builder(appName, defaultCpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)
    graft.plans.LevenshteinBandRule.install(spark)
    graft.plans.ParseReuseRules.install(spark)
    spark
  }
}
