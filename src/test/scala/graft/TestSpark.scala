package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all suites (local[4] keeps test latency low). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // keep in sync with GraftSession: NOT IN plans as hash-based NAAJ,
      // not BroadcastNestedLoopJoin — plan_signatures.tsv pins the result
      .config("spark.sql.optimizeNullAwareAntiJoin", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(s)
    s
  }

  val sf0001 = "/root/testdata/sf0.001"

  /** Count the Spark jobs `body` launches, via a thread-local job group —
    * suites share one session and sbt runs them in parallel, so counting
    * the global job list races. One home for the helper (it was pasted
    * into two specs before).
    */
  def countJobs(tag: String)(body: => Unit): Int = {
    spark.sparkContext.setJobGroup(tag, tag)
    try body finally spark.sparkContext.clearJobGroup()
    spark.sparkContext.statusTracker.getJobIdsForGroup(tag).length
  }
}
