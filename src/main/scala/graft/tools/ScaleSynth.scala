package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Synthesize an sf1-scale corpus from sf0.1 for the one-off scaling
  * window (r19, verdict #9: "sf0.1's 0.25 s-median entries cannot show
  * scaling"). No sf1 dataset ships with the rig, so this unions K
  * key-shifted copies of every sf0.1 table: each copy's keys are offset by
  * i * span so copies are join-consistent internally and disjoint across
  * copies — join fan-outs, group cardinalities per dimension value, and
  * per-row payloads all scale linearly, which is what a throughput scaling
  * measurement needs. Dimension-leaf tables (nation, region) are NOT
  * scaled: they are bounded in any real deployment. Output is plain
  * parquet laid out exactly like a testdata sf dir, so Bench runs against
  * it via SPARK_GRAFT_SF_DIR unmodified.
  *
  * Usage: runMain graft.tools.ScaleSynth <srcSfDir> <outDir> [copies=10]
  * Measurement-only: never part of any declared query or bench default.
  */
object ScaleSynth {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sfsynth1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.getOrCreate("graft-scale-synth")

    /** Union `copies` copies of `df` with every column in `keys` shifted by
      * i * (its max + 1) so the copies are key-disjoint.
      */
    def scaled(df: DataFrame, keys: Seq[String]): DataFrame = {
      val spans: Map[String, Long] = keys.map { k =>
        k -> (df.agg(max(col(k).cast("long"))).collect()(0).getLong(0) + 1L)
      }.toMap
      (0 until copies).map { i =>
        keys.foldLeft(df) { (d, k) =>
          // cast back so the synthetic schema is byte-identical to the source
          d.withColumn(k,
            (col(k) + lit(i * spans(k))).cast(df.schema(k).dataType))
        }
      }.reduce(_ unionAll _)
    }

    val plan: Seq[(String, Seq[String])] = Seq(
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "customer" -> Seq("c_custkey"),
      "part" -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "nation" -> Nil,
      "region" -> Nil)

    plan.foreach { case (t, keys) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val outDf = if (keys.isEmpty) df else scaled(df, keys)
      outDf.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      println(s"[scale-synth] $t: ${outDf.count()} rows")
    }
    spark.stop()
  }
}
