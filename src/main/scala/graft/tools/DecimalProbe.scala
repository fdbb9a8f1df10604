package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Measurement-only decomposition of the decimal fuzz families' cost
  * (r19, verdict #4: "attack fz19/fz23 or document the cost as the
  * exact-arithmetic contract"). Rebuilds the fz19011 / fz23071 shapes from
  * the captured plans and times structurally identical variants that peel
  * one cost layer at a time (noop sink, min-of-3):
  *
  *   fz19011 (projection seed):
  *     full     — decimal casts + decimal(38,x) arithmetic + string render,
  *                top-k sorted on the rendered strings (the declared form)
  *     nodec    — same rows/join/top-k with DOUBLE arithmetic + string
  *                render (what dropping the exact-decimal contract buys)
  *     norender — decimal arithmetic kept, sort on the numeric values
  *                (what dropping the string-render surface buys)
  *     base     — scan + broadcast join + top-k on the keys only
  *
  *   fz23071 (group seed): full (sum of decimal(10,2) -> dec(20,2) buffer)
  *     vs double sum, same grouping/top-k.
  *
  * This is not a bench surface and declares nothing; it exists so the
  * irreducibility claim in OPTIMIZATION_r19.md is a measurement, not an
  * assertion.
  */
object DecimalProbe {

  private def time(df: => DataFrame): Double = {
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-decimal-probe")

    def li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"))
    def ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    def joined = li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))

    // fz19011 shape: decimal casts as in the captured plan
    def dec = joined.select(
      col("l_orderkey").as("k0"), col("l_linenumber").as("k1"),
      col("l_quantity").cast("decimal(10,2)").as("q"),
      col("l_discount").cast("decimal(8,4)").as("d"),
      col("o_totalprice").cast("decimal(14,2)").as("p"))

    val full = () => dec.select(col("k0"), col("k1"),
        (col("p") * col("q")).cast("decimal(38,4)").cast("string").as("x0"),
        (col("p") - col("q")).cast("decimal(38,2)").cast("string").as("x1"),
        (col("p") * (lit(1) - col("d"))).cast("decimal(38,6)").cast("string").as("x2"))
      .orderBy("k0", "k1", "x0", "x1", "x2").limit(1000)

    val nodec = () => joined.select(col("l_orderkey").as("k0"),
        col("l_linenumber").as("k1"),
        (col("o_totalprice") * col("l_quantity")).cast("string").as("x0"),
        (col("o_totalprice") - col("l_quantity")).cast("string").as("x1"),
        (col("o_totalprice") * (lit(1) - col("l_discount"))).cast("string").as("x2"))
      .orderBy("k0", "k1", "x0", "x1", "x2").limit(1000)

    val norender = () => dec.select(col("k0"), col("k1"),
        (col("p") * col("q")).cast("decimal(38,4)").as("x0"),
        (col("p") - col("q")).cast("decimal(38,2)").as("x1"),
        (col("p") * (lit(1) - col("d"))).cast("decimal(38,6)").as("x2"))
      .orderBy("k0", "k1", "x0", "x1", "x2").limit(1000)

    val base = () => joined.select(col("l_orderkey").as("k0"),
        col("l_linenumber").as("k1"))
      .orderBy("k0", "k1").limit(1000)

    // fz23071 shape: group by o_totalprice, count + sum(decimal quantity)
    val aggDec = () => joined
      .select(col("l_quantity").cast("decimal(10,2)").as("q"),
        col("o_totalprice").cast("decimal(14,2)").as("p"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
      .select(col("p").cast("string").as("k0"), col("n"),
        col("s").cast("decimal(38,2)").cast("string").as("s0"))
      .orderBy("k0").limit(1000)

    val aggDbl = () => joined
      .groupBy(col("o_totalprice"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
      .select(col("o_totalprice").cast("string").as("k0"), col("n"),
        col("s").cast("string").as("s0"))
      .orderBy("k0").limit(1000)

    // warmup
    time(base())
    val results = Seq(
      "fz19011_full" -> time(full()),
      "fz19011_nodec" -> time(nodec()),
      "fz19011_norender" -> time(norender()),
      "fz19011_base" -> time(base()),
      "fz23071_full_decsum" -> time(aggDec()),
      "fz23071_doublesum" -> time(aggDbl()))
    results.foreach { case (k, v) =>
      println(f"[decimal-probe] $k%-22s ${v}%.3f s")
    }
    spark.stop()
  }
}
