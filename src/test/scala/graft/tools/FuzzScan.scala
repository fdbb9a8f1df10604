package graft.tools

import graft.GraftSession
import graft.fuzz.FuzzGen

/** Scratch scanner (test scope, not shipped): prints shape + row counts at
  * sf0.001/sf0.01 for a seed range of a grammar version, so fz* oracle
  * seeds can be picked for shape diversity AND non-emptiness before
  * freezing them in FuzzQueries.
  */
object FuzzScan {
  def main(args: Array[String]): Unit = {
    val version = if (args.length > 0) args(0).toInt else 2
    val from = if (args.length > 1) args(1).toInt else 301
    val to = if (args.length > 2) args(2).toInt else 360
    val spark = GraftSession.getOrCreate("fuzz-scan")
    (from to to).foreach { seed =>
      val q = FuzzGen.query(seed, version)
      val shape =
        // pad to the longest tag without truncating (ADVICE r11: padTo+take
        // rendered distinct long tags identically in the scan listing)
        if (q.mode.nonEmpty) q.mode.padTo(24, ' ')
        else if (q.sql.contains("NOT EXISTS")) "ANTI "
        else if (q.sql.contains("EXISTS (SELECT ")) "EXIST"
        else if (q.sql.contains(" IN (SELECT ")) "INSUB"
        else if (Seq("(SELECT min(", "(SELECT max(", "(SELECT avg(")
          .exists(q.sql.contains)) "SCALR"
        else if (q.sql.contains(") d JOIN ")) "DERIV"
        else if (q.sql.contains(" OVER (")) "WIN  "
        else if (Seq("UNION ALL", "INTERSECT", "EXCEPT").exists(q.sql.contains)) "SETOP"
        else "V1   "
      val n1 = q.build(spark, "/root/testdata/sf0.001").count()
      val n2 = q.build(spark, "/root/testdata/sf0.01").count()
      println(f"$seed%4d $shape rows(sf0.001)=$n1%6d rows(sf0.01)=$n2%6d ${q.sql.take(200)}")
    }
    spark.stop()
  }
}
