package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.GraftSession
import graft.fuzz.FuzzGen

/** Mass-differential dump (test scope, not shipped): renders a seed RANGE of
  * both grammar versions, writes every result to parquet and the generated
  * SQL to fuzz_sql.json, for tools/fuzz_check.py to replay in DuckDB. This
  * is the wide sweep behind the frozen fz* catalog slice: hundreds of
  * generated plans cross-checked against a second engine, not just the 22
  * declared seeds the driver sees.
  *
  * Usage: Test/runMain graft.tools.FuzzDump <sfDir> <outDir> <from> <to> [versions]
  * where [versions] is comma-separated grammar versions (default all).
  */
object FuzzDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/fuzz_dump"
    val from = if (args.length > 2) args(2).toInt else 1
    val to = if (args.length > 3) args(3).toInt else 150
    val versions =
      if (args.length > 4) args(4).split(",").toSeq.map(_.trim.toInt)
      else 1 to FuzzGen.maxVersion // derived, cannot drift (r12 advice)
    val spark = GraftSession.getOrCreate("fuzz-dump")
    val sqls = Seq.newBuilder[(String, String)]
    for (version <- versions; seed <- from to to) {
      val name = s"fz_v${version}_$seed"
      val q = FuzzGen.query(seed, version)
      q.build(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
      sqls += name -> q.sql
    }
    val json = sqls.result()
      .map { case (k, v) =>
        "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      }
      .mkString("{", ",", "}")
    Files.write(Paths.get(outDir, "fuzz_sql.json"),
      json.getBytes(StandardCharsets.UTF_8))
    println(s"dumped ${versions.size * (to - from + 1)} generated queries to $outDir")
    spark.stop()
  }
}
