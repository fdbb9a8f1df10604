package graft.tools

import graft.fuzz.FuzzGen

/** Print the generated SQL for a seed range of one grammar version — the
  * seed-curation companion to [[FuzzDump]] (no Spark session; rendering a
  * GenQuery is pure). Used when swapping frozen fz* seeds: eyeball the drawn
  * shape before paying for the differential run.
  *
  * Usage: Test/runMain graft.tools.FuzzPrint <version> <from> <to> [grep]
  */
object FuzzPrint {
  def main(args: Array[String]): Unit = {
    val version = if (args.length > 0) args(0).toInt else 5
    val from = if (args.length > 1) args(1).toInt else 701
    val to = if (args.length > 2) args(2).toInt else 800
    val needle = if (args.length > 3) Some(args(3)) else None
    for (seed <- from to to) {
      val sql = FuzzGen.query(seed, version).sql
      if (needle.forall(sql.contains))
        println(s"-- seed $seed\n$sql\n")
    }
  }
}
