package graft.tools

import graft.fuzz.StreamFuzzGen

/** Throwaway scanner for the fzst catalog tier: list v6 dedup-wide seeds
  * and their key draws so the frozen picks can be key-shape diverse.
  */
object StScan {
  def main(args: Array[String]): Unit = {
    val hi = args.headOption.map(_.toInt).getOrElse(300)
    (1 to hi).foreach { seed =>
      val g = StreamFuzzGen.query(seed, 6)
      if (g.shape == "dedup-wide")
        println(s"$seed\t${g.desc}\t${g.oracleSql.get.take(90)}")
    }
  }
}
