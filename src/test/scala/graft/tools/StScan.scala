package graft.tools

import graft.fuzz.StreamFuzzGen

/** Throwaway scanner for the streaming catalog tiers: list the oracle-able
  * draws of a StreamFuzzGen version (v6 dedup-wide → fzst; v1 tumbling →
  * fzsw) so the frozen picks can be shape diverse.
  */
object StScan {
  def main(args: Array[String]): Unit = {
    val hi = args.headOption.map(_.toInt).getOrElse(300)
    val version = if (args.length > 1) args(1).toInt else 6
    (1 to hi).foreach { seed =>
      val g = StreamFuzzGen.query(seed, version)
      if (g.oracleSql.isDefined)
        println(s"$seed\t${g.shape}\t${g.desc}\t${g.oracleSql.get.take(110)}")
    }
  }
}
