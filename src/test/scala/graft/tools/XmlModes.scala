package graft.tools

import graft.fuzz.FuzzGen

/** Throwaway mode-lister for the v39 freeze: seed → mode string so the
  * frozen picks can be shape × table × draw diverse.
  */
object XmlModes {
  def main(args: Array[String]): Unit = {
    val from = args(0).toInt; val to = args(1).toInt
    (from to to).foreach { seed =>
      val q = FuzzGen.query(seed, 39)
      if (q.mode.startsWith("xml"))
        println(s"$seed\t${q.mode}\t${q.sql.take(150)}")
    }
  }
}
