package graft.tools
import graft.queries.FuzzQueries
object DumpSqls {
  def main(args: Array[String]): Unit = {
    FuzzQueries.defs.foreach { q =>
      println(s"${q.name}\t${q.oracle.get}")
    }
  }
}
