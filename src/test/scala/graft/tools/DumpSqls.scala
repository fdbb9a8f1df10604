package graft.tools

import graft.queries.FuzzQueries

/** Dev tool: prints `name\tSQL` for every declared fz query, for eyeballing
  * the frozen slice or diffing oracle text across generator edits (the
  * hash-pin form of the same check lives in [[FuzzPinGen]] / FuzzSpec).
  */
object DumpSqls {
  def main(args: Array[String]): Unit =
    FuzzQueries.defs.foreach(q => q.oracle.foreach(sql => println(s"${q.name}\t$sql")))
}
