package graft.tools

import java.security.MessageDigest

import graft.queries.FuzzQueries

/** Prints the seed → SQL-hash pin map for FuzzSpec's frozen-slice guard
  * (run once when the declared slice changes deliberately).
  */
object FuzzPinGen {
  def sqlHash(sql: String): String =
    MessageDigest.getInstance("MD5").digest(sql.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString

  def main(args: Array[String]): Unit = {
    FuzzQueries.defs.foreach(q =>
      println(s"""    "${q.name}" -> "${sqlHash(q.oracle.get)}","""))
  }
}
