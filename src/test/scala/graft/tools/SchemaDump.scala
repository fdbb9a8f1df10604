package graft.tools

import graft.{Tables, TestSpark}

/** Prints the normalized schema of every corpus table in the exact pin
  * format SchemaCanarySpec asserts — run after a DELIBERATE corpus change
  * and paste the diff into the spec's `expected` map.
  *
  * Usage: Test/runMain graft.tools.SchemaDump
  */
object SchemaDump {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    Tables.all.foreach { t =>
      val df = t match {
        case "events" => Tables.events(s, TestSpark.sf0001)
        case _        => Tables.load(s, TestSpark.sf0001, t)
      }
      val sch = df.schema.fields.map(f => s"${f.name}:${f.dataType.sql}").mkString(",")
      println(s"SCHEMA $t $sch")
    }
    s.stop()
  }
}
