package graft.tools

import org.apache.spark.sql.DataFrame

import graft.{Tables, TestSpark}

/** Prints the normalized schema of every corpus table in the exact pin
  * format SchemaCanarySpec asserts — run after a DELIBERATE corpus change
  * and paste the diff into the spec's `expected` map. The spec calls
  * [[render]] directly, so the two can't drift apart.
  *
  * Usage: Test/runMain graft.tools.SchemaDump
  */
object SchemaDump {
  def render(df: DataFrame): String =
    df.schema.fields.map(f => s"${f.name}:${f.dataType.sql}").mkString(",")

  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    Tables.all.foreach { t =>
      println(s"SCHEMA $t ${render(Tables.loadNormalized(s, TestSpark.sf0001, t))}")
    }
    s.stop()
  }
}
