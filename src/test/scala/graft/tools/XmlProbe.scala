package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway probe for from_xml semantics ahead of the v39 grammar:
  * attribute naming, repeated-element arrays, missing elements, nested
  * structs, surrounding-space handling.
  */
object XmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate("xml-probe", defaultCpus = "4")
    import spark.implicits._
    val df = Seq(
      (1L, """<rec a="42"><s>PROMO BURNISHED COPPER</s><n><d>7</d></n><i>11</i><i>22</i><opt>5</opt></rec>"""),
      (2L, """<rec a="43"><s>AUTOMOBILE</s><n><d>8</d></n><i>12</i><i>23</i></rec>""")
    ).toDF("id", "x")
    val schema = "_a BIGINT, s STRING, n STRUCT<d: BIGINT>, i ARRAY<BIGINT>, opt BIGINT"
    val parsed = df.select(col("id"),
      from_xml(col("x"), lit(schema)).as("xr"))
      .select(col("id"), col("xr._a").as("x_a"), col("xr.s").as("x_s"),
        col("xr.n.d").as("x_d"), element_at(col("xr.i"), 2).as("x_e"),
        col("xr.opt").as("x_opt"))
    parsed.show(false)
    parsed.printSchema()
    // same through pure SQL (the FuzzSpec second construction path)
    df.createOrReplaceTempView("probe")
    spark.sql(
      s"""SELECT id, xr._a AS x_a, xr.s AS x_s, xr.n.d AS x_d,
         |  element_at(xr.i, 2) AS x_e, xr.opt AS x_opt
         |FROM (SELECT id, from_xml(x, '$schema') AS xr FROM probe) p""".stripMargin)
      .show(false)
    spark.stop()
  }
}
