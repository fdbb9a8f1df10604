package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.schema.{SchemaAlign, TypeMap}

/** SURVEY §5.1/§5.2: the schema kernel — every alignToSchema rule and the
  * TypeMap table (reference `big_uery_handler.py:14-29,32-42,147-156`).
  * Property tests sample scalacheck generators with a fixed seed (the
  * scalatest-scalacheck bridge isn't in the offline cache).
  */
class SchemaAlignSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 50): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("TypeMap maps every reference type; unknown falls back to STRING") {
    assert(TypeMap.toSpark("STRING") == StringType)
    assert(TypeMap.toSpark("BOOL") == BooleanType)
    assert(TypeMap.toSpark("INT64") == LongType)
    assert(TypeMap.toSpark("FLOAT64") == DoubleType)
    assert(TypeMap.toSpark("NUMERIC") == DecimalType(38, 9))
    assert(TypeMap.toSpark("BIGNUMERIC") == DecimalType(38, 38))
    assert(TypeMap.toSpark("DATE") == DateType)
    assert(TypeMap.toSpark("DATETIME") == TimestampNTZType)
    assert(TypeMap.toSpark("TIMESTAMP") == TimestampType)
    assert(TypeMap.toSpark("TIME") == StringType)
    assert(TypeMap.toSpark("GEOGRAPHY") == StringType)
    assert(TypeMap.toSpark("SOME_FUTURE_TYPE") == StringType)
  }

  private val target = StructType(Seq(
    StructField("id", LongType),
    StructField("price", DoubleType),
    StructField("note", StringType)))

  test("rule 1: shared column safe-casts; bad value → NULL, never error") {
    val df = Seq(("1", "19.5", "ok"), ("x", "not-a-number", "bad"))
      .toDF("id", "price", "note")
    val out = SchemaAlign.alignToSchema(df, target).collect()
    assert(out(0) == Row(1L, 19.5, "ok"))
    assert(out(1) == Row(null, null, "bad"))
  }

  test("rule 2: column missing from source → NULL of target type") {
    val df = Seq((1L, "a")).toDF("id", "note")
    val out = SchemaAlign.alignToSchema(df, target)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(out.collect()(0) == Row(1L, null, "a"))
  }

  test("rule 3: extra source column silently dropped; target order kept") {
    val df = Seq((1L, 2.0, "a", "EXTRA")).toDF("note", "price", "id", "extra")
      .selectExpr("cast(note as string) note", "price", "cast(id as string) id", "extra")
    val out = SchemaAlign.alignToSchema(df, target)
    assert(out.columns.toSeq == Seq("id", "price", "note"))
    assert(!out.columns.contains("extra"))
  }

  test("column matching is case-insensitive (BigQuery-style)") {
    val df = Seq((5L, 1.5, "n")).toDF("ID", "Price", "NOTE")
    val out = SchemaAlign.alignToSchema(df, target).collect()
    assert(out(0) == Row(5L, 1.5, "n"))
  }

  test("STRING target accepts any value (plain cast, big_uery_handler.py:38-39)") {
    val t = StructType(Seq(StructField("v", StringType)))
    val df = Seq(Tuple1(12.75)).toDF("v")
    assert(SchemaAlign.alignToSchema(df, t).collect()(0).getString(0) == "12.75")
  }

  test("property: long round-trips through string alignment") {
    val ns = samples(Gen.long)
    val df = ns.map(n => Tuple1(n.toString)).toDF("id")
    val t = StructType(Seq(StructField("id", LongType)))
    val got = SchemaAlign.alignToSchema(df, t).collect().map(_.getLong(0)).toSeq
    assert(got == ns)
  }

  test("property: alignment is idempotent") {
    val rows = samples(Gen.zip(Gen.long, Gen.alphaNumStr))
    val df = rows.toDF("id", "note")
    val t = StructType(Seq(StructField("id", LongType), StructField("note", StringType)))
    val once = SchemaAlign.alignToSchema(df, t)
    val twice = SchemaAlign.alignToSchema(once, t)
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("property: every TypeMap target type round-trips its string form") {
    import org.apache.spark.sql.functions.col
    // one (value-as-string, target type) pair per _CAST_TARGETS row
    val cases = Seq(
      ("hello", StringType), ("true", BooleanType), ("42", LongType),
      ("2.75", DoubleType), ("12345.678901234", DecimalType(38, 9)),
      ("2026-08-12", DateType), ("2026-08-12 10:30:00", TimestampNTZType))
    cases.foreach { case (v, t) =>
      val df = Seq(Tuple1(v)).toDF("v")
      val target = StructType(Seq(StructField("v", t)))
      val back = SchemaAlign.alignToSchema(df, target)
        .select(col("v").cast(StringType)).collect()(0).getString(0)
      // value survives the cast (string rendering may normalize, so re-cast
      // both sides to the target and compare)
      val again = Seq(Tuple1(back)).toDF("v")
      assert(SchemaAlign.alignToSchema(again, target).collect()(0).get(0) ==
        SchemaAlign.alignToSchema(df, target).collect()(0).get(0), s"type $t value $v")
    }
  }

  test("property: bad values → NULL for every non-string TypeMap target") {
    val bad = "definitely-not-castable"
    Seq(BooleanType, LongType, DoubleType, DecimalType(38, 9), DateType,
      TimestampNTZType, TimestampType).foreach { t =>
      val df = Seq(Tuple1(bad)).toDF("v")
      val out = SchemaAlign.alignToSchema(df, StructType(Seq(StructField("v", t))))
      assert(out.collect()(0).isNullAt(0), s"expected NULL for $t")
    }
  }

  test("property: random schema pairs — align never throws, output IS the target schema") {
    // Random source/target pairs with overlapping, missing, and extra
    // columns, adversarial names (dots, backticks, spaces — the untrusted-
    // header space colExact exists for), and hostile values. The kernel's
    // whole contract: NEVER throw, and the output schema is EXACTLY the
    // target's names and types regardless of what the file looked like.
    val names = Seq("a", "B", "c.d", "e`f", "g h", "ok_col")
    val types: Seq[DataType] =
      Seq(LongType, IntegerType, DoubleType, StringType, BooleanType, DateType)
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { i =>
      val srcNames = rnd.shuffle(names).take(1 + rnd.nextInt(names.size))
      val tgtNames = rnd.shuffle(names).take(1 + rnd.nextInt(names.size))
      val src = StructType(srcNames.map(n => StructField(n, StringType)).toArray)
      val tgt = StructType(
        tgtNames.map(n => StructField(n, types(rnd.nextInt(types.size)))).toArray)
      val vals = Seq("123", "abc", "2026-01-01", "true", "1.5e3", null)
      val rows = new java.util.ArrayList[Row]()
      (0 until 5).foreach { _ =>
        rows.add(Row(srcNames.map(_ => vals(rnd.nextInt(vals.size))): _*))
      }
      val out = SchemaAlign.alignToSchema(spark.createDataFrame(rows, src), tgt)
      assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        tgt.fields.map(f => (f.name, f.dataType)).toSeq,
        s"case $i: output schema must equal the target")
      assert(out.collect().length == 5, s"case $i: alignment must never throw")
    }
  }

  test("stampIngestionDate adds missing column and backfills NULLs (R5)") {
    val run = Date.valueOf("2026-08-12")
    val noCol = Seq(Tuple1(1L)).toDF("id")
    val stamped = SchemaAlign.stampIngestionDate(noCol, run).collect()
    assert(stamped(0).getDate(1) == run)

    val withNull = spark.createDataFrame(
      java.util.List.of(Row(1L, null), Row(2L, Date.valueOf("2026-01-01"))),
      StructType(Seq(StructField("id", LongType), StructField("Ingestion_date", DateType))))
    val out = SchemaAlign.stampIngestionDate(withNull, run).collect()
    assert(out(0).getDate(1) == run)                          // backfilled
    assert(out(1).getDate(1) == Date.valueOf("2026-01-01"))   // preserved
  }

  test("alignToSchemaObserved: bad-cast counters ride the ingest job itself") {
    import org.apache.spark.sql.functions.col
    val src = spark.createDataFrame(
      java.util.List.of(
        Row("1", "ok"), Row("notanumber", "ok"),
        Row("3", "ok"), Row(null, "ok")),
      StructType(Seq(StructField("n", StringType), StructField("s", StringType))))
    val target = StructType(Seq(
      StructField("n", LongType), StructField("s", StringType)))
    val (aligned, obs) = SchemaAlign.alignToSchemaObserved(src, target)
    val rows = aligned.collect() // one action — metrics observed during it
    assert(rows.length == 4)
    assert(obs.get("rows_in") == 4L)
    // "notanumber" is present-but-uncastable; the NULL input row is not bad
    assert(obs.get("bad_n") == 1L)
    assert(obs.get("bad_s") == 0L)
    // alignment semantics unchanged: same rows as the unobserved path
    val plain = SchemaAlign.alignToSchema(src, target)
    assert(aligned.exceptAll(plain).isEmpty && plain.exceptAll(aligned).isEmpty)
  }
}
