package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.TextGateExpressions.{dupNgramStats, stopwordStats}

/** Differential pin for the r19 native text-gate expressions: every field
  * of DupNgramStats / StopwordStats must equal the stock Column pipeline
  * it replaced (the r13-era HOF forms), evaluated side by side on the same
  * rows by the same session. The tokenization contract (split-on-space
  * byte scan == split(text, " ") regex split, empty tokens and all) is
  * what everything rests on, so the corpus leans on separator edge cases.
  */
class TextGateExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val edgeTexts: Seq[String] = Seq(
    "",                      // one empty token
    " ",                     // two empty tokens
    "  ",                    // three empty tokens
    "a",
    "a b",
    "a b c",                 // exactly one gram
    "a b c d",
    "a b c a b c",           // duplicated gram run
    "a b c a b c a b c",     // triple run
    "the the the the",       // stopword run + duplicated grams
    " a b c",                // leading empty token
    "a b c ",                // trailing empty token
    "a  b c a  b c",         // empty tokens inside duplicated grams
    "a\tb c",                // tab is NOT a separator
    "café né café né café né", // multi-byte tokens
    "the be to of and that have with", // all stopwords, once each
    "the the be with with with",       // repeated stopwords
    "x " * 2000 + "end"      // long doc, heavy duplication
  )

  private def docs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  /** The replaced tq_dup_ngram_frac pipeline, verbatim. */
  private def oldDupCols(df: org.apache.spark.sql.DataFrame) = {
    val toks = split(col("text"), " ")
    val n = size(toks) - 2
    val t1 = slice(toks, lit(1), n)
    val t2 = slice(toks, lit(2), n)
    val t3 = slice(toks, lit(3), n)
    val grams = zip_with(zip_with(t1, t2,
        (a, b) => concat(a, lit(" "), b)), t3,
      (ab, c) => concat(ab, lit(" "), c))
    val sorted = array_sort(grams)
    val dupCnt = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("peq"), lit(0L).as("acc")),
      (st, x) => {
        val isEq = x === st.getField("prev")
        struct(
          x.as("prev"),
          when(isEq, 1L).otherwise(0L).as("peq"),
          (st.getField("acc") + when(isEq,
            when(st.getField("peq") === 1L, 1L).otherwise(2L))
            .otherwise(0L)).as("acc"))
      },
      st => st.getField("acc"))
    df.where(size(toks) >= 3).select(
      col("doc_id"),
      n.cast(LongType).as("o_n"),
      dupCnt.as("o_dup"),
      dupNgramStats(col("text")).getField("n_grams").as("n_n"),
      dupNgramStats(col("text")).getField("dup_grams").as("n_dup"))
  }

  test("DupNgramStats == the replaced HOF pipeline on the edge corpus") {
    val rows = oldDupCols(docs(edgeTexts)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(3) && r.getLong(2) == r.getLong(4),
        s"doc ${r.getLong(0)}: old (${r.getLong(1)}, ${r.getLong(2)}) vs " +
          s"native (${r.getLong(3)}, ${r.getLong(4)})")
    }
  }

  private val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The replaced tq_stopword_gate statistics, verbatim. */
  private def oldStopCols(df: org.apache.spark.sql.DataFrame) = {
    val toks = split(col("text"), " ")
    val nW = size(toks).cast(LongType)
    val present = size(array_intersect(array_distinct(toks),
      array(stops.map(lit): _*))).cast(LongType)
    val stopToks = size(filter(toks,
      t => t.isin(stops.map(x => x: Any): _*))).cast(LongType)
    val st = stopwordStats(col("text"), stops)
    df.select(col("doc_id"),
      nW.as("o_nw"), present.as("o_present"), stopToks.as("o_stop"),
      st.getField("n_words").as("n_nw"),
      st.getField("n_stopwords").as("n_present"),
      st.getField("stop_tokens").as("n_stop"))
  }

  test("StopwordStats == the replaced Column statistics on the edge corpus") {
    oldStopCols(docs(edgeTexts)).collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(4) && r.getLong(2) == r.getLong(5) &&
        r.getLong(3) == r.getLong(6),
        s"doc ${r.getLong(0)}: old (${r.getLong(1)}, ${r.getLong(2)}, " +
          s"${r.getLong(3)}) vs native (${r.getLong(4)}, ${r.getLong(5)}, " +
          s"${r.getLong(6)})")
    }
  }

  test("null text is NULL through both expressions") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c")))
      .toDF("doc_id", "text")
    val rows = df.select(
      dupNgramStats(col("text")).isNull.as("d"),
      stopwordStats(col("text"), stops).isNull.as("s")).collect()
    assert(rows(0).getBoolean(0) && rows(0).getBoolean(1))
    assert(!rows(1).getBoolean(0) && !rows(1).getBoolean(1))
  }

  test("seeded random differential sweep (both expressions, 300 docs)") {
    val rnd = new scala.util.Random(190002)
    val vocab = Vector("the", "be", "to", "a", "bb", "ccc", "café", "x1", "")
    val texts = (1 to 300).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
    oldDupCols(docs(texts)).collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(3) && r.getLong(2) == r.getLong(4),
        s"dup mismatch on doc ${r.getLong(0)}")
    }
    oldStopCols(docs(texts)).collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(4) && r.getLong(2) == r.getLong(5) &&
        r.getLong(3) == r.getLong(6),
        s"stopword mismatch on doc ${r.getLong(0)}")
    }
  }

  test("real corpus differential at sf0.001 (documents table end to end)") {
    val df = graft.Tables.documents(spark, TestSpark.sf0001)
    val dup = oldDupCols(df)
      .where(col("o_n") =!= col("n_n") || col("o_dup") =!= col("n_dup")).count()
    val stop = oldStopCols(df)
      .where(col("o_nw") =!= col("n_nw") || col("o_present") =!= col("n_present")
        || col("o_stop") =!= col("n_stop")).count()
    assert(dup == 0 && stop == 0,
      s"corpus differential: $dup dup-gram rows, $stop stopword rows differ")
  }
}
