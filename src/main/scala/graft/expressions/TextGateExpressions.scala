package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass replacements for the two interpreted Gopher text-gate
  * pipelines (r19 optimization round, guide §4 "expressions and codegen" —
  * the LshProbeBuckets precedent from r17).
  *
  * The Column forms they replace were the engine's last interpreted hot
  * path: higher-order functions (zip_with / array_sort-with-comparator /
  * aggregate folds) never enter whole-stage codegen and re-evaluate every
  * reference, so tq_dup_ngram_frac paid ~6 `split(text)` evaluations plus
  * an interpreted O(n log n) comparator sort plus an interpreted fold PER
  * ROW, and tq_stopword_gate re-split the document for each of its three
  * token statistics. Each expression here tokenizes once and computes its
  * statistics in the same pass.
  *
  * PARITY CONTRACT (differentially pinned in TextGateExpressionsSpec
  * against the stock Column trees): tokenization must be byte-identical to
  * `split(text, " ")` = Java-regex split on a single literal space with
  * limit -1 — leading/adjacent separators produce empty tokens, trailing
  * empties are kept, and the empty input yields one empty token. Because
  * the pattern is one literal space and UTF-8 never embeds 0x20 inside a
  * multi-byte sequence, a byte scan over 0x20 reproduces it exactly,
  * including on invalid UTF-8 (no String round-trip). Token/gram equality
  * is UTF8String binary equality, the same relation the replaced
  * `===`/array_intersect/isin comparisons used.
  */
object TextGateExpressions {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftBridge

  /** Column wrapper: struct<n_grams, dup_grams> of `text`. */
  def dupNgramStats(text: Column): Column =
    GraftBridge.column(DupNgramStats(GraftBridge.expression(text)))

  /** Column wrapper: struct<n_words, n_stopwords, stop_tokens>. */
  def stopwordStats(text: Column, stopwords: Seq[String]): Column =
    GraftBridge.column(StopwordStats(GraftBridge.expression(text), stopwords))

  /** Byte offsets of the token boundaries of `text` split on single
    * spaces: returns the flat array [start_0, end_0, start_1, end_1, ...]
    * (ends exclusive), matching split(text, " ", -1).
    */
  def tokenBounds(bytes: Array[Byte], offset: Int, len: Int): Array[Int] = {
    var n = 1
    var i = 0
    while (i < len) { if (bytes(offset + i) == ' '.toByte) n += 1; i += 1 }
    val out = new Array[Int](2 * n)
    var tok = 0
    var start = 0
    i = 0
    while (i < len) {
      if (bytes(offset + i) == ' '.toByte) {
        out(2 * tok) = start; out(2 * tok + 1) = i
        tok += 1; start = i + 1
      }
      i += 1
    }
    out(2 * tok) = start; out(2 * tok + 1) = len
    out
  }
}

/** struct<n_grams: bigint, dup_grams: bigint> of the Gopher duplicate
  * 3-gram statistic: n_grams = token count - 2, dup_grams = the number of
  * 3-gram instances whose gram occurs >= 2 times in the document. NULL for
  * a NULL document; n_grams is negative/zero for documents under 3 tokens
  * (callers gate on n_grams >= 1, the exact equivalent of the published
  * `size(split(text)) >= 3`).
  *
  * Counting is a hash map over the grams instead of the sorted-runs fold —
  * sum of counts >= 2 is the same statistic the e+r run form computed.
  * A gram key is the contiguous byte slice of the ORIGINAL text from the
  * start of token i to the end of token i+2: consecutive tokens are
  * separated by exactly one space by construction of the split, so that
  * slice IS w_i + ' ' + w_{i+1} + ' ' + w_{i+2}, byte-for-byte the string
  * the replaced concat built (and no copies are made building it).
  */
case class DupNgramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("dup_grams", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "dup_ngram_stats"

  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val bounds = TextGateExpressions.tokenBounds(bytes, 0, bytes.length)
    val nTok = bounds.length / 2
    val nGrams = nTok - 2
    if (nGrams < 1) return new GenericInternalRow(Array[Any](nGrams.toLong, 0L))
    val counts = new java.util.HashMap[UTF8String, Int](nGrams * 2)
    var i = 0
    while (i < nGrams) {
      val start = bounds(2 * i)
      val end = bounds(2 * (i + 2) + 1)
      val gram = UTF8String.fromBytes(bytes, start, end - start)
      counts.merge(gram, 1, (a, b) => a + b)
      i += 1
    }
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c >= 2) dup += c }
    new GenericInternalRow(Array[Any](nGrams.toLong, dup))
  }

  override def nullSafeEval(text: Any): Any =
    compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("dupNgramExpr", this,
        classOf[DupNgramStats].getName)
      s"${ev.value} = $self.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** struct<n_words: bigint, n_stopwords: bigint, stop_tokens: bigint> of
  * the Gopher stopword gate over a fixed stopword list: n_words = token
  * count, n_stopwords = DISTINCT stopwords present (what
  * array_intersect(array_distinct(toks), stops) sized), stop_tokens =
  * total tokens that are stopwords (what filter(toks, isin(stops)) sized).
  * NULL for a NULL document.
  */
case class StopwordStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  require(stopwords.nonEmpty && stopwords.size <= 64,
    s"stopword_stats: need 1..64 stopwords, got ${stopwords.size}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false),
    StructField("stop_tokens", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "stopword_stats"
  override def toString: String =
    s"stopword_stats($child, ${stopwords.mkString("[", ", ", "]")})"

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val bounds = TextGateExpressions.tokenBounds(bytes, 0, bytes.length)
    val nTok = bounds.length / 2
    var presentMask = 0L
    var stopToks = 0L
    var i = 0
    while (i < nTok) {
      val start = bounds(2 * i)
      val len = bounds(2 * i + 1) - start
      var s = 0
      var hit = false
      while (s < stopBytes.length && !hit) {
        val sw = stopBytes(s)
        if (sw.length == len) {
          var j = 0
          while (j < len && sw(j) == bytes(start + j)) j += 1
          if (j == len) { hit = true; presentMask |= (1L << s); stopToks += 1 }
        }
        if (!hit) s += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nTok.toLong, java.lang.Long.bitCount(presentMask).toLong, stopToks))
  }

  override def nullSafeEval(text: Any): Any =
    compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("stopwordExpr", this,
        classOf[StopwordStats].getName)
      s"${ev.value} = $self.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
