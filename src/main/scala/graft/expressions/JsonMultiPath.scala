package graft.expressions

import java.io.ByteArrayOutputStream

import com.fasterxml.jackson.core.{JsonEncoding, JsonFactory, JsonParser, JsonToken}
import com.fasterxml.jackson.core.JsonProcessingException

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse-once-extract-many JSON path extraction (r19 optimization round,
  * guide §1.2 step 2 / §4 "expressions and codegen").
  *
  * Motivation, measured at sf0.1 (OPTIMIZATION_r19.md): the v34 JSON fuzz
  * group/projection seeds evaluate k independent `get_json_object(js, $p_i)`
  * calls over the SAME document per row — k full Jackson tokenizations of
  * the same bytes (fz26035: 3 parses/row over a constructed ~130-byte doc,
  * 1.49 s; fz26119/26042/26013 likewise). Each `GetJsonObject` is an
  * independent streaming parse by design; nothing in Catalyst shares the
  * tokenization.
  *
  * [[JsonPathsExtract]] evaluates k paths in ONE streaming pass and returns
  * `array<string>` (one slot per path, in the given order). The optimizer
  * rule `graft.plans.FactorPathExtraction` rewrites k>=2 distinct-path
  * `GetJsonObject` calls over one canonically-equal document into a single
  * shared [[JsonPathsExtract]] plus per-slot `GetArrayItem` accesses.
  *
  * SEMANTIC PARITY CONTRACT: for every supported path p_i, slot i must be
  * byte-identical to `get_json_object(json, p_i)` — including the
  * asymmetric null handling (object field whose value is JSON null -> SQL
  * NULL, array element whose value is JSON null -> the string "null"),
  * duplicate-field first-match-wins at every level, value-based number
  * rendering (input `1.00` -> `1.0`, exactly what Jackson's
  * `copyCurrentEvent` emits), raw (unquoted, unescaped) terminal strings,
  * compact re-serialization of object/array matches, and the all-paths-null
  * outcome on malformed documents (any malformed byte inside the root value
  * throws during the level scan / skipChildren of EVERY per-path evaluation,
  * so per-path and shared evaluation agree). The walker is a faithful port
  * of the Named/Index subset of Spark's `GetJsonObjectEvaluator.evaluatePath`
  * (apache/spark `JsonExpressionEvalUtils.scala`); the supported-path gate
  * below excludes every wildcard form, which is where that evaluator's
  * write-style machinery (Quoted/Flatten) lives. JsonMultiPathSpec pins the
  * parity differentially against real `GetJsonObject` evaluations over a
  * seeded document/path corpus.
  *
  * Supported path subset (the rewrite gates on [[JsonMultiPath.compile]]):
  *   $ (.name | .name[int])+   with name in [A-Za-z0-9_-]+
  * and the compiled path SET must be duplicate-free and prefix-free (no
  * path a strict prefix of another), which guarantees at most one path
  * terminates at any document node — the single-terminal invariant the
  * one-pass walker relies on.
  */
object JsonMultiPath {

  /** One compiled path step: field name (`Field`) or array index. */
  sealed trait Step extends Serializable
  final case class Field(name: String) extends Step
  final case class Index(i: Int) extends Step

  private val pathRe = """^\$((?:\.[A-Za-z0-9_\-]+(?:\[[0-9]+\])*)+)$""".r
  private val stepRe = """\.([A-Za-z0-9_\-]+)|\[([0-9]+)\]""".r

  /** Compile a path into steps, or None when it falls outside the supported
    * subset. Accepted paths parse identically under Spark's JsonPathParser
    * (each `.name` is Key::Named(name), each `[i]` is Subscript::Index(i)).
    */
  def compile(path: String): Option[Array[Step]] = path match {
    case pathRe(steps) =>
      Some(stepRe.findAllMatchIn(steps).map { m =>
        if (m.group(1) != null) Field(m.group(1))
        else Index(m.group(2).toInt)
      }.toArray[Step])
    case _ => None
  }

  /** True when no compiled path is a (possibly equal) prefix of another —
    * the single-terminal invariant of the walker.
    */
  def prefixFree(paths: Seq[Array[Step]]): Boolean = {
    val n = paths.length
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (i != j && paths(i).length <= paths(j).length &&
          paths(j).take(paths(i).length).sameElements(paths(i))) return false
        j += 1
      }
      i += 1
    }
    true
  }
}

/** `array<string>` of get_json_object results for `paths` over one shared
  * streaming parse of `child`. Only constructed by FactorPathExtraction —
  * it never appears in user-facing SQL — and only with paths that pass
  * [[JsonMultiPath.compile]] + prefixFree (required here, loud at
  * construction).
  */
case class JsonPathsExtract(child: Expression, paths: Seq[String])
    extends UnaryExpression {

  import JsonMultiPath._

  private val compiled: Array[Array[Step]] = {
    val c = paths.map(p => compile(p).getOrElse(
      throw new IllegalArgumentException(
        s"json_paths_extract: unsupported path '$p'"))).toArray
    require(paths.distinct.length == paths.length,
      s"json_paths_extract: duplicate paths in $paths")
    require(prefixFree(c.toSeq),
      s"json_paths_extract: paths not prefix-free: $paths")
    c
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "json_paths_extract"
  override def toString: String =
    s"json_paths_extract($child, ${paths.mkString("[", ", ", "]")})"

  // one factory per expression instance; JsonFactory is thread-safe and
  // this expression is per-task-copied like every codegen reference object
  @transient private lazy val jsonFactory = new JsonFactory()

  /** Shared by eval and codegen. Null result (instead of an all-null array)
    * when the document is null or malformed — GetArrayItem over a null
    * array yields the same per-slot NULLs GetJsonObject would.
    */
  def extract(json: UTF8String): GenericArrayData = {
    if (json == null) return null
    val results = new Array[AnyRef](compiled.length)
    try {
      val parser = jsonFactory.createParser(json.getBytes)
      try {
        if (parser.nextToken() == null) return null
        val states = new Array[Int](compiled.length)
        var i = 0
        val all = new Array[Int](compiled.length)
        while (i < compiled.length) { all(i) = i; i += 1 }
        walkValue(parser, all, states, results)
      } finally parser.close()
    } catch {
      // mirrors GetJsonObjectEvaluator: any JsonProcessingException makes
      // EVERY path's independent evaluation null (all traversals scan the
      // same root-value token stream), so discard partial captures
      case _: JsonProcessingException => return null
    }
    new GenericArrayData(results.asInstanceOf[Array[Any]])
  }

  /** One-pass walker over the current value token. `active` holds path ids
    * still live at this node; `depth(id)` is how many steps of path `id`
    * are already consumed. Faithful to evaluatePath for the Named/Index
    * subset: a path id is "matched" exactly when results(id) != null
    * (every capture writes at least one byte), and a matched id stops
    * participating — the duplicate-field first-match-wins rule.
    */
  private def walkValue(p: JsonParser, active: Array[Int],
                        depth: Array[Int], results: Array[AnyRef]): Unit = {
    // single-terminal invariant: at most one active path can be terminal
    var t = 0
    while (t < active.length) {
      val id = active(t)
      if (depth(id) == compiled(id).length) {
        results(id) = capture(p)
        return
      }
      t += 1
    }
    p.currentToken() match {
      case JsonToken.START_OBJECT =>
        while (p.nextToken() != JsonToken.END_OBJECT) {
          val name = p.currentName()
          val matching = active.filter { id =>
            results(id) == null && (compiled(id)(depth(id)) match {
              case Field(f) => f == name
              case _        => false
            })
          }
          p.nextToken() // the field's value token
          // field match with a JSON-null value is NOT a match
          // (evaluatePath's `if (p.nextToken() != VALUE_NULL)`)
          if (matching.nonEmpty && p.currentToken() != JsonToken.VALUE_NULL) {
            matching.foreach(id => depth(id) += 1)
            walkValue(p, matching, depth, results)
            matching.foreach(id => depth(id) -= 1)
          } else {
            p.skipChildren()
          }
        }
      case JsonToken.START_ARRAY =>
        var i = 0
        while (p.nextToken() != JsonToken.END_ARRAY) {
          val matching = active.filter { id =>
            results(id) == null && (compiled(id)(depth(id)) match {
              case Index(j) => j == i
              case _        => false
            })
          }
          if (matching.nonEmpty) {
            // an array element that IS JSON null still captures ("null"),
            // exactly like arrayIndex + evaluatePath's (_, Nil) copy branch
            matching.foreach(id => depth(id) += 1)
            walkValue(p, matching, depth, results)
            matching.foreach(id => depth(id) -= 1)
          } else {
            p.skipChildren()
          }
          i += 1
        }
      case _ => // scalar under a continuing path: no match (fallback branch)
    }
  }

  /** Capture the current value exactly as evaluatePath's terminal branches
    * do: a raw (unquoted) text for VALUE_STRING under RawStyle, a compact
    * generator copy for everything else (objects, arrays, numbers rendered
    * value-based, booleans, JSON null -> the string "null").
    */
  private def capture(p: JsonParser): UTF8String = {
    if (p.currentToken() == JsonToken.VALUE_STRING) {
      UTF8String.fromString(p.getText)
    } else {
      val out = new ByteArrayOutputStream()
      val g = jsonFactory.createGenerator(out, JsonEncoding.UTF8)
      try g.copyCurrentStructure(p) finally g.close()
      UTF8String.fromBytes(out.toByteArray)
    }
  }

  override def nullSafeEval(json: Any): Any =
    extract(json.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, j => {
      val self = ctx.addReferenceObj("jsonPathsExpr", this,
        classOf[JsonPathsExtract].getName)
      s"""
         |${ev.value} = $self.extract($j);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
