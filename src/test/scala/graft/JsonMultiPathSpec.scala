package graft

import org.apache.spark.sql.catalyst.expressions.{GetJsonObject, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{JsonMultiPath, JsonPathsExtract}

/** Differential parity pin for the r19 parse-once-extract-many expression:
  * every slot of JsonPathsExtract(doc, paths) must be byte-identical to an
  * independent get_json_object(doc, path) evaluation — the rewrite rule
  * (FactorPathExtraction) is only sound under this contract. The reference
  * side is Spark's own GetJsonObject interpreted eval, so the pin holds
  * against the exact evaluator version shipped, not against a description
  * of it. Edge-case corpus first (the asymmetric null semantics, duplicate
  * fields, number rendering, escapes, malformed docs), then a seeded
  * 500-document random sweep.
  */
class JsonMultiPathSpec extends AnyFunSuite {

  private def gjo(doc: String, path: String): Any =
    GetJsonObject(Literal(UTF8String.fromString(doc)),
      Literal(UTF8String.fromString(path))).eval(null)

  private def multi(doc: String, paths: Seq[String]): Seq[Any] = {
    val r = JsonPathsExtract(Literal(UTF8String.fromString(doc)), paths)
      .eval(null)
    r match {
      case null                => paths.map(_ => null)
      case a: GenericArrayData => paths.indices.map(a.array(_))
    }
  }

  /** Assert slot-for-slot parity on one (doc, paths) case. */
  private def check(doc: String, paths: Seq[String]): Unit = {
    val expected = paths.map(p => gjo(doc, p))
    val actual = multi(doc, paths)
    assert(actual == expected,
      s"doc=<$doc> paths=$paths: got $actual, get_json_object says $expected")
  }

  // ---- supported-path compiler gate ------------------------------------

  test("compile accepts the Named/Index subset only") {
    assert(JsonMultiPath.compile("$.a").isDefined)
    assert(JsonMultiPath.compile("$.a.b").isDefined)
    assert(JsonMultiPath.compile("$.a[0]").isDefined)
    assert(JsonMultiPath.compile("$.a[12].b[3]").isDefined)
    assert(JsonMultiPath.compile("$.a-b_c9").isDefined)
    // outside the subset: stay on the stock evaluator
    assert(JsonMultiPath.compile("$").isEmpty)
    assert(JsonMultiPath.compile("$.a[*]").isEmpty)
    assert(JsonMultiPath.compile("$.*").isEmpty)
    assert(JsonMultiPath.compile("$['a']").isEmpty)
    assert(JsonMultiPath.compile("$.a b").isEmpty)
    assert(JsonMultiPath.compile("$.a..b").isEmpty)
    assert(JsonMultiPath.compile("$.a[-1]").isEmpty)
    assert(JsonMultiPath.compile("a.b").isEmpty)
    assert(JsonMultiPath.compile("$[0]").isEmpty) // root index: not needed
  }

  test("prefix-free gate") {
    def c(p: String) = JsonMultiPath.compile(p).get
    assert(JsonMultiPath.prefixFree(Seq(c("$.a"), c("$.b.c"), c("$.b.d"))))
    assert(!JsonMultiPath.prefixFree(Seq(c("$.a"), c("$.a.b"))))
    assert(!JsonMultiPath.prefixFree(Seq(c("$.e[0]"), c("$.e[0].x"))))
    assert(!JsonMultiPath.prefixFree(Seq(c("$.a"), c("$.a"))))
    intercept[IllegalArgumentException] {
      JsonPathsExtract(Literal(UTF8String.fromString("{}")),
        Seq("$.a", "$.a.b"))
    }
  }

  // ---- edge-case corpus -------------------------------------------------

  private val fuzzDocPaths =
    Seq("$.a", "$.b", "$.c.d", "$.e[0]", "$.e[1]", "$.zz", "$.k")

  test("the v34 constructed-document shape") {
    check("""{"a": 42, "b": "F", "c": {"d": 7}, "e": [7, 42]}""", fuzzDocPaths)
    check("""{"a": 42, "c": {"d": 7}}""", fuzzDocPaths) // stripe: b/e absent
    check("""{"k": 25}""", fuzzDocPaths)
  }

  test("object field with JSON null value is SQL NULL") {
    check("""{"a": null, "b": 1}""", Seq("$.a", "$.b"))
  }

  test("array element that is JSON null is the string null") {
    check("""{"e": [null, 2]}""", Seq("$.e[0]", "$.e[1]", "$.e[2]"))
  }

  test("duplicate fields: first non-null match wins, per level") {
    check("""{"a": 1, "a": 2}""", Seq("$.a", "$.b"))
    check("""{"a": null, "a": 2}""", Seq("$.a", "$.b"))
    check("""{"a": {"x": 1}, "a": {"d": 3}}""", Seq("$.a.d", "$.a.x"))
    check("""{"c": {"d": 1, "d": 2}}""", Seq("$.c.d", "$.a"))
  }

  test("number rendering is value-based, not source-text") {
    check("""{"a": 1.00, "b": 1e2, "c": {"d": -0.50}, "k": 007}""",
      Seq("$.a", "$.b", "$.c.d", "$.k"))
    check("""{"a": 123456789012345678901234567890, "b": 1.7976931348623157E309}""",
      Seq("$.a", "$.b"))
  }

  test("terminal strings are raw and unescaped") {
    check("""{"a": "x\"y\nz", "b": "café", "c": {"d": ""}}""",
      Seq("$.a", "$.b", "$.c.d"))
  }

  test("struct and array matches re-serialize compactly") {
    val doc = """{"c": {"d": 2, "x": [1, {"y": "s"}]}, "e": [5, [6, 7]]}"""
    check(doc, Seq("$.c.x", "$.e[1]"))
    check(doc, Seq("$.c", "$.e")) // prefix-free within each merged set
  }

  test("type-mismatched traversal yields NULL") {
    check("""{"a": 5, "e": [1, 2], "c": {"d": 1}}""",
      Seq("$.a.b", "$.a[0]", "$.e.d", "$.e[5]", "$.c[0]"))
  }

  test("booleans and deep nesting") {
    val doc = """{"f": true, "g": false, "a": {"b": {"c": [0, {"d": 9}]}}}"""
    check(doc, Seq("$.f", "$.g", "$.a.b.c[1].d", "$.a.b.c[0]"))
    check(doc, Seq("$.f", "$.a.b"))
  }

  test("malformed documents: every slot NULL, exactly like per-path eval") {
    val paths = Seq("$.a", "$.b")
    for (doc <- Seq("""{"a": 1,""", """{"a": }""", "not json", "",
      """[1, 2x]""", """{"a": 1, "b": [2x]}""", "{", """{"a" 1}""")) {
      check(doc, paths)
    }
  }

  test("trailing garbage after a complete root value is tolerated") {
    check("""{"a": 1}garbage""", Seq("$.a", "$.b"))
    check("""[1, 2] [3]""", Seq("$.a"))
  }

  test("null document") {
    val r = JsonPathsExtract(Literal(null, org.apache.spark.sql.types.StringType),
      Seq("$.a", "$.b")).eval(null)
    assert(r == null)
    assert(gjo0(null) == null)
  }
  private def gjo0(doc: String): Any =
    GetJsonObject(Literal(if (doc == null) null else UTF8String.fromString(doc),
      org.apache.spark.sql.types.StringType),
      Literal(UTF8String.fromString("$.a"))).eval(null)

  // ---- seeded random sweep ----------------------------------------------

  test("seeded 500-document random differential sweep") {
    val rnd = new scala.util.Random(190001)
    val keys = Vector("a", "b", "c", "d", "e")

    def value(depth: Int): String = {
      val pick = if (depth >= 3) rnd.nextInt(6) else rnd.nextInt(8)
      pick match {
        case 0 => rnd.nextInt(200).toString
        case 1 => s"${rnd.nextInt(100)}.${rnd.nextInt(100)}"
        case 2 => "\"s" + rnd.nextInt(50) + "\""
        case 3 => if (rnd.nextBoolean()) "true" else "false"
        case 4 => "null"
        case 5 => s"${rnd.nextInt(9) + 1}e${rnd.nextInt(4)}"
        case 6 => // array
          (0 until rnd.nextInt(4)).map(_ => value(depth + 1))
            .mkString("[", ", ", "]")
        case _ => obj(depth + 1)
      }
    }
    def obj(depth: Int): String =
      (0 until rnd.nextInt(4)).map(_ =>
        "\"" + keys(rnd.nextInt(keys.length)) + "\": " + value(depth + 1))
        .mkString("{", ", ", "}")

    def path(): String = {
      val sb = new StringBuilder("$")
      (0 to rnd.nextInt(2)).foreach { _ =>
        sb.append('.').append(keys(rnd.nextInt(keys.length)))
        if (rnd.nextInt(4) == 0) sb.append('[').append(rnd.nextInt(3)).append(']')
      }
      sb.toString
    }

    (1 to 500).foreach { _ =>
      val doc = obj(0)
      val raw = Seq.fill(2 + rnd.nextInt(4))(path()).distinct
      val compiled = raw.map(p => p -> JsonMultiPath.compile(p).get)
      val pf = compiled.filter { case (p, c) =>
        compiled.forall { case (q, d) =>
          (q == p) ||
            !(c.length <= d.length && d.take(c.length).sameElements(c)) &&
            !(d.length <= c.length && c.take(d.length).sameElements(d))
        }
      }.map(_._1)
      if (pf.size >= 2) check(doc, pf)
    }
  }
}
