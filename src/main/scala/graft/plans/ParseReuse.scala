package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rules for the document-parse expression family (r18
  * optimization round, guide §1.2 step 2 / §4.4).
  *
  * Motivation, measured at sf0.1 (OPTIMIZATION_r18.md): the catalog's
  * semi-structured extraction queries (`from_xml`, `get_json_object`,
  * `parse_json`/`variant_get`, `from_json`, `from_csv`) spend nearly all
  * their time parsing the SAME document repeatedly, because Catalyst
  * treats the parse as just another scalar expression:
  *
  *  1. A projection extracting k fields evaluates k independent parses per
  *     row (each `get_json_object(js, path)` / `variant_get(parse_json(js),
  *     path)` / duplicated `from_xml(x, schema).field` re-parses the
  *     document from scratch). f26_from_xml parsed every event row 3x;
  *     the v38 VARIANT slice parsed up to 5x.
  *  2. PushDownPredicates INLINES a parse-producing alias into filter
  *     conditions, so `.select(from_xml(..) as xr).where(xr.opt.isNotNull)`
  *     parses once in the Filter (below) and AGAIN in the Project (above) —
  *     the exact duplication class the optimization guide describes for
  *     expensive UDFs, hit here by builtins (fz31001: 3 parses/row).
  *  3. A total-order `ORDER BY pk LIMIT n` above an extraction projection
  *     parses the ENTIRE table, then throws away all but n rows — the sort
  *     key never touches the parsed value, so the parse could run on n
  *     rows instead (fz26029: 5 parses x 150k rows for 1000 output rows).
  *
  * Three rules, installed in `experimental.extraOptimizations` (they run
  * AFTER the main optimizer batches, so PushDownPredicates cannot undo
  * them; AQE's re-optimizer carries no pushdown rules either):
  *
  *  - [[PullFilterAboveParseProject]] reverses (2): a Filter whose parses
  *    are ALL also computed by the projection directly above it moves back
  *    above that projection and reuses the projected value.
  *  - [[FactorParse]] fixes (1): >=2 canonically-equal parse subexpressions
  *    inside one Project list (or one Filter condition) are factored into a
  *    single aliased evaluation in a sandwiched child projection.
  *  - [[DeferParsePastTopK]] fixes (3): a stack of deterministic
  *    projections under `Sort(total) + Limit` whose sort keys pass through
  *    to base attributes is re-applied ABOVE the limit, so per-row parse
  *    work runs on `limit` rows, not the full table.
  *
  * All three preserve results exactly: they only move or alias-share
  * DETERMINISTIC expressions, never change which rows survive a filter or
  * how ties sort (sort keys are substituted attribute-for-attribute with
  * identical values). Every rule is gated on the parse family, so the
  * relational catalog's plans (TPC-H, joins, windows) are untouched — the
  * plan-signature golden file confirms zero drift outside the parse
  * queries. At 100 TB these are not micro-optimizations: the parse IS the
  * dominant per-row cost of a semi-structured scan, and k-fold
  * re-parsing is a k-fold throughput loss on the whole corpus.
  */
object ParseCost {
  /** The expensive document-parse expression family. `VariantGet` is
    * included: it walks the variant binary and is the family's extraction
    * surface, so deferring/sharing it is profitable too.
    * [[graft.expressions.JsonPathsExtract]] (the r19 shared multi-path
    * extraction) is one full parse per evaluation, so it participates in
    * deferral/sharing exactly like the GetJsonObject calls it replaces.
    */
  def isParse(e: Expression): Boolean = e match {
    case _: XmlToStructs | _: JsonToStructs | _: CsvToStructs => true
    case _: GetJsonObject | _: JsonTuple                      => true
    case _: VariantGet                                        => true
    case _: graft.expressions.JsonPathsExtract                => true
    case s: StaticInvoke => s.functionName == "parseJson" // parse_json()
    case _ => false
  }

  def containsParse(e: Expression): Boolean = e.exists(isParse)

  /** Occurrences of parse-family nodes in a tree (each textual occurrence
    * counts — the whole point is that each one is a separate evaluation).
    */
  def parseCount(e: Expression): Int = e.collect { case p if isParse(p) => p }.size
}

/** Rule (2): move a Filter whose parse work duplicates the projection
  * directly above it back over that projection.
  *
  * Matches `Project(pm, Filter(cond, child))` where `cond` contains parse
  * expressions and EVERY one of them is canonically equal to (a subtree of)
  * an alias in `pm`; rewrites to `Filter(cond', Project(pm, child))` with
  * the shared subtrees replaced by the alias attributes, leaving `cond'`
  * parse-free.
  *
  * Cost gate (so the move can never lose): hoisting makes the projection
  * run on ALL rows instead of post-filter rows, so EVERY non-trivial alias
  * in pm must already be inlined in cond (each one then goes from >=1
  * inlined evaluation per input row plus one per surviving row, to exactly
  * one per input row — a strict win), and the parse-bearing aliases must
  * not outnumber the parse occurrences they replace. The substituted
  * condition may still carry parses over the projected value (e.g. two
  * get_json_object paths over one constructed document) — those were
  * already per-input-row evaluations and stay count-identical; the shared
  * CONSTRUCTION is what stops being re-evaluated per predicate.
  * Row preservation: both `pm` and `cond` deterministic, and a projection
  * never changes the row set, so filtering before or after it admits
  * exactly the same rows.
  */
object PullFilterAboveParseProject extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case p @ Project(pm, Filter(cond, child))
        if ParseCost.containsParse(cond) && cond.deterministic &&
          pm.forall(_.deterministic) =>
      val nonTrivial = pm.collect {
        case a: Alias if !a.child.isInstanceOf[Attribute] && !a.child.foldable => a
      }
      val hits = nonTrivial.filter(a => cond.exists(_.semanticEquals(a.child)))
      if (hits.isEmpty || hits.size != nonTrivial.size) p
      else {
        var c2 = cond
        hits.foreach { a =>
          c2 = c2.transform {
            case e if e.semanticEquals(a.child) => a.toAttribute
          }
        }
        val parseAliases = pm.count {
          case a: Alias => ParseCost.containsParse(a.child)
          case _        => false
        }
        val proj = Project(pm, child)
        if (parseAliases > ParseCost.parseCount(cond) || // would add net parses
          !c2.references.subsetOf(proj.outputSet)) p
        else Filter(c2, proj)
      }
  }
}

/** Rule (1): factor >=2 canonically-equal parse subexpressions into one
  * evaluation.
  *
  * For a Project list (or a Filter condition) containing the same parse
  * subtree `E` more than once, inserts `Project(child.output :+ (E as _p),
  * child)` underneath and substitutes the occurrences with the new
  * attribute; a Filter gets an outer projection restoring its original
  * schema. Each application removes every duplicate of one canonical
  * parse (largest-first, so a repeated `variant_get` subsumes the
  * `parse_json` inside it), and the inserted alias is a single occurrence,
  * so the fixed-point batch terminates.
  */
object FactorParse extends Rule[LogicalPlan] {

  /** The largest parse subtree occurring >=2 times across `exprs`, if any.
    * Only subtrees whose references are fully available in `child` outputs
    * qualify (a lambda-bound or outer reference cannot be factored).
    */
  private def candidate(exprs: Seq[Expression],
                        avail: AttributeSet): Option[Expression] = {
    val occ = exprs.flatMap(_.collect {
      case e if ParseCost.isParse(e) && e.deterministic &&
        e.references.subsetOf(avail) => e
    })
    val groups = occ.groupBy(_.canonicalized).values.filter(_.size >= 2)
    if (groups.isEmpty) None
    else Some(groups.map(_.head).maxBy(e => e.collect { case _ => 1 }.size))
  }

  private def substitute(e: Expression, target: Expression,
                         replacement: Attribute): Expression =
    e.transform { case x if x.semanticEquals(target) => replacement }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case p @ Project(list, child) if list.forall(_.deterministic) =>
      candidate(list, child.outputSet) match {
        case None => p
        case Some(e) =>
          val shared = Alias(e, "_parse_shared")()
          val newList = list.map(ne =>
            substitute(ne, e, shared.toAttribute).asInstanceOf[NamedExpression])
          // pass through only what the substituted list still reads: this
          // rule runs AFTER ColumnPruning, so a child.output pass-through
          // would re-widen the scan (r19: f17's 1-parse plan read all six
          // event columns and measured no faster than the 2-parse plan)
          val needed = AttributeSet(newList.flatMap(_.references)) -
            shared.toAttribute
          val inner = Project(child.output.filter(needed.contains) :+ shared,
            child)
          Project(newList, inner)
      }
    case f @ Filter(cond, child) if cond.deterministic =>
      candidate(Seq(cond), child.outputSet) match {
        case None => f
        case Some(e) =>
          val shared = Alias(e, "_parse_shared")()
          val inner = Project(child.output :+ shared, child)
          val c2 = substitute(cond, e, shared.toAttribute)
          // restore the original schema above the widened filter
          Project(child.output, Filter(c2, inner))
      }
  }
}

/** Rule (4), r19: parse-once-extract-many for path-distinct JSON
  * extraction (the single highest-leverage item of the r18 verdict).
  *
  * `FactorParse` shares canonically-EQUAL parses, but k `get_json_object`
  * calls with k DIFFERENT paths over one document are k independent
  * tokenizations of the same bytes — the v34 group seeds (fz26035 et al.)
  * pay 3 full parses per row with no rule able to help. This rule rewrites
  * every group of >=2 distinct-supported-path `GetJsonObject` calls over a
  * canonically-equal document (in one Project list or one Filter
  * condition) into a single [[graft.expressions.JsonPathsExtract]] —
  * one streaming parse walking all paths — materialized in a sandwiched
  * child projection, with each original call replaced by a positional
  * `GetArrayItem` over the shared array.
  *
  * Per-slot results are byte-identical to the GetJsonObject calls they
  * replace (the expression's parity contract + JsonMultiPathSpec's
  * differential pin), and GetArrayItem over the null array reproduces the
  * null-document/malformed-document NULLs, so values, row sets and
  * ordering are unchanged. Gates: only paths in the compile() subset (no
  * wildcards — their write-style semantics stay on the stock evaluator),
  * deduped, prefix-free (conflicting paths keep their standalone calls);
  * the document subtree must be deterministic and fully available from the
  * child. The array indirection has a second, deliberate effect: the
  * shared-parse projection below a Filter is no longer collapsible into
  * the filter condition by physical ScanOperation (the array attribute is
  * referenced k>=2 times), which keeps the parse evaluated once per row at
  * execution, not once per predicate.
  */
object FactorPathExtraction extends Rule[LogicalPlan] {
  import graft.expressions.{JsonMultiPath, JsonPathsExtract}
  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  private def pathOf(g: GetJsonObject): Option[String] = g.path match {
    case Literal(p: UTF8String, StringType) if p != null => Some(p.toString)
    case _ => None
  }

  /** Mergeable groups across `exprs`: (document, distinct supported
    * prefix-free paths in first-occurrence order) with >=2 paths.
    */
  private def groups(exprs: Seq[Expression], avail: AttributeSet)
      : Seq[(Expression, Seq[String])] = {
    val occ = exprs.flatMap(_.collect {
      case g: GetJsonObject
          if g.deterministic && g.json.references.subsetOf(avail) &&
            pathOf(g).exists(p => JsonMultiPath.compile(p).isDefined) => g
    })
    occ.groupBy(_.json.canonicalized).values.toSeq.flatMap { gs =>
      val paths = gs.flatMap(pathOf).distinct
      val compiled = paths.map(p => p -> JsonMultiPath.compile(p).get)
      // a prefix-conflicting path keeps its standalone GetJsonObject
      val ok = compiled.filter { case (p, c) =>
        compiled.forall { case (q, d) =>
          (q == p) ||
            !(c.length <= d.length && d.take(c.length).sameElements(c)) &&
            !(d.length <= c.length && c.take(d.length).sameElements(d))
        }
      }.map(_._1)
      if (ok.size >= 2) Some(gs.head.json -> ok) else None
    }
  }

  /** Replace every merged GetJsonObject with its GetArrayItem slot. */
  private def substitute(e: Expression, doc: Expression, paths: Seq[String],
                         arr: Attribute): Expression = e.transform {
    case g: GetJsonObject
        if g.json.canonicalized == doc.canonicalized &&
          pathOf(g).exists(paths.contains) =>
      GetArrayItem(arr, Literal(paths.indexOf(pathOf(g).get)),
        failOnError = false)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case p @ Project(list, child) if list.forall(_.deterministic) =>
      val gs = groups(list, child.outputSet)
      if (gs.isEmpty) p
      else {
        val shared = gs.map { case (doc, paths) =>
          (doc, paths, Alias(JsonPathsExtract(doc, paths), "_json_paths")())
        }
        val newList = list.map { ne =>
          shared.foldLeft(ne: Expression) { case (e, (doc, paths, a)) =>
            substitute(e, doc, paths, a.toAttribute)
          }.asInstanceOf[NamedExpression]
        }
        // prune the pass-through like FactorParse: post-ColumnPruning, a
        // child.output pass-through re-widens the scan
        val needed = AttributeSet(newList.flatMap(_.references)) --
          AttributeSet(shared.map(_._3.toAttribute))
        val inner = Project(
          child.output.filter(needed.contains) ++ shared.map(_._3), child)
        Project(newList, inner)
      }
    case f @ Filter(cond, child) if cond.deterministic =>
      val gs = groups(Seq(cond), child.outputSet)
      if (gs.isEmpty) f
      else {
        val shared = gs.map { case (doc, paths) =>
          (doc, paths, Alias(JsonPathsExtract(doc, paths), "_json_paths")())
        }
        val inner = Project(child.output ++ shared.map(_._3), child)
        val c2 = shared.foldLeft(cond) { case (e, (doc, paths, a)) =>
          substitute(e, doc, paths, a.toAttribute)
        }
        // restore the original schema above the widened filter
        Project(child.output, Filter(c2, inner))
      }
  }
}

/** Rule (3): defer parse-bearing projections past a total-order top-k.
  *
  * Matches `GlobalLimit(n, LocalLimit(n, Sort(order, global=true,
  * <stack of deterministic Projects>(base))))` where some stack level
  * contains a parse expression and every sort key is an attribute that
  * resolves level-by-level to a base attribute (alias-of-attribute or
  * pass-through at each level). Rewrites to re-apply the whole projection
  * stack ABOVE the limit, sorting the base rows directly:
  *
  *   Project*(GlobalLimit(LocalLimit(Sort(order', Project(passthrough,
  *   base)))))
  *
  * The sort keys' VALUES are identical (attribute-for-attribute
  * substitution), so the selected top-n rows and their order are exactly
  * the ones the original plan produced; the deferred projections are
  * deterministic row-local functions, so re-applying them above the limit
  * yields identical output rows. The physical win: the parse runs on n
  * rows instead of the whole table, and the top-k heap carries narrow base
  * columns instead of parsed structs.
  */
object DeferParsePastTopK extends Rule[LogicalPlan] {

  private val maxStack = 4

  /** Peel consecutive deterministic Projects, top-down. */
  private def unstack(p: LogicalPlan): (List[Seq[NamedExpression]], LogicalPlan) = {
    def loop(q: LogicalPlan, acc: List[Seq[NamedExpression]])
        : (List[Seq[NamedExpression]], LogicalPlan) = q match {
      case Project(list, child)
          if acc.size < maxStack && list.forall(_.deterministic) =>
        loop(child, acc :+ list)
      case other => (acc, other)
    }
    loop(p, Nil)
  }

  /** Resolve an attribute through the projection stack to a base attribute:
    * at each level it must be either passed through or aliased directly to
    * an attribute of the next level.
    */
  private def resolveDown(a: Attribute, lists: List[Seq[NamedExpression]],
                          baseOut: AttributeSet): Option[Attribute] =
    lists match {
      case Nil => if (baseOut.contains(a)) Some(a) else None
      case l :: rest =>
        l.find(_.toAttribute.exprId == a.exprId) match {
          case Some(al: Alias) => al.child match {
            case attr: Attribute => resolveDown(attr, rest, baseOut)
            case _               => None
          }
          case Some(attr: Attribute) => resolveDown(attr, rest, baseOut)
          case _                     => None
        }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case gl @ GlobalLimit(glim, LocalLimit(llim, Sort(order, true, proj: Project, hint))) =>
      val (stack, base) = unstack(proj)
      val deferrable =
        stack.nonEmpty && stack.exists(_.exists(ParseCost.containsParse))
      if (!deferrable) gl
      else {
        val newOrder = order.map { so =>
          so.child match {
            case a: Attribute =>
              resolveDown(a, stack, base.outputSet)
                .map(na => SortOrder(na, so.direction, so.nullOrdering, Seq.empty))
            case _ => None
          }
        }
        if (newOrder.exists(_.isEmpty)) gl
        else {
          val order2 = newOrder.map(_.get)
          val needed = AttributeSet(
            stack.last.flatMap(_.references) ++ order2.flatMap(_.references))
          val pass = base.output.filter(needed.contains)
          val inner: LogicalPlan =
            if (pass.length == base.output.length) base else Project(pass, base)
          val limited: LogicalPlan =
            GlobalLimit(glim, LocalLimit(llim, Sort(order2, global = true, inner, hint)))
          stack.foldRight(limited) { (list, child) => Project(list, child) }
        }
      }
  }
}

/** Physical planning guard (r19): keep a parse materialized below a filter
  * at execution time.
  *
  * The r18 logical rules leave shapes like `Filter(pred(xr.opt),
  * Project(pk, xr = from_xml(...)))` — one parse per input row, the filter
  * reading the materialized struct. But physical planning's ScanOperation
  * (FileSourceStrategy's Project/Filter collector) substitutes a
  * projection alias into a filter condition whenever the condition
  * references it at most once, RE-INLINING the parse: the committed
  * fz31006 capture shows `isnotnull(from_xml(...).opt)` evaluated per input
  * row in the Filter AND `from_xml(...)` evaluated again per surviving row
  * in the Project above it — N + 0.83N parses where N suffice. No logical
  * rewrite can prevent this (extraOptimizations run before planning; the
  * collapse is planner-side), so this Strategy claims the exact shape
  * first (extraStrategies precede the built-ins) and plans it as
  * `FilterExec(parse-conjuncts, ProjectExec(list, planLater(child')))`,
  * pinning the filter ABOVE the projection. Conjuncts that do not touch a
  * parse-bearing alias are pushed into child' so their scan pushdown is
  * untouched; both execs whole-stage-codegen like the ScanOperation
  * arrangement, so the only execution difference is the parse count.
  * Values/rows are unchanged: the same conjunction is evaluated over the
  * same rows, only the evaluation placement moves.
  */
object ParseProjectGuardStrategy
    extends org.apache.spark.sql.execution.SparkStrategy with PredicateHelper {
  import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan}

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Filter(cond, proj @ Project(list, child))
        if cond.deterministic && list.forall(_.deterministic) => {
      val parseAttrs = AttributeSet(list.collect {
        case a: Alias if ParseCost.containsParse(a.child) => a.toAttribute
      })
      if (parseAttrs.isEmpty || cond.references.intersect(parseAttrs).isEmpty) {
        Nil
      } else {
        val (up, down) = splitConjunctivePredicates(cond)
          .partition(_.references.intersect(parseAttrs).nonEmpty)
        val newChild: LogicalPlan =
          if (down.isEmpty) child else Filter(down.reduce(And), child)
        // explicit column pruning: claiming the Project here bypasses
        // ScanOperation's needed-column computation, so restate it — the
        // child subtree only has to produce what the projection reads
        val needed = child.output.filter(list.map(_.references)
          .foldLeft(AttributeSet.empty)(_ ++ _).contains)
        val pruned: LogicalPlan =
          if (needed.length == child.output.length) newChild
          else Project(needed, newChild)
        FilterExec(up.reduce(And),
          ProjectExec(list, planLater(pruned))) :: Nil
      }
    }
    case _ => Nil
  }
}

object ParseReuseRules {
  val rules: Seq[Rule[LogicalPlan]] =
    Seq(PullFilterAboveParseProject, FactorPathExtraction, FactorParse,
      DeferParsePastTopK)

  /** Runtime installation beside LevenshteinBandRule; idempotent.
    * SPARK_GRAFT_DISABLE_PARSE_REUSE=1 skips the whole family — a
    * measurement hook only (isolated A/B of the rules themselves, r18
    * verdict #8), never set in any declared surface.
    */
  def install(spark: SparkSession): Unit = {
    if (sys.env.get("SPARK_GRAFT_DISABLE_PARSE_REUSE").contains("1")) return
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
    }
    if (!spark.experimental.extraStrategies.contains(ParseProjectGuardStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ ParseProjectGuardStrategy
    }
  }
}
