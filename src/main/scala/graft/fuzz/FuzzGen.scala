package graft.fuzz

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

import graft.Tables

/** Seeded random relational query generator for differential testing.
  *
  * Every generated query is rendered TWICE from one draw: as a DataFrame-API
  * plan (built with Column operators, never `expr(...)` — the point is two
  * independent construction paths) and as ANSI SQL that both `spark.sql` and
  * the driver's DuckDB oracle can run. FuzzSpec hash-compares the two Spark
  * paths for ≥100 seeds; a fixed sample is declared in SparkEntry as
  * `fz*` entries so the DRIVER's DuckDB differential covers the generator's
  * grammar too (randomized plans are the correctness tier above the
  * hand-declared inventory).
  *
  * Grammar, deliberately restricted to the cross-engine-deterministic
  * fragment:
  *   - chains of 1-3 corpus tables over the TPC-H FK edges, INNER or LEFT;
  *   - AND/OR of typed comparisons, modulo tests, LIKE, IS NOT NULL;
  *   - projection mode (2-4 cols + optional computed int/case expr, total
  *     ORDER BY over every output column, LIMIT);
  *   - grouped / global aggregation from {count(*), count(col),
  *     count(DISTINCT int/string), sum(int), min/max(any)} with optional
  *     HAVING — never sum/avg over doubles (accumulation order is
  *     engine-dependent; min/max/comparisons over doubles are exact).
  *   - every ORDER BY key is ASC NULLS FIRST in both renderings (Spark's
  *     asc default; DuckDB's default is NULLS LAST, so the SQL is explicit).
  *
  * Grammar v2 ([[query(seed:Int,version:Int)*]]) is a SUPERSET adding two
  * modes, reached by an up-front draw so v1 seeds are bit-identical:
  *   - window functions {row_number, rank, dense_rank, lag, partition sum,
  *     running sum} over PARTITION BY a groupable column — row_number/lag/
  *     running-sum order by the head table's UNIQUE key (total within the
  *     partition, so deterministic); rank/dense_rank order by an arbitrary
  *     column (ties collapse identically in every engine);
  *   - set operations {UNION ALL, INTERSECT, EXCEPT} of two differently-
  *     filtered projections of one table (DISTINCT set semantics for
  *     INTERSECT/EXCEPT in both engines; UNION ALL duplicates are
  *     indistinguishable rows, so the total ORDER BY stays deterministic).
  *
  * Grammar v3 widens the fall-through body (same up-front dispatch as v2):
  *   - IN-lists and BETWEEN predicates (int/double/timestamp BETWEEN,
  *     int/string IN — literal pools are value-ordered so BETWEEN bounds
  *     are drawn lo < hi);
  *   - SELECT DISTINCT projections;
  *   - avg over INTEGER columns (sums stay below 2^53 so accumulation is
  *     exact in LONG or DOUBLE; one IEEE division — order-free; avg over
  *     doubles stays excluded);
  *   - per-key ORDER BY direction: ASC NULLS FIRST or DESC NULLS LAST,
  *     explicit in both renderings.
  *
  * Grammar v4 widens the v2 modes:
  *   - window functions {lead, first_value, last_value, ntile} — all
  *     order-dependent, so drawn only on verified-unique head keys (the
  *     same remap-to-value-deterministic rule as row_number/lag); frames
  *     are explicit in both renderings (DuckDB's default first_value frame
  *     is RANGE-based, Spark's aggregate-over-window is ROWS-based);
  *   - two-column PARTITION BY;
  *   - UNION (distinct) beside UNION ALL in set-op mode.
  * Grammar v5 adds two modes dispatched by an extra up-front draw (taken
  * only at version ≥ 5, so all older (seed, version) pairs keep their
  * draws):
  *   - subquery mode: IN (SELECT pk …), correlated EXISTS / NOT EXISTS on
  *     an FK edge, or a scalar-aggregate comparison
  *     `col > (SELECT min/max/avg(int) FROM …)`. The SQL rendering makes
  *     both engines DECORRELATE (subquery → join rewrite); the DataFrame
  *     rendering is the direct semi/anti/cross-join-aggregate plan — the
  *     two paths meet only if the rewrite is semantics-preserving. NOT IN
  *     is deliberately absent (its NULL semantics differ from anti join);
  *     the anti shape is drawn as NOT EXISTS, which IS the anti join.
  *   - derived-table mode: aggregate a fact table by its FK in a subquery
  *     (optional HAVING), then join the aggregate to the dimension — the
  *     aggregate-below-join shape (TPC-H q15's) that v1's single
  *     aggregation level can't draw.
  * Grammar v6 extends the differential to the EVENTS table (an extra
  * up-front draw taken only at version ≥ 6): the shared proj/group/global
  * body and the window generator run with the chain forced to
  * single-table events — timestamps with real microsecond data, a
  * sf-dependent-cardinality int key (user_id), and JSON-shaped strings
  * (props, compared only with portable string operators) flow through
  * every predicate/agg/window shape the older grammars draw. Motivated by
  * the r9 regression: the corpus silently re-encoded events.ts
  * (NANOS→MICROS) and no generated query covered the table.
  * Grammar v7 does the same for the DOCUMENTS table (text corpus: long
  * strings under the portable comparison/LIKE operators, two groupable
  * dims, an int length column) — with events and documents both drawn,
  * every corpus table except embeddings (whose ARRAY<FLOAT> column has no
  * portable scalar grammar; SchemaCanarySpec still pins its schema) is
  * fuzzed, so a silent regeneration of any of them trips the generated
  * tier, not just the hand-written queries.
  * Grammar v8 reaches the remaining shapes over those two tables: set
  * operations (UNION ALL / UNION / INTERSECT / EXCEPT of two differently-
  * filtered projections) and UNCORRELATED scalar subqueries
  * (`col cmp (SELECT min/max/avg … FROM same_table WHERE …)`) — the
  * correlated membership shapes are impossible self-table (the `(pk = fk)`
  * correlation would be a same-column tautology) and events/documents have
  * no FK edge into the TPC-H dims.
  * Grammar v9 joins the two corpus families: `events.user_id →
  * customer.c_custkey` is a genuine FK containment (verified: every
  * user_id matches a customer at sf0.001/0.01/0.1), so the edge flows
  * through every join-bearing mode — the shared body over
  * events⋈customer and events⋈customer⋈nation chains, windows headed by
  * the (unique) event_id, membership/scalar subqueries filtering events
  * through customer, and the aggregate-below-join derived-table shape
  * (per-user event aggregates joined to the customer dimension — the
  * canonical behavioral-analytics rollup). Until v9 no generated query
  * joined an analytics table to a TPC-H dim.
  * Grammar v10 adds three COMPOSITIONAL shapes the flat modes can't draw:
  *   - conditional aggregates — measures under a CASE guard
  *     (`sum(CASE WHEN p THEN 1 ELSE 0 END)`, `min/max(CASE WHEN p THEN c
  *     END)` with the NULL else) over any chain incl. the v9 cross-family
  *     edge; counts stay integer-exact, min/max are value-deterministic,
  *     and the no-ELSE NULL branch exercises NULL-skipping agg semantics
  *     in both engines;
  *   - set operations over JOINED projections — v2/v8's set-op mode reads
  *     one table; v10 unions/intersects/excepts two differently-filtered
  *     projections of a two-table join (dup-elimination over join output);
  *   - aggregate-of-aggregate — per-key counts in a derived table
  *     re-aggregated globally or by a modulo bucket of the key (the
  *     distribution-of-group-sizes shape; two aggregation LEVELS, where
  *     v5's derived mode has one level plus a dim join).
  * Grammar v11 adds three shapes around NULL and multi-level grouping
  * semantics no older mode draws:
  *   - grouping sets — `GROUP BY ROLLUP/CUBE (k0, k1)` with `GROUPING()`
  *     flags projected (cast BIGINT both sides — Spark's grouping() is
  *     BYTE, DuckDB's is typed differently); the super-aggregate rows'
  *     NULL keys flow through the ORDER BY NULLS discipline, and the
  *     (g0, g1, k0, k1) prefix is a candidate key of the output so the
  *     total order holds across grouping sets;
  *   - LEFT joins that actually MISS — every chain edge in the corpus is
  *     FK-contained, so no older LEFT join ever produced a NULL right
  *     side; v11 pushes a dimension predicate into the compound ON clause
  *     (`LEFT JOIN dim ON (fk = pk AND p)`), then draws the IS NULL anti
  *     filter, a COALESCE repair projection beside a matched flag, or a
  *     GROUP BY over the matched flag — the NULL-extension semantics of
  *     outer join under each consuming shape;
  *   - top-N groups — grouped aggregation ORDERED BY the aggregate
  *     (DESC NULLS LAST, group keys as the unique tiebreak) under LIMIT:
  *     every older grouped mode orders by keys only and never limits, so
  *     limit-at-a-tie-boundary over aggregate values was undrawn.
  * Grammar v12 adds the remaining join/set semantics no mode draws:
  *   - FULL OUTER joins — predicates on BOTH sides pushed into the
  *     compound ON clause make both sides miss, so the output carries
  *     NULL-extended rows in both directions; consumed as a COALESCE'd
  *     key + CASE source tag projection or a GROUP BY over the tag;
  *   - INTERSECT ALL / EXCEPT ALL — the bag-semantics set operations
  *     (multiset intersection/difference retain duplicate multiplicity;
  *     v2/v8's INTERSECT/EXCEPT are the DISTINCT forms);
  *   - aggregate⋈aggregate — two differently-filtered groupings of one
  *     fact table (or of customer/supplier on the shared nation key)
  *     joined per key: the compare-two-cohorts shape with two
  *     aggregation pipelines meeting at a join, INNER or LEFT (LEFT
  *     makes the right cohort's aggregates NULL for missing keys).
  * Grammar v13 moves the differential from plan shapes to SCALAR
  * semantics — the classic cross-engine divergence surface (indexing
  * bases, character vs byte lengths, type-promotion rules) the older
  * grammars barely touch:
  *   - computed projections — upper/substr(1-based)/length over strings,
  *     BIGINT-cast-first addition/doubling over ints (cast BEFORE the op:
  *     engines disagree on overflow behavior, not on BIGINT arithmetic),
  *     year/month/day extraction over timestamps (cast BIGINT — Spark
  *     returns INT, DuckDB BIGINT);
  *   - sliding-frame windows — sum/min/max/count OVER (... ROWS BETWEEN
  *     k PRECEDING AND CURRENT ROW) on verified-unique key orderings
  *     (every older window frame is unbounded, running, or whole-
  *     partition; a bounded moving frame was undrawn);
  *   - CASE-expression GROUP BY keys — grouping by a computed predicate
  *     bucket (plus sometimes a raw second key), where every older
  *     grouped mode keys on raw columns (v10's modulo bucket excepted).
  * Grammar v14 adds three more undrawn shapes:
  *   - CORRELATED scalar subqueries — `(SELECT max(ic) FROM inner WHERE
  *     pk = fk AND …)` in the projection (NULL where no inner row
  *     qualifies) or in WHERE (the NULL comparison drops the row in both
  *     engines); the SQL side forces both engines through correlated
  *     scalar DECORRELATION (TPC-H q17's path), the DataFrame side is
  *     the already-decorrelated LEFT-JOIN-on-per-key-aggregate plan. v5
  *     draws only UNcorrelated scalars;
  *   - HAVING over a non-count aggregate — `HAVING max(ic) > v` /
  *     `HAVING min(ic) <= v` (every older HAVING is count(*) > h);
  *   - three-branch UNION ALL — associativity/column-alignment over more
  *     than two inputs (every older set-op has exactly two).
  * Grammar v15 adds:
  *   - window-over-aggregate — rank/dense_rank/row_number OVER the
  *     aggregate value (DESC, group keys as the unique tiebreak) in the
  *     same grouped SELECT: both engines evaluate window functions AFTER
  *     aggregation, and every older window runs over base rows. The
  *     window result is cast BIGINT (Spark rank is INT, DuckDB BIGINT);
  *   - LIMIT n OFFSET m pagination under a total ORDER BY (OFFSET is
  *     undrawn anywhere older — limit-boundary arithmetic differs from
  *     plain LIMIT);
  *   - NULLIF / IS DISTINCT FROM — NULL-injection and null-safe
  *     comparison scalars (NULLIF manufactures NULLs mid-projection that
  *     then flow through the ORDER BY NULLS placement; <=> vs = under
  *     those NULLs is exactly the semantics the null-safe operator
  *     exists for).
  * Grammar v17 closes the round-11 coverage asymmetry: base-table columns
  * are never NULL, so three-valued logic was under-fuzzed everywhere
  * (v11/v12 manufacture NULLs only through outer-join extension, v15 only
  * through NULLIF). v17 decorates a corpus table with a DETERMINISTIC
  * NULL-injecting derived view — `CASE WHEN (pk % m) = r THEN NULL ELSE c
  * END` over 1-2 drawn victim columns, identical in the shared-dialect SQL
  * and the DataFrame rendering (the v16 TableOverride mechanism, here with
  * ONE SQL text since both engines speak CASE) — and runs three mode
  * families over it:
  *   - dedicated NULL-semantics predicates ([[nullPredQuery]]): NOT IN
  *     over the nullable column (the all-rows-vanish trap: a NULL operand
  *     makes the whole NOT IN evaluate to NULL, dropping the row in both
  *     engines), IN-lists CONTAINING a NULL literal, IS [NOT] DISTINCT
  *     FROM (null-safe comparison — IS DISTINCT FROM keeps the NULL rows
  *     a <> would drop), IS NULL filters, COALESCE repair, and the
  *     NULL-skipping aggregate contrast (count(*) vs count(c) vs
  *     count(DISTINCT c) vs sum/min/max over a partially-NULL column);
  *   - the shared proj/group/global body over the nullable view — NULL
  *     group keys, NULL-skipping aggregates, and NULLS FIRST/LAST
  *     placement under both ASC and DESC ordering of genuinely-NULL data;
  *   - the window generator over the nullable view — rank/value windows
  *     whose partition or order columns carry real NULLs (the unique head
  *     key is never a victim, so order-dependent draws stay total).
  * Grammar v18 pushes the NULLs into JOIN KEYS — the semantics v17 cannot
  * reach because its victims never participate in a join: a NULL key
  * matches NOTHING under `=` (inner joins silently drop the row, LEFT
  * joins NULL-extend it exactly like a miss), while `IS NOT DISTINCT
  * FROM` makes NULL meet NULL (the null-safe join both engines must plan
  * as an equi hash join, never a nested loop). Four mode families:
  *   - the shared body over a 2-table FK chain whose FACT-side key is
  *     NULL-injected ([[drawJoinNullOverride]]) — INNER joins lose the
  *     1-in-m NULL-key rows, LEFT joins push NULL-extended dim columns
  *     into group keys / aggregates / projections;
  *   - the window generator over the same chain — partition/order columns
  *     from a dim side that genuinely missed;
  *   - `[NOT] IN (SELECT …)` whose subquery projection is NULL-poisoned
  *     ([[notInSubqQuery]]) — one NULL in the subquery makes NOT IN drop
  *     EVERY row (the all-rows-vanish trap at the subquery level; v17
  *     only drew it over literal lists), and the DataFrame rendering
  *     builds the three-valued plan Spark's own rewrite produces: anti
  *     join on `fk = v OR fk IS NULL OR v IS NULL`;
  *   - the null-safe join itself ([[nullSafeJoinQuery]]): both sides
  *     NULL-injected, joined ON `fk IS NOT DISTINCT FROM pk` — the
  *     NULL⋈NULL cross-match bounded by the tiny nation dim.
  * Grammar v20 collides the two NULL species: GROUP BY ROLLUP/CUBE over a
  * NULL-INJECTED group key produces rows where k IS NULL for two
  * different reasons — the real NULL group (the injected rows aggregate
  * together) and the super-aggregate rows (the engine pins k to NULL for
  * the rolled-up sets) — distinguishable ONLY by GROUPING(). Both engines
  * must produce the same flag-disambiguated row set, the same NULL-group
  * aggregates (NULL-skipping sums/counts over the NULL group), and the
  * same ORDER BY placement when real and synthetic NULLs sort side by
  * side ([[rollupNullQuery]]).
  * Grammar v19 pins the one NULL-key contrast v18 leaves implicit: the
  * SAME membership question asked four ways over a NULL-injected FK —
  * correlated `[NOT] EXISTS (SELECT 1 FROM dim WHERE pk = fk)` vs
  * uncorrelated `fk [NOT] IN (SELECT pk FROM dim)`. EXISTS is two-valued
  * (a NULL fk simply never correlates), so NOT EXISTS KEEPS the NULL-key
  * rows; NOT IN is three-valued (NULL fk ⇒ unknown ⇒ dropped), so the
  * same rows vanish — the classic anti-join-vs-NOT-IN trap every engine
  * migration hits, here frozen as a differential with per-quantifier
  * survivor counts ([[existsNullQuery]]).
  * Grammar v21 draws the frame semantics every older window mode avoids:
  * RANGE-valued frames. The ROWS frames of v2 (running sum) and v13
  * (sliding) count physical rows, so every one of them orders by the
  * unique head key precisely to keep peer order out of the result. A
  * RANGE frame is defined by VALUE distance — the frame of a row with
  * order value v is every row of the partition whose value lies within
  * [v-kPre, v+kFol] — so ties are harmless (peers share one frame) and
  * the grammar deliberately orders by NON-unique integer columns where
  * peer groups are real and value GAPS make RANGE diverge from ROWS on
  * nearly every draw. Four frame shapes (bounded-preceding, bounded both
  * sides, bounded-following, and the SQL-standard DEFAULT frame — ORDER
  * BY with no frame clause, which the standard defines as RANGE UNBOUNDED
  * PRECEDING..CURRENT ROW with peers INCLUDED; the DF rendering spells
  * that default explicitly, so the differential pins that both engines'
  * implicit frame really is the standard's RANGE one), plus a DESC coin
  * that flips the frame direction ([[rangeWindowQuery]]).
  * Grammar v22 moves the differential onto TEMPORAL semantics — the
  * calendar arithmetic no older mode computes (they only compare and
  * min/max raw timestamps): date_trunc bucketing as GROUP BY keys and
  * window PARTITION keys (every truncation unit year..hour/minute;
  * DuckDB returns DATE for day-and-coarser units while Spark returns
  * TIMESTAMP, so the shared SQL wraps CAST(.. AS TIMESTAMP) — itself a
  * portability fact the grammar pins), EXTRACT field projections and
  * predicates (YEAR..MINUTE, CAST BIGINT — the engines' native EXTRACT
  * types differ), and timestamp ± INTERVAL shifts (shared unquoted
  * `INTERVAL k unit` syntax; month arithmetic must CLAMP identically —
  * Jan 31 + 1 MONTH = Feb 29 in both engines) under shifted comparisons
  * and BETWEEN ([[temporalQuery]]).
  * Grammar v23 widens the STRING-scalar surface beyond v13's
  * upper/substr/length: computed projections (lower, reverse, replace
  * with corpus-profiled search literals, left/right prefixes, lpad/rpad
  * incl. the truncate-when-longer path, || concatenation with its
  * NULL-propagates-both-engines contract), split_part as a COMPUTED
  * GROUP BY key (shared 1-based semantics, out-of-range part → empty
  * string in both engines), and instr/length integer arithmetic
  * (1-based find, 0 when absent, CAST BIGINT both sides)
  * ([[strScalarQuery]]).
  * Every widened draw sits above the older version's range or behind a
  * version guard: v1/v2/v3/v4 seeds keep their DRAWS forever (pinned by
  * FuzzSpec's SQL-hash test). One deliberate rendering-only change
  * (round 7): integer sums are emitted as `CAST(sum(x) AS BIGINT)` on the
  * SQL side — DuckDB's sum(INTEGER) is HUGEINT, which the driver's value
  * canonicalization renders as float ("3.0" ≠ Spark LONG "3"); this was
  * the r6 hash-mismatch on all 8 sum-bearing fz seeds. No RNG draw moved,
  * so only sum-bearing seeds re-pinned.
  */
object FuzzGen {

  /** The corpus's embedding dimensionality. v16's element-index draws go
    * 1..EmbeddingDim, which under ANSI would THROW in Spark but silently
    * yield NULL in DuckDB if the corpus were ever regenerated narrower —
    * the two renderings failing DIFFERENTLY (ADVICE r11). FuzzSpec's
    * "embeddings are EmbeddingDim-wide" test pins the corpus fact so a dim
    * change fails loudly and identically before any generated query runs.
    */
  val EmbeddingDim = 64

  /** A literal rendered for both paths. */
  final case class Lit(sql: String, col: Column)

  /** kind: 'i' integral, 'd' double, 's' string, 't' timestamp.
    * `groupable` marks low-cardinality columns safe as GROUP BY keys.
    */
  final case class FCol(name: String, kind: Char, lits: Seq[Lit],
                        groupable: Boolean = false)

  private def iLit(vs: Int*): Seq[Lit] = vs.map(v => Lit(v.toString, lit(v)))
  private def dLit(vs: Double*): Seq[Lit] = vs.map(v => Lit(v.toString, lit(v)))
  private def sLit(vs: String*): Seq[Lit] = vs.map(v => Lit(s"'$v'", lit(v)))
  private def tLit(vs: String*): Seq[Lit] = vs.map { v =>
    Lit(s"TIMESTAMP '$v'", to_timestamp(lit(v)))
  }

  private[graft] val catalog: Map[String, Seq[FCol]] = Map(
    "region" -> Seq(
      FCol("r_regionkey", 'i', iLit(1, 2, 3), groupable = true),
      FCol("r_name", 's', sLit("AMERICA", "ASIA", "EUROPE"), groupable = true)),
    "nation" -> Seq(
      FCol("n_nationkey", 'i', iLit(5, 10, 15, 20), groupable = true),
      FCol("n_name", 's', sLit("CHINA", "FRANCE", "KENYA", "PERU"), groupable = true),
      FCol("n_regionkey", 'i', iLit(1, 2, 3), groupable = true)),
    "customer" -> Seq(
      FCol("c_custkey", 'i', iLit(100, 400, 700, 1200)),
      FCol("c_name", 's', sLit("Customer#000000400", "M")),
      FCol("c_nationkey", 'i', iLit(5, 10, 15, 20), groupable = true),
      FCol("c_acctbal", 'd', dLit(-500.0, 0.0, 1000.0, 5000.0, 9000.0)),
      FCol("c_mktsegment", 's',
        sLit("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
        groupable = true)),
    "supplier" -> Seq(
      FCol("s_suppkey", 'i', iLit(10, 40, 70, 95)),
      FCol("s_name", 's', sLit("Supplier#000000040", "S")),
      FCol("s_nationkey", 'i', iLit(5, 10, 15, 20), groupable = true),
      FCol("s_acctbal", 'd', dLit(-500.0, 0.0, 1000.0, 5000.0, 9000.0))),
    "part" -> Seq(
      FCol("p_partkey", 'i', iLit(200, 800, 1400, 1900)),
      FCol("p_name", 's', sLit("a", "m", "s")),
      FCol("p_brand", 's', sLit("Brand#11", "Brand#23", "Brand#35", "Brand#44"),
        groupable = true),
      FCol("p_type", 's', sLit("ECONOMY", "LARGE", "SMALL", "STANDARD")),
      FCol("p_size", 'i', iLit(5, 15, 25, 35, 45), groupable = true),
      FCol("p_retailprice", 'd', dLit(910.0, 940.0, 970.0, 995.0))),
    "orders" -> Seq(
      FCol("o_orderkey", 'i', iLit(500, 5000, 20000, 50000)),
      FCol("o_custkey", 'i', iLit(100, 400, 700, 1200)),
      FCol("o_orderstatus", 's', sLit("F", "O", "P"), groupable = true),
      FCol("o_totalprice", 'd', dLit(5000.0, 50000.0, 150000.0, 300000.0)),
      FCol("o_orderdate", 't',
        tLit("1996-01-01 00:00:00", "1997-06-15 00:00:00", "1999-01-01 00:00:00",
          "2000-06-01 00:00:00")),
      FCol("o_orderpriority", 's',
        sLit("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        groupable = true)),
    "lineitem" -> Seq(
      FCol("l_orderkey", 'i', iLit(500, 5000, 20000, 50000)),
      FCol("l_partkey", 'i', iLit(200, 800, 1400, 1900)),
      FCol("l_suppkey", 'i', iLit(10, 40, 70, 95)),
      FCol("l_linenumber", 'i', iLit(1, 2, 3, 4), groupable = true),
      FCol("l_quantity", 'd', dLit(5.0, 10.0, 25.0, 40.0, 49.0)),
      FCol("l_extendedprice", 'd', dLit(1000.0, 10000.0, 50000.0, 90000.0)),
      FCol("l_discount", 'd', dLit(0.02, 0.04, 0.05, 0.07, 0.09)),
      FCol("l_tax", 'd', dLit(0.01, 0.03, 0.05, 0.07)),
      FCol("l_returnflag", 's', sLit("A", "N", "R"), groupable = true),
      FCol("l_linestatus", 's', sLit("F", "O"), groupable = true),
      FCol("l_shipdate", 't',
        tLit("1996-01-01 00:00:00", "1997-06-15 00:00:00", "1999-01-01 00:00:00",
          "2000-06-01 00:00:00"))),
    // v6: the events table (its r9 silent-re-encode regression is exactly
    // the class a generated differential over ts would have caught at the
    // first sweep — VERDICT r9 item 7). Literal pools profiled from the
    // corpus: ts spans 2024-01-01..01-30 at every sf; user_id 0..14 at
    // sf0.001 (so literals stay ≤14 to select at both SFs); value
    // 0.01..490; props is a JSON-shaped STRING compared only with the
    // portable string operators (=/<>/LIKE) — JSON path functions are NOT
    // drawn (Spark and DuckDB share no JSON syntax; the hand-declared f9/
    // x5 entries cover JSON semantics).
    "events" -> Seq(
      FCol("event_id", 'i', iLit(100, 300, 600, 900)),
      FCol("ts", 't',
        tLit("2024-01-05 00:00:00", "2024-01-12 00:00:00",
          "2024-01-20 00:00:00", "2024-01-27 00:00:00")),
      FCol("user_id", 'i', iLit(2, 5, 9, 13), groupable = true),
      FCol("event_type", 's',
        sLit("click", "error", "purchase", "signup", "view"),
        groupable = true),
      FCol("value", 'd', dLit(5.0, 50.0, 150.0, 300.0)),
      FCol("props", 's', sLit("{\"k\": 7}", "{\"k\": 42}", "{\"k\": 87}"))),
    // v7: the documents table (text corpus — long space-separated strings,
    // 5/20-way groupable dims, an int length column). doc_id runs 0..499 at
    // sf0.001/0.01 and 0..4999 at sf0.1, so the literal pool stays < 500 to
    // select at every sf; text is compared only with the portable string
    // operators (long-string =/<>/>=/< and LIKE are engine-identical).
    "documents" -> Seq(
      FCol("doc_id", 'i', iLit(50, 150, 300, 450)),
      FCol("text", 's', sLit("join", "spark", "the")),
      FCol("lang", 's', sLit("de", "en", "es", "fr", "zh"), groupable = true),
      FCol("source", 's', sLit("src11", "src17", "src3"), groupable = true),
      FCol("n_chars", 'i', iLit(100, 250, 400, 500))),
    // v16: the derived scalar view over EMBEDDINGS — the last corpus table
    // with zero generated coverage (its ARRAY<FLOAT> column has no portable
    // scalar grammar, so the fuzz surface is a per-seed DERIVED TABLE of
    // integer-exact projections; see [[drawEmbOverride]]). Column
    // definitions vary per seed (which element, which slice), but names and
    // literal pools are fixed: every value is floor(1e6·x) of a per-row
    // correctly-rounded IEEE derivation (never an accumulated float across
    // rows — the x15/x20 determinism rule), so all downstream predicates /
    // aggregates / windows run on exact BIGINTs. Pools profiled from the
    // corpus (element values ±0.41 ⇒ e_a/e_b ±410k around 0; 4-16-element
    // head sums ⇒ e_s wider; 8-32-element squared sums of UNIT vectors
    // ⇒ e_q ≈ 1e6·k/64; positives-per-vector e_np ≈ 32±4; vec_id dense
    // 0..499 at sf0.001/0.01; label 0..9).
    "emb" -> Seq(
      FCol("vec_id", 'i', iLit(60, 180, 320, 460)),
      FCol("label", 'i', iLit(2, 4, 7), groupable = true),
      FCol("e_a", 'i', iLit(-150000, -50000, 0, 50000, 150000)),
      FCol("e_b", 'i', iLit(-150000, -50000, 0, 50000, 150000)),
      FCol("e_s", 'i', iLit(-300000, -80000, 0, 80000, 300000)),
      FCol("e_q", 'i', iLit(100000, 200000, 350000, 500000)),
      FCol("e_np", 'i', iLit(28, 31, 33, 36))))

  /** VERIFIED-unique key of each table in the synthetic corpus. FK-chain
    * joins go FK → unique PK, so a chain's output rows stay uniquely
    * identified by the HEAD table's key (INNER may drop rows, LEFT keeps
    * all; neither duplicates) — which is what makes window ORDER BY over
    * these keys total, hence row_number/lag/running-sum deterministic
    * across engines.
    *
    * lineitem is deliberately ABSENT: the synthetic corpus violates the
    * TPC-H (l_orderkey, l_linenumber) PK (~20% duplicate pairs at every
    * sf — found by the cross-engine differential: Spark and DuckDB
    * tie-break row_number/lag differently on the dups). lineitem-headed
    * chains therefore only draw the VALUE-deterministic window functions
    * (rank / dense_rank / whole-partition sum), which assign each row a
    * result independent of peer order.
    */
  private val uniqueKeys: Map[String, Seq[String]] = Map(
    "region"   -> Seq("r_regionkey"),
    "nation"   -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part"     -> Seq("p_partkey"),
    "orders"   -> Seq("o_orderkey"),
    // count(DISTINCT event_id) = count(*) verified at sf0.001/0.01/0.1
    "events"   -> Seq("event_id"),
    // doc_id is 0..N-1 dense, verified distinct at sf0.001/0.01/0.1
    "documents" -> Seq("doc_id"),
    // v16's derived view keeps embeddings' vec_id (0..N-1 dense, verified
    // distinct at sf0.001/0.01/0.1) as its unique head key
    "emb" -> Seq("vec_id"))

  /** Window sort-preference columns per head table: the PK where verified
    * unique, the (non-unique) PK-shaped pair for lineitem — usable as a
    * window ORDER BY only under value-deterministic functions.
    */
  private val headOrderCols: Map[String, Seq[String]] =
    uniqueKeys + ("lineitem" -> Seq("l_orderkey", "l_linenumber"))

  /** tables(0) ⋈ tables(1) ON joins(0), ⋈ tables(2) ON joins(1), … */
  final case class Chain(tables: Seq[String], joins: Seq[(String, String)])

  private val chains: Seq[Chain] = Seq(
    Chain(Seq("lineitem"), Nil),
    Chain(Seq("orders"), Nil),
    Chain(Seq("customer"), Nil),
    Chain(Seq("part"), Nil),
    Chain(Seq("supplier"), Nil),
    Chain(Seq("nation"), Nil),
    Chain(Seq("lineitem", "orders"), Seq("l_orderkey" -> "o_orderkey")),
    Chain(Seq("lineitem", "part"), Seq("l_partkey" -> "p_partkey")),
    Chain(Seq("lineitem", "supplier"), Seq("l_suppkey" -> "s_suppkey")),
    Chain(Seq("orders", "customer"), Seq("o_custkey" -> "c_custkey")),
    Chain(Seq("customer", "nation"), Seq("c_nationkey" -> "n_nationkey")),
    Chain(Seq("supplier", "nation"), Seq("s_nationkey" -> "n_nationkey")),
    Chain(Seq("nation", "region"), Seq("n_regionkey" -> "r_regionkey")),
    Chain(Seq("lineitem", "orders", "customer"),
      Seq("l_orderkey" -> "o_orderkey", "o_custkey" -> "c_custkey")),
    Chain(Seq("orders", "customer", "nation"),
      Seq("o_custkey" -> "c_custkey", "c_nationkey" -> "n_nationkey")),
    Chain(Seq("customer", "nation", "region"),
      Seq("c_nationkey" -> "n_nationkey", "n_regionkey" -> "r_regionkey")),
    Chain(Seq("supplier", "nation", "region"),
      Seq("s_nationkey" -> "n_nationkey", "n_regionkey" -> "r_regionkey")))

  /** v6's forced chain: events has no FK edge into the TPC-H dims (user_id
    * is its own id space), so it is drawn single-table and deliberately
    * kept OUT of [[chains]] — versions ≤ 5 must never draw it.
    */
  private val eventsChain = Chain(Seq("events"), Nil)

  /** v7's forced chain: documents joins nothing in the corpus (its dedup /
    * similarity edges are computed, not foreign keys), so single-table like
    * events, and likewise kept OUT of [[chains]].
    */
  private val documentsChain = Chain(Seq("documents"), Nil)

  /** v16's forced chain: the "emb" pseudo-table is the per-seed derived
    * projection of embeddings (see [[drawEmbOverride]]); single-table like
    * events/documents and kept OUT of [[chains]] so versions ≤ 15 never
    * draw it.
    */
  private val embChain = Chain(Seq("emb"), Nil)

  /** A per-seed replacement for a chain's HEAD table: the same derived
    * relation rendered three ways — DuckDB-dialect FROM fragment (the
    * oracle text), Spark-dialect FROM fragment (the spark.sql construction
    * path), and the DataFrame-API loader. Needed because the two engines
    * share no array/HOF syntax (`element_at`/`slice`/`aggregate` vs
    * `[i]`/`[a:b]`/`list_reduce`); everything OUTSIDE the fragment stays in
    * the shared dialect, so only queries that draw an override carry a
    * distinct sparkSql rendering.
    */
  final case class TableOverride(fromDuck: String, fromSpark: String,
                                 load: (SparkSession, String) => DataFrame)

  /** v16's embeddings surface: draw per-seed element indices and slice
    * lengths, and build the "emb" derived table of integer-exact scalars:
    *
    *   e_a, e_b  = floor(1e6 · embedding[ka|kb])      — one element each
    *   e_s       = floor(1e6 · Σ embedding[1..kc])    — sequential fold
    *   e_q       = floor(1e6 · Σ embedding[i]², i≤kd) — sequential fold
    *   e_np      = #{i : embedding[i] > 0}
    *
    * Cross-engine determinism: parquet FLOATs read bit-identically in both
    * engines; FLOAT→DOUBLE widening is exact; each fold is SEQUENTIAL in
    * both renderings (Spark `aggregate` with a 0.0 seed ≡ DuckDB
    * `list_reduce` over the cast list — adding 0.0 to the first element is
    * exact, the f10/f11 oracle-proven pattern), so every IEEE operation
    * happens in the same order on the same bits; ×1e6 is one correctly-
    * rounded multiply; floor + BIGINT cast are exact. The grammar above the
    * view then only ever sees BIGINTs.
    */
  private def drawEmbOverride(rnd: Random): TableOverride = {
    val ka = 1 + rnd.nextInt(EmbeddingDim)
    val kb0 = 1 + rnd.nextInt(EmbeddingDim)
    val kb = if (kb0 == ka) (ka % EmbeddingDim) + 1 else kb0
    val kc = 4 + rnd.nextInt(13) // head-sum slice: 4..16 elements
    val kd = 8 + rnd.nextInt(25) // squared-sum slice: 8..32 elements
    def scaled(inner: String) =
      s"CAST(floor($inner * 1000000) AS BIGINT)"
    val duck =
      "(SELECT vec_id, label, " +
        scaled(s"CAST(embedding[$ka] AS DOUBLE)") + " AS e_a, " +
        scaled(s"CAST(embedding[$kb] AS DOUBLE)") + " AS e_b, " +
        scaled(s"list_reduce(list_transform(embedding[1:$kc], " +
          "x -> CAST(x AS DOUBLE)), (a, b) -> a + b)") + " AS e_s, " +
        scaled(s"list_reduce(list_transform(embedding[1:$kd], " +
          "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)") + " AS e_q, " +
        "CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS e_np " +
        "FROM embeddings) emb"
    val spk =
      "(SELECT vec_id, label, " +
        scaled(s"CAST(element_at(embedding, $ka) AS DOUBLE)") + " AS e_a, " +
        scaled(s"CAST(element_at(embedding, $kb) AS DOUBLE)") + " AS e_b, " +
        scaled(s"aggregate(transform(slice(embedding, 1, $kc), " +
          "x -> CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, b) -> a + b)") + " AS e_s, " +
        scaled(s"aggregate(transform(slice(embedding, 1, $kd), " +
          "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), " +
          "(a, b) -> a + b)") + " AS e_q, " +
        "CAST(size(filter(embedding, x -> x > 0)) AS BIGINT) AS e_np " +
        "FROM embeddings) emb"
    val load = (s: SparkSession, d: String) => {
      val e = col("embedding")
      def fold(k: Int, sq: Boolean): Column = aggregate(
        transform(slice(e, 1, k),
          x => if (sq) x.cast("double") * x.cast("double") else x.cast("double")),
        lit(0.0), (a, x) => a + x)
      loadFuzzTable(s, d, "embeddings").select(
        col("vec_id"), col("label"),
        floor(element_at(e, ka).cast("double") * 1000000).cast("long").as("e_a"),
        floor(element_at(e, kb).cast("double") * 1000000).cast("long").as("e_b"),
        floor(fold(kc, sq = false) * 1000000).cast("long").as("e_s"),
        floor(fold(kd, sq = true) * 1000000).cast("long").as("e_q"),
        size(filter(e, x => x > 0)).cast("long").as("e_np"))
    }
    TableOverride(duck, spk, load)
  }

  /** v17's NULL-injection pool: corpus tables with a verified-unique int
    * key IN the fuzz catalog (the modulo driver; never itself a victim, so
    * window order-dependent draws stay total). lineitem is absent for the
    * same duplicate-PK reason it has no [[uniqueKeys]] row; the tiny dims
    * (region/nation) are absent because NULLing 1-in-m of 3-25 rows leaves
    * too few NULLs to exercise anything.
    */
  private val nullablePool: Vector[String] =
    Vector("orders", "customer", "supplier", "part", "events", "documents")

  /** v17's NULL-injecting derived view: replace 1-2 drawn victim columns
    * with `CASE WHEN (pk % m) = r THEN NULL ELSE c END` (m in 5..9 — a
    * deterministic 1-in-m of rows per victim become NULL in BOTH
    * renderings). Unlike v16 the fragment is the SHARED dialect — both
    * engines speak CASE — so fromDuck == fromSpark and a v17 query carries
    * one SQL text. The view is aliased to the base table name so the body
    * generators' column references resolve unchanged.
    */
  private def drawNullOverride(rnd: Random): (TableOverride, Chain, Seq[FCol]) = {
    val t = nullablePool(rnd.nextInt(nullablePool.length))
    val key = uniqueKeys(t).head
    val candidates = catalog(t).filterNot(_.name == key)
    val victims = rnd.shuffle(candidates.toVector).take(1 + rnd.nextInt(2))
    val m = 5 + rnd.nextInt(5)
    val r = rnd.nextInt(m)
    val victimNames = victims.map(_.name).toSet
    val colSqls = catalog(t).map { c =>
      if (victimNames(c.name))
        s"CASE WHEN ($key % $m) = $r THEN NULL ELSE ${c.name} END AS ${c.name}"
      else c.name
    }
    val frag = s"(SELECT ${colSqls.mkString(", ")} FROM $t) $t"
    val load = (s: SparkSession, d: String) => {
      loadFuzzTable(s, d, t).select(catalog(t).map { c =>
        if (victimNames(c.name))
          when((col(key) % m) === r, lit(null)).otherwise(col(c.name)).as(c.name)
        else col(c.name)
      }: _*)
    }
    (TableOverride(frag, frag, load), Chain(Seq(t), Nil), victims)
  }

  /** v18's NULL-join pool: FK edges whose FACT side has a verified-unique
    * int key to drive the injection modulo (lineitem's edges are absent —
    * no unique key — and nation→region is absent because 25/m rows leave
    * too few NULL keys to exercise anything). Every edge is many-to-one
    * onto a unique dim PK, so a LEFT join preserves the fact head key's
    * uniqueness and the window generator's order-dependent draws stay
    * total over the joined relation.
    */
  private val njoinEdges: Vector[(String, String, String, String)] =
    Vector(
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey"),
      ("events", "user_id", "customer", "c_custkey"))

  /** The three-valued NOT-IN anti-join condition, rendered in the EXACT
    * shape Spark's single-column null-aware-anti-join extraction
    * recognizes: `Or(EqualTo(fk, v), IsNull(EqualTo(fk, v)))`.
    * Semantically identical to the expanded
    * `fk = v OR fk IS NULL OR v IS NULL` (an equality is NULL exactly when
    * either operand is), but under `spark.sql.optimizeNullAwareAntiJoin`
    * (on engine-wide, GraftSession) the LEFT ANTI on this shape plans as a
    * null-aware BroadcastHashJoin — LINEAR in the fact side — where the
    * expanded form defeats the pattern-match and falls back to the
    * O(fact × dim) BroadcastNestedLoopJoin (the r12 bench's two slowest
    * entries, fz11051 3.6 s / fz11021 1.9 s). One frozen seed,
    * [[expandedNotInContrastSeeds]], deliberately keeps the expanded form
    * as the pinned plan contrast.
    */
  private def notInAntiCond(fk: Column, v: Column): Column =
    (fk === v) || (fk === v).isNull

  /** Frozen seeds whose NOT-IN rendering keeps the EXPANDED three-valued
    * condition — the documented BroadcastNestedLoopJoin contrast pinned in
    * plan_signatures.tsv (fz10012: the all-rows-vanish pin, the cheapest
    * of the six former BNLJ carriers at 0.21 s sf0.1 — its semantics, not
    * its plan, are the point of the pin, so it pays the naive plan to keep
    * one example of Spark's un-extracted NOT-IN shape in the suite).
    */
  private val expandedNotInContrastSeeds: Set[Int] = Set(10012)

  /** v18's join-key injection: like [[drawNullOverride]] but the victim IS
    * the fact's FK column (plus sometimes one more non-key column), and
    * the returned chain carries the fact⋈dim edge so the body/window
    * generators draw dim columns — NULL-extended under LEFT, absent under
    * INNER — alongside the nullable key itself.
    */
  private def drawJoinNullOverride(rnd: Random)
      : (TableOverride, Chain, (String, String, String, String)) = {
    val edge @ (factT, fk, dimT, pk) = njoinEdges(rnd.nextInt(njoinEdges.length))
    val key = uniqueKeys(factT).head
    val m = 5 + rnd.nextInt(5)
    val r = rnd.nextInt(m)
    val extra: Option[String] =
      if (rnd.nextBoolean()) {
        val cands = catalog(factT).map(_.name).filterNot(n => n == key || n == fk)
        Some(cands(rnd.nextInt(cands.length)))
      } else None
    val victimNames = Set(fk) ++ extra
    val colSqls = catalog(factT).map { c =>
      if (victimNames(c.name))
        s"CASE WHEN ($key % $m) = $r THEN NULL ELSE ${c.name} END AS ${c.name}"
      else c.name
    }
    val frag = s"(SELECT ${colSqls.mkString(", ")} FROM $factT) $factT"
    val load = (s: SparkSession, d: String) => {
      loadFuzzTable(s, d, factT).select(catalog(factT).map { c =>
        if (victimNames(c.name))
          when((col(key) % m) === r, lit(null)).otherwise(col(c.name)).as(c.name)
        else col(c.name)
      }: _*)
    }
    (TableOverride(frag, frag, load),
      Chain(Seq(factT, dimT), Seq(fk -> pk)), edge)
  }

  /** v9's cross-family chains: `events.user_id → customer.c_custkey` is a
    * verified FK containment at every sf (every user_id has a matching
    * customer; max user_id ≈ custkeys/10), extending into the usual
    * customer → nation dim edge. Kept OUT of [[chains]] so versions ≤ 8
    * never draw them.
    */
  private val eventsCustomerChain =
    Chain(Seq("events", "customer"), Seq("user_id" -> "c_custkey"))
  private val eventsCustomerNationChain =
    Chain(Seq("events", "customer", "nation"),
      Seq("user_id" -> "c_custkey", "c_nationkey" -> "n_nationkey"))

  /** v9's FK edge for the subquery / derived-table generators (same shape
    * as [[fkEdges]] rows; kept separate so older versions never draw it).
    */
  private[graft] val eventsCustomerEdge: (String, String, String, String) =
    ("events", "user_id", "customer", "c_custkey")

  /** Table loader for generated builds — the engine's normalized view of
    * the corpus (events' vintage-adaptive ts handling lives in ONE place,
    * [[Tables.loadNormalized]]).
    */
  private def loadFuzzTable(s: SparkSession, d: String, t: String): DataFrame =
    Tables.loadNormalized(s, d, t)

  /** A predicate / select item rendered for both paths. */
  final case class P(sql: String, col: Column)
  final case class Item(alias: String, sql: String, col: Column)

  private def genPred(rnd: Random, cols: Seq[FCol], version: Int = 1): P = {
    val c = cols(rnd.nextInt(cols.length))
    def cmp(ops: Seq[String]): P = {
      val op = ops(rnd.nextInt(ops.length))
      val l = c.lits(rnd.nextInt(c.lits.length))
      val cc = op match {
        case "<"  => col(c.name) < l.col
        case "<=" => col(c.name) <= l.col
        case ">"  => col(c.name) > l.col
        case ">=" => col(c.name) >= l.col
        case "="  => col(c.name) === l.col
        case "<>" => col(c.name) =!= l.col
      }
      P(s"${c.name} $op ${l.sql}", cc)
    }
    // v3 adds IN-lists and BETWEEN; drawn from indices ABOVE the v1 range so
    // v1/v2 seeds keep their draws bit-identical
    def inList(): P = {
      val k = 2 + rnd.nextInt(2)
      val picked = rnd.shuffle(c.lits.toVector).take(k)
      P(s"${c.name} IN (${picked.map(_.sql).mkString(", ")})",
        col(c.name).isin(picked.map(_.col): _*))
    }
    def between(): P = {
      val i = rnd.nextInt(c.lits.length - 1)
      val j = i + 1 + rnd.nextInt(c.lits.length - i - 1)
      val (lo, hi) = (c.lits(i), c.lits(j)) // lits are declared value-ordered
      P(s"${c.name} BETWEEN ${lo.sql} AND ${hi.sql}",
        col(c.name).between(lo.col, hi.col))
    }
    c.kind match {
      case 'i' =>
        rnd.nextInt(if (version >= 3) 5 else 3) match {
          case 0 =>
            val m = 2 + rnd.nextInt(6); val r = rnd.nextInt(m)
            P(s"(${c.name} % $m) = $r", (col(c.name) % m) === r)
          case 3 => inList()
          case 4 => between()
          case _ => cmp(Seq("<", "<=", ">", ">=", "=", "<>"))
        }
      case 'd' =>
        if (version >= 3 && rnd.nextInt(4) == 3) between()
        else cmp(Seq("<", ">", "<=", ">="))
      case 't' =>
        if (version >= 3 && rnd.nextInt(4) == 3) between()
        else cmp(Seq("<", ">"))
      case 's' =>
        rnd.nextInt(if (version >= 3) 5 else 4) match {
          case 0 =>
            val l = c.lits(rnd.nextInt(c.lits.length))
            // substring of a domain value: first char
            val ch = l.sql.charAt(1)
            P(s"${c.name} LIKE '%$ch%'", col(c.name).like(s"%$ch%"))
          case 1 => P(s"${c.name} IS NOT NULL", col(c.name).isNotNull)
          case 4 => inList()
          case _ => cmp(Seq("=", "<>", ">=", "<"))
        }
    }
  }

  private def genAgg(rnd: Random, cols: Seq[FCol], alias: String,
                     version: Int = 1): Item = {
    val intCols = cols.filter(_.kind == 'i')
    val isCols = cols.filter(c => c.kind == 'i' || c.kind == 's')
    rnd.nextInt(if (version >= 3) 7 else 6) match {
      case 6 if intCols.nonEmpty =>
        // v3: avg over ints — corpus integer sums stay far below 2^53, so
        // accumulation is exact whether the engine sums in LONG or DOUBLE
        // (every partial is exactly representable), and the final division
        // is one IEEE op: order-free and engine-identical. avg over DOUBLES
        // would be neither — rounding makes partial sums order-dependent.
        val c = intCols(rnd.nextInt(intCols.length))
        Item(alias, s"avg(${c.name})", avg(col(c.name)))
      case 6 => Item(alias, "count(*)", count(lit(1)))
      case 0 => Item(alias, "count(*)", count(lit(1)))
      case 1 =>
        val c = cols(rnd.nextInt(cols.length))
        Item(alias, s"count(${c.name})", count(col(c.name)))
      case 2 =>
        val c = isCols(rnd.nextInt(isCols.length))
        Item(alias, s"count(DISTINCT ${c.name})", countDistinct(col(c.name)))
      case 3 if intCols.nonEmpty =>
        // SQL side casts to BIGINT: DuckDB's sum(INTEGER) is HUGEINT, which
        // the driver's value canonicalization renders as float ("3.0" vs
        // Spark's LONG "3") — the exact hash-mismatch class CORRECTNESS_r06
        // caught on every sum-bearing fz seed. Spark's sum(int) is already
        // LongType, so only the oracle text changes (catalog contract in
        // Q.scala: integer outputs are BIGINT on both sides).
        val c = intCols(rnd.nextInt(intCols.length))
        Item(alias, s"CAST(sum(${c.name}) AS BIGINT)", sum(col(c.name)))
      case 4 =>
        val c = cols(rnd.nextInt(cols.length))
        Item(alias, s"min(${c.name})", min(col(c.name)))
      case _ =>
        val c = cols(rnd.nextInt(cols.length))
        Item(alias, s"max(${c.name})", max(col(c.name)))
    }
  }

  /** One generated query: the SQL text (oracle/driver side) and the
    * DataFrame-API build (engine side). Same seed → same query, always.
    */
  final case class GenQuery(seed: Int, sql: String,
                            build: (SparkSession, String) => DataFrame,
                            sparkSqlOpt: Option[String] = None,
                            mode: String = "") {
    /** The SQL as SPARK parses it. Identical to [[sql]] (the DuckDB/oracle
      * text) for every grammar that stays inside the two engines' shared
      * dialect; differs only for v16's array/HOF surface, where the same
      * draw renders `element_at`/`slice`/`aggregate` for Spark and
      * `[i]`/`list_reduce`/`list_transform` for DuckDB. FuzzSpec's second
      * construction path always parses THIS text.
      */
    def sparkSql: String = sparkSqlOpt.getOrElse(sql)
  }

  /** Highest grammar version [[query]] dispatches. Tools that sweep "all
    * versions" (FuzzDump's default list) derive their range from THIS
    * constant so a new grammar cannot silently miss the default sweep
    * (r12 advice: the hand-maintained Seq in FuzzDump stopped at 20 while
    * v21–v23 existed). Bump together with each new mode-byte branch below.
    */
  val maxVersion: Int = 39

  def query(seed: Int): GenQuery = query(seed, 1)

  /** Versioned entry point. v1 is the original grammar and its seeds are
    * FROZEN (fz2xx catalog entries render from it); v2 draws one extra
    * up-front mode byte and may dispatch to the window / set-op generators,
    * otherwise falls through to the shared v1 body. A given (seed, version)
    * is deterministic forever.
    */
  def query(seed: Int, version: Int): GenQuery = {
    val rnd = new Random(seed)
    if (version >= 39) {
      // v39 mode byte: XML round-trip extraction (Spark-4 native from_xml)
      // — the last semi-structured surface with a single fixed entry
      // (f26_from_xml) and zero generated coverage (the v32/v34/v38
      // lesson: single-entry surfaces hide dialect boundaries). DuckDB
      // has no XML, so the oracle computes the same values from the RAW
      // scalars (the f26 lossless-parse differential, here seeded over
      // drawn tables, document shapes, and query bodies). Versions ≤ 38
      // never take this draw; fall-through continues into the v38
      // dispatch with the advanced rnd state.
      val m39 = rnd.nextInt(10)
      if (m39 < 7) return xmlQuery(seed, rnd, version)
      // else: fall through to the v38 dispatch with the advanced rnd state
    }
    if (version >= 38) {
      // v38 mode byte: VARIANT typed extraction (parse_json + variant_get
      // with per-use target types) — the Spark-4 semi-structured surface
      // that had one fixed entry (f28_variant) and zero generated
      // coverage; v34 fuzzes STRING JSON-path extraction, not the typed
      // variant path. Versions ≤ 37 never take this draw; fall-through
      // continues into the v37 dispatch with the advanced rnd state.
      val m38 = rnd.nextInt(10)
      if (m38 < 7) return variantQuery(seed, rnd, version)
      // else: fall through to the v37 dispatch with the advanced rnd state
    }
    if (version >= 37) {
      // v37 mode byte: multimodal META scalars — the documents table as
      // the derived media-metadata view (byte length / first byte / frame
      // counts / stride-sampled frame counts / format tag), the last
      // table-family edge with zero generated coverage. Versions ≤ 36
      // never take this draw; fall-through continues into the v36
      // dispatch with the advanced rnd state.
      val m37 = rnd.nextInt(10)
      if (m37 < 7) return mediaMetaQuery(seed, rnd, version)
      // else: fall through to the v36 dispatch with the advanced rnd state
    }
    if (version >= 36) {
      // v36 mode byte: RANGE / BAND joins — non-equi join refinements
      // (temporal and numeric BETWEEN bands beside an equality anchor),
      // the batch analogue of streaming v5 and the generated coverage for
      // the fixed j8 form. Versions ≤ 35 never take this draw;
      // fall-through continues into the v35 dispatch with the advanced
      // rnd state.
      val m36 = rnd.nextInt(10)
      if (m36 < 7) return rangeJoinQuery(seed, rnd, version)
      // else: fall through to the v35 dispatch with the advanced rnd state
    }
    if (version >= 35) {
      // v35 mode byte: collation portability — ORDER BY / GROUP BY /
      // min-max / comparison predicates over constructed non-ASCII and
      // mixed-case strings (both engines claim binary UTF-8 order; until
      // v35 that was unpinned — VERDICT r14 #8). Versions ≤ 34 never take
      // this draw; fall-through continues into the v34 dispatch with the
      // advanced rnd state.
      val m35 = rnd.nextInt(10)
      if (m35 < 7) return collationQuery(seed, rnd, version)
      // else: fall through to the v34 dispatch with the advanced rnd state
    }
    if (version >= 34) {
      // v34 mode byte: JSON-path extraction (events.props direct + a
      // constructed-JSON derived view) — the get_json_object vs
      // json_extract_string dialect boundary. Versions ≤ 33 never take
      // this draw; fall-through continues into the v33 dispatch with the
      // advanced rnd state.
      val m34 = rnd.nextInt(10)
      if (m34 < 7) return jsonQuery(seed, rnd, version)
      // else: fall through to the v33 dispatch with the advanced rnd state
    }
    if (version >= 33) {
      // v33 mode byte: DECIMAL × NULL — a NULL-injected decimal victim
      // through NULL-skipping aggregates, NULL decimal group keys,
      // three-valued comparisons, and typed COALESCE repair. Versions
      // ≤ 32 never take this draw; fall-through continues into the v32
      // dispatch with the advanced rnd state.
      val m33 = rnd.nextInt(10)
      if (m33 < 7) return decimalNullQuery(seed, rnd, version)
      // else: fall through to the v32 dispatch with the advanced rnd state
    }
    if (version >= 32) {
      // v32 mode byte: the documents ⋈ embeddings corpus edge (partial
      // 1:≤1 enrichment join over the v16 derived-scalar view). Versions
      // ≤ 31 never take this draw; fall-through continues into the v31
      // dispatch with the advanced rnd state.
      val m32 = rnd.nextInt(10)
      if (m32 < 7) return docembQuery(seed, rnd, version)
      // else: fall through to the v31 dispatch with the advanced rnd state
    }
    if (version >= 31) {
      // v31 mode byte: DECIMAL at the typed boundaries — GROUP BY keys,
      // JOIN keys, comparison predicates with scale-pinned literals.
      // Versions ≤ 30 never take this draw; fall-through continues into
      // the v30 dispatch with the advanced rnd state.
      val m31 = rnd.nextInt(10)
      if (m31 < 7) return decimalBoundaryQuery(seed, rnd, version)
      // else: fall through to the v30 dispatch with the advanced rnd state
    }
    if (version >= 30) {
      // v30 mode byte: subqueries as projected VALUES — IN/EXISTS in the
      // SELECT list, where three-valued NULL output becomes data.
      // Versions ≤ 29 never take this draw; fall-through continues into
      // the v29 dispatch with the advanced rnd state.
      val m30 = rnd.nextInt(10)
      if (m30 < 7) return projSubqQuery(seed, rnd, version)
      // else: fall through to the v29 dispatch with the advanced rnd state
    }
    if (version >= 29) {
      // v29 mode byte: LATERAL correlated derived tables — per-group
      // top-k via correlated ORDER BY + LIMIT, aggregate laterals, LEFT
      // JOIN LATERAL. Versions ≤ 28 never take this draw; fall-through
      // continues into the v28 dispatch with the advanced rnd state.
      val m29 = rnd.nextInt(10)
      if (m29 < 7) return lateralQuery(seed, rnd, version)
      // else: fall through to the v28 dispatch with the advanced rnd state
    }
    if (version >= 28) {
      // v28 mode byte: NULL semantics in set operations — the one surface
      // where NULLs compare EQUAL (distinct-equality). Versions ≤ 27
      // never take this draw; fall-through continues into the v27
      // dispatch with the advanced rnd state.
      val m28 = rnd.nextInt(10)
      if (m28 < 7) return setopNullQuery(seed, rnd, version)
      // else: fall through to the v27 dispatch with the advanced rnd state
    }
    if (version >= 27) {
      // v27 mode byte: exact DECIMAL semantics — typed derived view,
      // pinned-scale arithmetic/aggregation, tie-rounding scalars.
      // Versions ≤ 26 never take this draw; fall-through continues into
      // the v26 dispatch with the advanced rnd state.
      val m27 = rnd.nextInt(10)
      if (m27 < 7) return decimalQuery(seed, rnd, version)
      // else: fall through to the v26 dispatch with the advanced rnd state
    }
    if (version >= 26) {
      // v26 mode byte: extended window family — percent_rank/cume_dist
      // over tied orderings, nth_value under drawn frames. Versions ≤ 25
      // never take this draw; fall-through continues into the v25
      // dispatch with the advanced rnd state.
      val m26 = rnd.nextInt(10)
      if (m26 < 7) return extWindowQuery(seed, rnd, version)
      // else: fall through to the v25 dispatch with the advanced rnd state
    }
    if (version >= 25) {
      // v25 mode byte: explicit GROUPING SETS + multi-DISTINCT aggregates
      // (+ FILTER clause forms). Versions ≤ 24 never take this draw;
      // fall-through continues into the v24 dispatch with the advanced
      // rnd state.
      val m25 = rnd.nextInt(10)
      if (m25 < 7) return groupingSetsQuery(seed, rnd, version)
      // else: fall through to the v24 dispatch with the advanced rnd state
    }
    if (version >= 24) {
      // v24 mode byte: two-sided NULL-injection — fact FK AND dim PK
      // victims under ROLLUP / window / projection consumers. Versions
      // ≤ 23 never take this draw; fall-through continues into the v23
      // dispatch with the advanced rnd state.
      val m24 = rnd.nextInt(10)
      if (m24 < 7) return dualNullQuery(seed, rnd, version)
      // else: fall through to the v23 dispatch with the advanced rnd state
    }
    if (version >= 23) {
      // v23 mode byte: string-scalar semantics — computed projections,
      // split_part group keys, instr/length arithmetic. Versions ≤ 22
      // never take this draw; fall-through continues into the v22 dispatch.
      val m23 = rnd.nextInt(10)
      if (m23 < 7) return strScalarQuery(seed, rnd, version)
      // else: fall through to the v22 dispatch with the advanced rnd state
    }
    if (version >= 22) {
      // v22 mode byte: temporal semantics — date_trunc group/window keys,
      // EXTRACT projections/predicates, ± INTERVAL shifts. Versions ≤ 21
      // never take this draw; fall-through continues into the v21 dispatch.
      val m22 = rnd.nextInt(10)
      if (m22 < 7) return temporalQuery(seed, rnd, version)
      // else: fall through to the v21 dispatch with the advanced rnd state
    }
    if (version >= 21) {
      // v21 mode byte: RANGE-valued window frames — value-distance frames
      // over non-unique order columns (peers are the point; every older
      // frame is ROWS-based over a unique ordering). Versions ≤ 20 never
      // take this draw; fall-through continues into the v20 dispatch.
      val m21 = rnd.nextInt(10)
      if (m21 < 7) return rangeWindowQuery(seed, rnd, version)
      // else: fall through to the v20 dispatch with the advanced rnd state
    }
    if (version >= 20) {
      // v20 mode byte: ROLLUP/CUBE over a NULL-injected group key — real
      // NULL groups vs super-aggregate NULLs, disambiguated by GROUPING().
      // Versions ≤ 19 never take this draw; fall-through continues into
      // the v19 dispatch.
      val m20 = rnd.nextInt(10)
      if (m20 < 7) return rollupNullQuery(seed, rnd, version)
      // else: fall through to the v19 dispatch with the advanced rnd state
    }
    if (version >= 19) {
      // v19 mode byte: the EXISTS-vs-IN quantifier contrast over a
      // NULL-injected FK. Versions ≤ 18 never take this draw;
      // fall-through continues into the v18 dispatch.
      val m19 = rnd.nextInt(10)
      if (m19 < 7) return existsNullQuery(seed, rnd, version)
      // else: fall through to the v18 dispatch with the advanced rnd state
    }
    if (version >= 18) {
      // v18 mode byte: NULLs in JOIN KEYS — a NULL-injected fact FK under
      // the body/window generators (inner joins drop the NULL-key rows,
      // LEFT joins NULL-extend them), [NOT] IN against a NULL-poisoned
      // subquery, and the null-safe IS NOT DISTINCT FROM join. The
      // decorated queries keep ONE SQL text (shared dialect). Versions
      // ≤ 17 never take this draw; fall-through continues into the v17
      // dispatch with the advanced rnd state.
      val m18 = rnd.nextInt(10)
      if (m18 < 8) {
        if (m18 < 3) {
          val (tov, chain, _) = drawJoinNullOverride(rnd)
          val q = bodyQuery(seed, rnd, version, chain, Some(tov))
          return q.copy(sparkSqlOpt = None, mode = s"njoin:${q.mode}")
        } else if (m18 < 4) {
          val (tov, chain, _) = drawJoinNullOverride(rnd)
          val q = windowQuery(seed, rnd, version, Some(chain), Some(tov))
          return q.copy(sparkSqlOpt = None, mode = s"njoin:${q.mode}")
        } else if (m18 < 6) return notInSubqQuery(seed, rnd, version)
        else return nullSafeJoinQuery(seed, rnd, version)
      }
      // else: fall through to the v17 dispatch with the advanced rnd state
    }
    if (version >= 17) {
      // v17 mode byte: NULL-injection — a deterministic nullable derived
      // view ([[drawNullOverride]]) under the dedicated NULL-semantics
      // mode, the shared body, or the window generator. The decorated
      // queries keep ONE SQL text (shared dialect), so sparkSqlOpt is
      // cleared: the Some(...) marker stays reserved for genuinely
      // dual-dialect grammars (v16). Versions ≤ 16 never take this draw;
      // fall-through continues into the v16 dispatch.
      val m17 = rnd.nextInt(10)
      if (m17 < 8) {
        val (tov, chain, victims) = drawNullOverride(rnd)
        if (m17 < 4)
          return nullPredQuery(seed, rnd, version, chain, tov, victims)
        else if (m17 < 6) {
          val q = bodyQuery(seed, rnd, version, chain, Some(tov))
          return q.copy(sparkSqlOpt = None, mode = s"null:${q.mode}")
        } else {
          val q = windowQuery(seed, rnd, version, Some(chain), Some(tov))
          return q.copy(sparkSqlOpt = None, mode = s"null:${q.mode}")
        }
      }
      // else: fall through to the v16 dispatch with the advanced rnd state
    }
    if (version >= 16) {
      // v16 mode byte: the embeddings table — its ARRAY<FLOAT> column has
      // no portable scalar grammar, so each seed draws a DERIVED TABLE of
      // integer-exact array/HOF scalars ([[drawEmbOverride]]: element
      // access, sequential slice folds, HOF filter count) and runs the
      // shared body/window machinery over it. The one grammar whose two
      // SQL renderings differ (Spark vs DuckDB array dialects) — the
      // differential is DF-API vs spark.sql(sparkSql) vs DuckDB(sql),
      // three paths from one draw. Versions ≤ 15 never take this draw;
      // fall-through continues into the v15 dispatch.
      val m16 = rnd.nextInt(10)
      if (m16 < 8) {
        val tov = Some(drawEmbOverride(rnd))
        if (m16 < 5) return bodyQuery(seed, rnd, version, embChain, tov)
        else return windowQuery(seed, rnd, version, Some(embChain), tov)
      }
      // else: fall through to the v15 dispatch with the advanced rnd state
    }
    if (version >= 15) {
      // v15 mode byte: window-over-aggregate, OFFSET pagination, and
      // NULLIF / IS DISTINCT FROM scalars. Versions ≤ 14 never take this
      // draw; fall-through continues into the v14 dispatch.
      val m15 = rnd.nextInt(10)
      if (m15 < 3) return aggRankQuery(seed, rnd, version)
      else if (m15 < 6) return offsetQuery(seed, rnd, version)
      else if (m15 < 8) return nullScalarQuery(seed, rnd, version)
      // else: fall through to the v14 dispatch with the advanced rnd state
    }
    if (version >= 14) {
      // v14 mode byte: correlated scalar subqueries, non-count HAVING,
      // three-branch UNION ALL. Versions ≤ 13 never take this draw;
      // fall-through continues into the v13 dispatch.
      val m14 = rnd.nextInt(10)
      if (m14 < 4) return corrScalarQuery(seed, rnd, version)
      else if (m14 < 6) return havingAggQuery(seed, rnd, version)
      else if (m14 < 8) return unionThreeQuery(seed, rnd, version)
      // else: fall through to the v13 dispatch with the advanced rnd state
    }
    if (version >= 13) {
      // v13 mode byte: scalar-expression shapes (computed projections,
      // sliding window frames, CASE group keys). Versions ≤ 12 never take
      // this draw; fall-through continues into the v12 dispatch.
      val m13 = rnd.nextInt(10)
      if (m13 < 3) return exprProjQuery(seed, rnd, version)
      else if (m13 < 6) return slidingWindowQuery(seed, rnd, version)
      else if (m13 < 8) return caseKeyQuery(seed, rnd, version)
      // else: fall through to the v12 dispatch with the advanced rnd state
    }
    if (version >= 12) {
      // v12 mode byte: FULL OUTER joins (both-side misses via compound
      // ON), bag-semantics set ops (INTERSECT ALL / EXCEPT ALL), and
      // aggregate⋈aggregate cohort joins. Versions ≤ 11 never take this
      // draw; fall-through continues into the v11 dispatch.
      val m12 = rnd.nextInt(10)
      if (m12 < 3) return fullOuterQuery(seed, rnd, version)
      else if (m12 < 6) return setopAllQuery(seed, rnd, version)
      else if (m12 < 8) return aggJoinQuery(seed, rnd, version)
      // else: fall through to the v11 dispatch with the advanced rnd state
    }
    if (version >= 11) {
      // v11 mode byte: grouping sets (ROLLUP/CUBE + GROUPING flags),
      // LEFT joins whose compound ON makes real misses (IS NULL anti /
      // COALESCE repair / matched-flag grouping), and top-N groups
      // ordered by an aggregate. Drawn before every older dispatch;
      // versions ≤ 10 never take this draw, and fall-through seeds
      // continue into the v10 dispatch with the advanced rnd state.
      val m11 = rnd.nextInt(10)
      if (m11 < 3) return rollupQuery(seed, rnd, version)
      else if (m11 < 6) return leftNullQuery(seed, rnd, version)
      else if (m11 < 8) return topGroupsQuery(seed, rnd, version)
      // else: fall through to the v10 dispatch with the advanced rnd state
    }
    if (version >= 10) {
      // v10 mode byte: compositional shapes (conditional aggregates,
      // set-ops over joins, aggregate-of-aggregate). Drawn before every
      // older dispatch; versions ≤ 9 never take this draw, and
      // fall-through seeds continue into the v9 dispatch with the
      // advanced rnd state.
      val m10 = rnd.nextInt(10)
      if (m10 < 3) return condAggQuery(seed, rnd, version)
      else if (m10 < 5) return setopJoinQuery(seed, rnd, version)
      else if (m10 < 7) return aggOfAggQuery(seed, rnd, version)
      // else: fall through to the v9 dispatch with the advanced rnd state
    }
    if (version >= 9) {
      // v9 mode byte: the events⋈customer cross-family edge through every
      // join-bearing mode. Drawn before every older dispatch so the new
      // edge gets first pick; versions ≤ 8 never take this draw, and
      // fall-through seeds continue into the v8 dispatch with the advanced
      // rnd state (a v9 seed is a fresh draw sequence).
      val m9 = rnd.nextInt(12)
      if (m9 < 3) return bodyQuery(seed, rnd, version, eventsCustomerChain)
      else if (m9 < 5) return bodyQuery(seed, rnd, version, eventsCustomerNationChain)
      else if (m9 < 7) return windowQuery(seed, rnd, version, Some(eventsCustomerChain))
      else if (m9 < 8) return subqueryQuery(seed, rnd, version,
        edgeOverride = Some(eventsCustomerEdge))
      else if (m9 < 9) return derivedJoinQuery(seed, rnd, version,
        Some(eventsCustomerEdge))
      // else: fall through to the v8 dispatch with the advanced rnd state
    }
    if (version >= 8) {
      // v8 mode byte: set-ops and self-scalar subqueries over the two
      // single-table corpora (events/documents) — the shapes v6/v7's
      // body+window dispatch can't reach. Versions ≤ 7 never take this
      // draw; the table coin is tossed inside the branch so fall-through
      // seeds advance rnd identically whether or not the mode was near.
      val m8 = rnd.nextInt(10)
      if (m8 < 6) {
        val t8 = if (rnd.nextBoolean()) "events" else "documents"
        if (m8 < 3) return setopQuery(seed, rnd, version, Some(t8))
        else return subqueryQuery(seed, rnd, version, Some(t8))
      }
      // else: fall through to the v7 dispatch with the advanced rnd state
    }
    if (version >= 7) {
      // v7 mode byte (documents table), drawn before v6's so the newest
      // table gets first pick; versions ≤ 6 never take this draw.
      val m7 = rnd.nextInt(10)
      if (m7 < 4) return bodyQuery(seed, rnd, version, documentsChain)
      else if (m7 < 6) return windowQuery(seed, rnd, version, Some(documentsChain))
      // else: fall through to the v6 dispatch with the advanced rnd state
    }
    if (version >= 6) {
      // v6 mode byte, drawn before every older dispatch so events-table
      // modes get first pick; versions ≤ 5 never take this draw, so their
      // seeds stay frozen. The events body reuses the shared proj/group/
      // global machinery ([[bodyQuery]]) and the window generator — only
      // the chain is forced, so every predicate/agg/window shape the older
      // grammars exercise also runs over timestamps + JSON-shaped strings.
      val m6 = rnd.nextInt(10)
      if (m6 < 4) return bodyQuery(seed, rnd, version, eventsChain)
      else if (m6 < 6) return windowQuery(seed, rnd, version, Some(eventsChain))
      // else: fall through to the v5 dispatch with the advanced rnd state
    }
    if (version >= 5) {
      // v5 mode byte, drawn BEFORE the v2 dispatch so v5's new modes get
      // first pick; versions ≤ 4 never take this draw, so their seeds are
      // untouched. Fall-through seeds continue into the v2 dispatch with
      // the advanced rnd state (a v5 seed is a fresh draw sequence — only
      // sameness across versions ≤ 4 is contractual).
      val m5 = rnd.nextInt(10)
      if (m5 < 3) return subqueryQuery(seed, rnd, version)
      else if (m5 < 5) return derivedJoinQuery(seed, rnd, version)
    }
    if (version >= 2) {
      val m = rnd.nextInt(10)
      if (m < 3) return windowQuery(seed, rnd, version)
      else if (m < 5) return setopQuery(seed, rnd, version)
      // else: fall through to the v1 body with the advanced rnd state
    }
    bodyQuery(seed, rnd, version, chains(rnd.nextInt(chains.length)))
  }

  /** The shared proj/group/global body (the whole v1 grammar): everything
    * after the chain draw, extracted verbatim so v6 can force [[eventsChain]]
    * without perturbing any older version's draw sequence (the chain draw
    * stays at the call site for versions ≤ 5).
    */
  private def bodyQuery(seed: Int, rnd: Random, version: Int,
                        chain: Chain,
                        tov: Option[TableOverride] = None): GenQuery = {
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)

    // predicates: 0-3, with an OR pair sometimes
    val nPred = rnd.nextInt(4)
    var preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    if (preds.length >= 2 && rnd.nextDouble() < 0.3) {
      val or = P(s"(${preds(0).sql} OR ${preds(1).sql})", preds(0).col || preds(1).col)
      preds = or +: preds.drop(2)
    }

    val groupables = cols.filter(_.groupable)
    val mode = rnd.nextInt(10) match {
      case x if x < 4                          => "proj"
      case x if x < 8 && groupables.nonEmpty   => "group"
      case _                                   => "global"
    }

    val (items, groupKeys, having, orderAll, limit, distinct) = mode match {
      case "proj" =>
        val k = 2 + rnd.nextInt(3)
        val picked = rnd.shuffle(cols.toVector).take(k)
        var its = picked.zipWithIndex.map { case (c, i) =>
          Item(s"c$i", c.name, col(c.name))
        }
        val intCols = cols.filter(_.kind == 'i')
        if (rnd.nextDouble() < 0.5 && intCols.nonEmpty) {
          if (rnd.nextBoolean()) {
            val a = intCols(rnd.nextInt(intCols.length))
            val m = 3 + rnd.nextInt(7)
            its :+= Item("cx", s"(${a.name} % $m)", col(a.name) % m)
          } else {
            val p = genPred(rnd, cols, version)
            its :+= Item("cx", s"CASE WHEN ${p.sql} THEN 1 ELSE 0 END",
              when(p.col, 1).otherwise(0))
          }
        }
        // v3: sometimes SELECT DISTINCT (extra draw only at v3 — earlier
        // versions never reach it, so their seeds stay frozen)
        val dist = version >= 3 && rnd.nextInt(4) == 0
        (its, Vector.empty[FCol], None, true, Some(1000), dist)
      case "group" =>
        val keys = rnd.shuffle(groupables.toVector).take(1 + rnd.nextInt(2))
        val keyItems = keys.zipWithIndex.map { case (c, i) =>
          Item(s"k$i", c.name, col(c.name))
        }
        val aggs = (0 until 1 + rnd.nextInt(3))
          .map(i => genAgg(rnd, cols, s"a$i", version))
        val hav = if (rnd.nextDouble() < 0.3) Some(1 + rnd.nextInt(5)) else None
        (keyItems ++ aggs, keys, hav, false, None, false)
      case _ =>
        val aggs = (0 until 1 + rnd.nextInt(3))
          .map(i => genAgg(rnd, cols, s"a$i", version))
        (aggs.toVector, Vector.empty[FCol], None, false, None, false)
    }

    // ---- SQL rendering (head FROM fragment swaps per dialect when a
    // TableOverride is drawn; everything else is the shared dialect) ----
    val selSql = (if (distinct) "SELECT DISTINCT " else "SELECT ") +
      items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ") + " FROM "
    val sb = new StringBuilder()
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    if (groupKeys.nonEmpty) sb ++= " GROUP BY " + groupKeys.map(_.name).mkString(", ")
    having.foreach(h => sb ++= s" HAVING count(*) > $h")
    // total order: every output column for projections, the (unique) keys
    // for grouped aggregates; explicit NULLS FIRST (Spark's asc default,
    // NOT DuckDB's). v3 draws a per-key direction — Spark's desc default is
    // NULLS LAST, matching the explicit DESC NULLS LAST in the SQL.
    val orderAliases =
      if (orderAll) items.map(_.alias)
      else groupKeys.indices.map(i => s"k$i")
    val orderAsc: Seq[Boolean] =
      orderAliases.map(_ => version < 3 || rnd.nextBoolean())
    if (orderAliases.nonEmpty)
      sb ++= " ORDER BY " + orderAliases.zip(orderAsc).map {
        case (a, true)  => s"$a ASC NULLS FIRST"
        case (a, false) => s"$a DESC NULLS LAST"
      }.mkString(", ")
    limit.foreach(n => sb ++= s" LIMIT $n")
    val tailSql = sb.result()
    val sqlText = selSql + tov.map(_.fromDuck).getOrElse(chain.tables.head) + tailSql
    val sparkSqlText = tov.map(o => selSql + o.fromSpark + tailSql)

    // ---- DataFrame-API rendering (same draw, independent construction) ----
    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.zipWithIndex.map { case (t, i) =>
        if (i == 0 && tov.isDefined) tov.get.load(s, d)
        else loadFuzzTable(s, d, t)
      }
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      var out = if (groupKeys.nonEmpty || mode == "global") {
        val aggItems = items.filterNot(i => i.alias.startsWith("k"))
        val aggCols = aggItems.map(i => i.col.as(i.alias)) ++
          having.map(_ => count(lit(1)).as("_hv")).toSeq
        val agged =
          if (groupKeys.nonEmpty)
            j.groupBy(groupKeys.map(c => col(c.name)): _*)
              .agg(aggCols.head, aggCols.tail: _*)
          else j.agg(aggCols.head, aggCols.tail: _*)
        val hFiltered = having match {
          case Some(h) => agged.where(col("_hv") > h).drop("_hv")
          case None    => agged
        }
        // project keys under their aliases, in declared output order
        hFiltered.select(items.map(i =>
          (if (i.alias.startsWith("k")) col(i.sql) else col(i.alias)).as(i.alias)): _*)
      } else j.select(items.map(i => i.col.as(i.alias)): _*)
      if (distinct) out = out.distinct()
      if (orderAliases.nonEmpty)
        out = out.orderBy(orderAliases.zip(orderAsc).map {
          case (a, true)  => col(a).asc_nulls_first
          case (a, false) => col(a).desc_nulls_last
        }: _*)
      limit.foreach(n => out = out.limit(n))
      out
    }
    GenQuery(seed, sqlText, build, sparkSqlOpt = sparkSqlText,
      mode = s"body:$mode:${chain.tables.head}")
  }

  /** v2 window mode: project the head table's key + the partition column +
    * one window value; total ORDER BY over ALL output columns makes row
    * order deterministic even where the head key has duplicates. Six
    * function shapes; the three ORDER-dependent ones (row_number, lag,
    * running sum) are drawn only when the head key is verified unique —
    * on a duplicated key their per-row results depend on engine-internal
    * tie-breaking (the [[uniqueKeys]] doc has the corpus evidence).
    */
  private def windowQuery(seed: Int, rnd: Random, version: Int,
                          chainOverride: Option[Chain] = None,
                          tov: Option[TableOverride] = None): GenQuery = {
    // v6 forces the events chain (no chain draw — v6 seeds are a fresh
    // sequence); every older caller passes None and draws as before.
    val chain = chainOverride.getOrElse(chains(rnd.nextInt(chains.length)))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val uk = headOrderCols(chain.tables.head)
    val headUnique = uniqueKeys.contains(chain.tables.head)
    val groupables = cols.filter(_.groupable)
    val g = groupables(rnd.nextInt(groupables.length))
    val intCols = cols.filter(_.kind == 'i')
    val anyCol = cols(rnd.nextInt(cols.length))
    val sumCol = intCols(rnd.nextInt(intCols.length))

    // draw, then remap order-dependent choices onto the value-deterministic
    // three when the head key is not unique. v4 widens the range with four
    // more order-dependent functions (same position in the draw sequence,
    // so v2/v3 seeds keep their draws).
    val funcDraw0 = rnd.nextInt(if (version >= 4) 10 else 6)
    val funcDraw =
      if (headUnique) funcDraw0
      else funcDraw0 match {
        case 0 => 1 // row_number → rank
        case 4 => 2 // lag → dense_rank
        case 5 => 3 // running sum → whole-partition sum
        case 6 => 2 // lead → dense_rank
        case 7 => 1 // first_value → rank
        case 8 => 3 // last_value → whole-partition sum
        case 9 => 1 // ntile → rank
        case x => x
      }
    // v4: sometimes a second partition column (drawn after funcDraw — older
    // versions never reach this draw)
    val g2: Option[FCol] =
      if (version >= 4 && rnd.nextInt(3) == 0) {
        val rest = groupables.filterNot(_.name == g.name)
        if (rest.isEmpty) None else Some(rest(rnd.nextInt(rest.length)))
      } else None
    val partNames = g.name +: g2.map(_.name).toSeq
    val partSql = partNames.mkString(", ")
    val partCols = partNames.map(col)

    val ukOrderSql = uk.map(k => s"$k ASC NULLS FIRST").mkString(", ")
    def ukWindow = Window.partitionBy(partCols: _*)
      .orderBy(uk.map(col(_).asc_nulls_first): _*)
    def valWindow = Window.partitionBy(partCols: _*)
      .orderBy(col(anyCol.name).asc_nulls_first)
    val (wSql, wCol) = funcDraw match {
      case 0 =>
        (s"row_number() OVER (PARTITION BY $partSql ORDER BY $ukOrderSql)",
          row_number().over(ukWindow))
      case 1 =>
        (s"rank() OVER (PARTITION BY $partSql ORDER BY ${anyCol.name} ASC NULLS FIRST)",
          rank().over(valWindow))
      case 2 =>
        (s"dense_rank() OVER (PARTITION BY $partSql ORDER BY ${anyCol.name} ASC NULLS FIRST)",
          dense_rank().over(valWindow))
      case 3 =>
        // CAST AS BIGINT for the same HUGEINT reason as genAgg's sum
        (s"CAST(sum(${sumCol.name}) OVER (PARTITION BY $partSql) AS BIGINT)",
          sum(col(sumCol.name)).over(Window.partitionBy(partCols: _*)))
      case 4 =>
        (s"lag(${anyCol.name}, 1) OVER (PARTITION BY $partSql ORDER BY $ukOrderSql)",
          lag(col(anyCol.name), 1).over(ukWindow))
      case 5 =>
        (s"CAST(sum(${sumCol.name}) OVER (PARTITION BY $partSql ORDER BY $ukOrderSql" +
          " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
          sum(col(sumCol.name)).over(ukWindow
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      case 6 =>
        (s"lead(${anyCol.name}, 1) OVER (PARTITION BY $partSql ORDER BY $ukOrderSql)",
          lead(col(anyCol.name), 1).over(ukWindow))
      case 7 =>
        // frame explicit: DuckDB's default with ORDER BY is RANGE-based,
        // Spark's first-over-window is ROWS-based — spell it out in both
        (s"first_value(${anyCol.name}) OVER (PARTITION BY $partSql ORDER BY $ukOrderSql" +
          " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
          first(col(anyCol.name)).over(ukWindow
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      case 8 =>
        (s"last_value(${anyCol.name}) OVER (PARTITION BY $partSql ORDER BY $ukOrderSql" +
          " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
          last(col(anyCol.name)).over(ukWindow
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      case _ =>
        val buckets = 2 + rnd.nextInt(4) // draw inside the branch: v4-only
        (s"ntile($buckets) OVER (PARTITION BY $partSql ORDER BY $ukOrderSql)",
          ntile(buckets).over(ukWindow))
    }

    val items =
      uk.zipWithIndex.map { case (k, i) => Item(s"u$i", k, col(k)) } ++
        (Seq(Item("k0", g.name, col(g.name))) ++
          g2.map(c => Item("k1", c.name, col(c.name))).toSeq :+
          Item("w0", wSql, wCol))
    // ORDER BY every output column: duplicate head keys (or a partition
    // column differing across equal keys) must not leave row order to the
    // engine — rows identical in ALL columns are the only unordered case,
    // and those are indistinguishable in the compare
    val orderAliases = items.map(_.alias)

    val selSql = "SELECT " +
      items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ") + " FROM "
    val sb = new StringBuilder()
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    sb ++= " ORDER BY " + orderAliases.map(a => s"$a ASC NULLS FIRST").mkString(", ")
    sb ++= " LIMIT 1000"
    val tailSql = sb.result()
    val sqlText = selSql + tov.map(_.fromDuck).getOrElse(chain.tables.head) + tailSql
    val sparkSqlText = tov.map(o => selSql + o.fromSpark + tailSql)

    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.zipWithIndex.map { case (t, i) =>
        if (i == 0 && tov.isDefined) tov.get.load(s, d)
        else loadFuzzTable(s, d, t)
      }
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      j.select(items.map(i => i.col.as(i.alias)): _*)
        .orderBy(orderAliases.map(a => col(a).asc_nulls_first): _*)
        .limit(1000)
    }
    GenQuery(seed, sqlText, build, sparkSqlOpt = sparkSqlText,
      mode = s"window:${chain.tables.head}")
  }

  /** v2 set-op mode: two differently-filtered projections of one table
    * under UNION ALL / INTERSECT / EXCEPT, total ORDER BY on the result.
    */
  private def setopQuery(seed: Int, rnd: Random, version: Int,
                         tableOverride: Option[String] = None): GenQuery = {
    val tables = Vector("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem")
    // v8 forces events/documents (no table draw — v8 seeds are a fresh
    // sequence); every older caller passes None and draws as before.
    val t = tableOverride.getOrElse(tables(rnd.nextInt(tables.length)))
    val cols = catalog(t)
    val k = 2 + rnd.nextInt(2)
    val picked = rnd.shuffle(cols.toVector).take(k)
    val items = picked.zipWithIndex.map { case (c, i) =>
      Item(s"c$i", c.name, col(c.name))
    }
    val predA = genPred(rnd, cols, version)
    val predB = genPred(rnd, cols, version)
    val op = rnd.nextInt(if (version >= 4) 4 else 3) match {
      case 0 => "UNION ALL"
      case 1 => "INTERSECT"
      case 2 => "EXCEPT"
      case _ => "UNION" // v4: distinct union
    }
    val selList = items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    val sql = s"SELECT $selList FROM $t WHERE ${predA.sql} " +
      s"$op SELECT $selList FROM $t WHERE ${predB.sql} " +
      "ORDER BY " + items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ") +
      " LIMIT 1000"

    val build = (s: SparkSession, d: String) => {
      val base = loadFuzzTable(s, d, t)
      val proj = items.map(i => i.col.as(i.alias))
      val a = base.where(predA.col).select(proj: _*)
      val b = base.where(predB.col).select(proj: _*)
      val combined = op match {
        case "UNION ALL" => a.union(b)
        case "UNION"     => a.union(b).distinct()
        case "INTERSECT" => a.intersect(b)
        case _           => a.except(b)
      }
      combined.orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
        .limit(1000)
    }
    GenQuery(seed, sql, build, mode = s"setop:$t")
  }

  /** FK → unique-PK edges of the corpus (same edges [[chains]] joins over):
    * (outer table, FK column, inner table, PK column). Subquery mode filters
    * the OUTER side through a membership/scalar test against the INNER side;
    * derived-table mode aggregates the outer (fact) side BY the FK and joins
    * the aggregate to the inner (dimension) side.
    */
  private[graft] val fkEdges: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** v5 subquery mode. SQL renders a genuine subquery (IN / EXISTS /
    * NOT EXISTS / scalar comparison) that both engines must decorrelate;
    * the DataFrame rendering is the already-rewritten plan (left_semi /
    * left_anti / cross-join on a 1-row aggregate). Determinism: membership
    * tests are row-level (no peer-order dependence); the scalar aggregate
    * draws only min/max (exact) or avg over ints (exact — see genAgg's v3
    * note); outer aggregation follows genAgg's rules; total ORDER BY.
    *
    * IN ≡ left_semi here because the subquery projects the inner PK (never
    * NULL, and a semi join collapses duplicates exactly as IN's existential
    * semantics do). The anti shape is drawn as NOT EXISTS — NOT IN would
    * differ under NULLs and is deliberately never generated.
    */
  private def subqueryQuery(seed: Int, rnd: Random, version: Int,
                            selfTable: Option[String] = None,
                            edgeOverride: Option[(String, String, String, String)] = None)
      : GenQuery = {
    // v8's self-scalar mode: outer and inner are the SAME corpus table
    // (events/documents — no FK edge exists), restricted to the scalar
    // shape. The membership/correlated shapes are impossible self-table:
    // the correlation `(pk = fk)` would render with one column name on
    // both sides, which is a tautology, not a join. Older callers pass
    // None and draw the edge + shape as before. v9 instead passes
    // edgeOverride (events→customer), which keeps ALL four shapes — the
    // edge is a real FK, so membership/correlation draw as usual.
    val (outerT, fk, innerT, pk) =
      selfTable.map(t => (t, "", t, ""))
        .orElse(edgeOverride)
        .getOrElse(fkEdges(rnd.nextInt(fkEdges.length)))
    val oCols = catalog(outerT)
    val iCols = catalog(innerT)
    val shape = // 0 IN, 1 EXISTS, 2 NOT EXISTS, 3 scalar
      if (selfTable.isDefined) 3 else rnd.nextInt(4)
    val modeTag = shape match {
      case 0 => "subq:in"
      case 1 => "subq:exists"
      case 2 => "subq:anti"
      case _ => "subq:scalar"
    }
    val innerPreds = Vector.fill(1 + rnd.nextInt(2))(genPred(rnd, iCols, version))
    val outerPreds = Vector.fill(rnd.nextInt(2))(genPred(rnd, oCols, version))
    val innerWhere = innerPreds.map(_.sql).mkString(" AND ")

    // scalar-shape draws (taken only when used, so the shapes stay
    // independently tweakable without moving each other's draws)
    val (subSql, applySub): (String, (DataFrame, SparkSession, String) => DataFrame) =
      shape match {
        case 3 =>
          val oInts = oCols.filter(_.kind == 'i')
          val iInts = iCols.filter(_.kind == 'i')
          val oc = oInts(rnd.nextInt(oInts.length))
          val ic = iInts(rnd.nextInt(iInts.length))
          val aggDraw = rnd.nextInt(3)
          val aggSql = aggDraw match {
            case 0 => s"min(${ic.name})"
            case 1 => s"max(${ic.name})"
            case _ => s"avg(${ic.name})"
          }
          val op = if (rnd.nextBoolean()) ">" else "<="
          (s"${oc.name} $op (SELECT $aggSql FROM $innerT WHERE $innerWhere)",
            (df: DataFrame, s: SparkSession, d: String) => {
              var in = loadFuzzTable(s, d, innerT)
              innerPreds.foreach(p => in = in.where(p.col))
              val aggCol = aggDraw match {
                case 0 => min(col(ic.name))
                case 1 => max(col(ic.name))
                case _ => avg(col(ic.name))
              }
              val sub = in.agg(aggCol.as("_sc"))
              val cmp =
                if (op == ">") col(oc.name) > col("_sc")
                else col(oc.name) <= col("_sc")
              df.crossJoin(sub).where(cmp).drop("_sc")
            })
        case _ =>
          val sql = shape match {
            case 0 => s"$fk IN (SELECT $pk FROM $innerT WHERE $innerWhere)"
            case 1 => s"EXISTS (SELECT 1 FROM $innerT WHERE ($pk = $fk) AND $innerWhere)"
            case _ => s"NOT EXISTS (SELECT 1 FROM $innerT WHERE ($pk = $fk) AND $innerWhere)"
          }
          val joinType = if (shape == 2) "left_anti" else "left_semi"
          (sql,
            (df: DataFrame, s: SparkSession, d: String) => {
              var in = loadFuzzTable(s, d, innerT)
              innerPreds.foreach(p => in = in.where(p.col))
              df.join(in.select(col(pk)), col(fk) === col(pk), joinType)
            })
      }

    val groupables = oCols.filter(_.groupable)
    val grouped = rnd.nextInt(10) >= 6 && groupables.nonEmpty
    val whereSql = (outerPreds.map(_.sql) :+ subSql).mkString(" AND ")

    if (grouped) {
      val key = groupables(rnd.nextInt(groupables.length))
      val aggs = (0 until 1 + rnd.nextInt(2)).map(i => genAgg(rnd, oCols, s"a$i", version))
      val items = Item("k0", key.name, col(key.name)) +: aggs
      val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
        s" FROM $outerT WHERE $whereSql GROUP BY ${key.name}" +
        " ORDER BY k0 ASC NULLS FIRST"
      val build = (s: SparkSession, d: String) => {
        var o = loadFuzzTable(s, d, outerT)
        outerPreds.foreach(p => o = o.where(p.col))
        o = applySub(o, s, d)
        o.groupBy(col(key.name))
          .agg(aggs.map(i => i.col.as(i.alias)).head,
            aggs.map(i => i.col.as(i.alias)).tail: _*)
          .select(items.map(i =>
            (if (i.alias == "k0") col(key.name) else col(i.alias)).as(i.alias)): _*)
          .orderBy(col("k0").asc_nulls_first)
      }
      GenQuery(seed, sql, build, mode = modeTag)
    } else {
      val k = 2 + rnd.nextInt(2)
      val picked = rnd.shuffle(oCols.toVector).take(k)
      val items = picked.zipWithIndex.map { case (c, i) =>
        Item(s"c$i", c.name, col(c.name))
      }
      val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
        s" FROM $outerT WHERE $whereSql" +
        " ORDER BY " + items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ") +
        " LIMIT 1000"
      val build = (s: SparkSession, d: String) => {
        var o = loadFuzzTable(s, d, outerT)
        outerPreds.foreach(p => o = o.where(p.col))
        o = applySub(o, s, d)
        o.select(items.map(i => i.col.as(i.alias)): _*)
          .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
          .limit(1000)
      }
      GenQuery(seed, sql, build, mode = modeTag)
    }
  }

  /** v5 derived-table mode: aggregate the fact side of an FK edge by the FK
    * inside a subquery (optional HAVING count(*)), join the aggregate to the
    * dimension, project dimension columns beside the aggregate — the
    * aggregate-below-join plan shape. Total ORDER BY over every output
    * column; aggregates follow genAgg's cross-engine-exact rules.
    */
  private def derivedJoinQuery(seed: Int, rnd: Random, version: Int,
                               edgeOverride: Option[(String, String, String, String)] = None)
      : GenQuery = {
    // v9 passes the events→customer edge (per-user event aggregates joined
    // to the customer dimension); older callers draw from fkEdges as before.
    val (factT, fk, dimT, pk) =
      edgeOverride.getOrElse(fkEdges(rnd.nextInt(fkEdges.length)))
    val fCols = catalog(factT)
    val dCols = catalog(dimT)
    val factPreds = Vector.fill(rnd.nextInt(3))(genPred(rnd, fCols, version))
    val aggs = (0 until 1 + rnd.nextInt(2)).map(i => genAgg(rnd, fCols, s"a$i", version))
    val having = if (rnd.nextDouble() < 0.3) Some(1 + rnd.nextInt(3)) else None
    val dimPred = if (rnd.nextDouble() < 0.4) Some(genPred(rnd, dCols, version)) else None
    val dimPicked = rnd.shuffle(dCols.toVector).take(1 + rnd.nextInt(2))

    val dimItems = dimPicked.zipWithIndex.map { case (c, i) =>
      Item(s"c$i", c.name, col(c.name))
    }
    val outItems =
      (Item("k0", "d.k0", col("k0")) +:
        aggs.map(a => Item(a.alias, s"d.${a.alias}", col(a.alias)))) ++ dimItems

    val derived = new StringBuilder(s"SELECT $fk AS k0, ")
    derived ++= aggs.map(a => s"${a.sql} AS ${a.alias}").mkString(", ")
    derived ++= s" FROM $factT"
    if (factPreds.nonEmpty)
      derived ++= " WHERE " + factPreds.map(_.sql).mkString(" AND ")
    derived ++= s" GROUP BY $fk"
    having.foreach(h => derived ++= s" HAVING count(*) > $h")

    val sb = new StringBuilder("SELECT ")
    sb ++= outItems.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM (${derived.result()}) d JOIN $dimT ON (d.k0 = $pk)"
    dimPred.foreach(p => sb ++= s" WHERE ${p.sql}")
    sb ++= " ORDER BY " +
      outItems.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
    sb ++= " LIMIT 1000"

    val build = (s: SparkSession, d: String) => {
      // loadFuzzTable (not Tables.load): v9's fact side can be events,
      // which must go through the vintage-adaptive normalization; for every
      // other table the two loaders are identical.
      var f = loadFuzzTable(s, d, factT)
      factPreds.foreach(p => f = f.where(p.col))
      val aggCols = aggs.map(i => i.col.as(i.alias)) ++
        having.map(_ => count(lit(1)).as("_hv")).toSeq
      var der = f.groupBy(col(fk)).agg(aggCols.head, aggCols.tail: _*)
      having.foreach(h => der = der.where(col("_hv") > h))
      der = der.withColumnRenamed(fk, "k0").drop("_hv")
      var dim = loadFuzzTable(s, d, dimT)
      dimPred.foreach(p => dim = dim.where(p.col))
      der.join(dim, col("k0") === col(pk), "inner")
        .select(outItems.map(i => i.col.as(i.alias)): _*)
        .orderBy(outItems.map(i => col(i.alias).asc_nulls_first): _*)
        .limit(1000)
    }
    GenQuery(seed, sb.result(), build, mode = "derived")
  }

  /** v10 chain pool: every flat chain plus the cross-family and
    * single-table analytics chains — conditional aggregates are meaningful
    * over all of them.
    */
  private def v10Chains: Seq[Chain] =
    chains :+ eventsCustomerChain :+ eventsChain :+ documentsChain

  /** v10 conditional-aggregate mode: a grouped aggregation whose measures
    * sit under a CASE guard — `sum(CASE WHEN p THEN 1 ELSE 0 END)` (the
    * count-if) and `min/max(CASE WHEN p THEN c END)` (no ELSE: the guard
    * maps non-matching rows to NULL, which both engines' min/max skip; a
    * group with zero matches yields NULL in both). Counts are
    * integer-exact, min/max value-deterministic — no accumulation-order
    * dependence anywhere. Total ORDER BY over the group keys.
    */
  private def condAggQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = v10Chains
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val groupables = cols.filter(_.groupable)
    val key = groupables(rnd.nextInt(groupables.length))

    val nAgg = 1 + rnd.nextInt(2)
    val aggs: Seq[Item] = (0 until nAgg).map { i =>
      val guard = genPred(rnd, cols, version)
      rnd.nextInt(3) match {
        case 0 =>
          Item(s"a$i",
            s"CAST(sum(CASE WHEN ${guard.sql} THEN 1 ELSE 0 END) AS BIGINT)",
            sum(when(guard.col, 1).otherwise(0)))
        case 1 =>
          val c = cols(rnd.nextInt(cols.length))
          Item(s"a$i", s"min(CASE WHEN ${guard.sql} THEN ${c.name} END)",
            min(when(guard.col, col(c.name))))
        case _ =>
          val c = cols(rnd.nextInt(cols.length))
          Item(s"a$i", s"max(CASE WHEN ${guard.sql} THEN ${c.name} END)",
            max(when(guard.col, col(c.name))))
      }
    }
    val items = Item("k0", key.name, col(key.name)) +: aggs :+
      Item("n", "count(*)", count(lit(1)))

    val sb = new StringBuilder("SELECT ")
    sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM ${chain.tables.head}"
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    sb ++= s" GROUP BY ${key.name} ORDER BY k0 ASC NULLS FIRST"

    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      val aggCols = (aggs :+ items.last).map(i => i.col.as(i.alias))
      j.groupBy(col(key.name))
        .agg(aggCols.head, aggCols.tail: _*)
        .select(items.map(i =>
          (if (i.alias == "k0") col(key.name) else col(i.alias)).as(i.alias)): _*)
        .orderBy(col("k0").asc_nulls_first)
    }
    GenQuery(seed, sb.result(), build, mode = "condagg")
  }

  /** v10 set-ops over joined projections: v2/v8's set-op mode projects ONE
    * table; this unions/intersects/excepts two differently-filtered
    * projections of a two-table JOIN — set semantics (duplicate
    * elimination, bag-difference) computed over join output. Same chain
    * and join kind in both branches, so a divergence isolates the set
    * operation itself.
    */
  private def setopJoinQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = chains.filter(_.tables.length == 2) :+ eventsCustomerChain
    val chain = pool(rnd.nextInt(pool.length))
    val joinKind = if (rnd.nextDouble() < 0.25) "LEFT" else "INNER"
    val cols = chain.tables.flatMap(catalog)
    val k = 2 + rnd.nextInt(2)
    val picked = rnd.shuffle(cols.toVector).take(k)
    val items = picked.zipWithIndex.map { case (c, i) =>
      Item(s"c$i", c.name, col(c.name))
    }
    val predA = genPred(rnd, cols, version)
    val predB = genPred(rnd, cols, version)
    val op = rnd.nextInt(4) match {
      case 0 => "UNION ALL"
      case 1 => "INTERSECT"
      case 2 => "EXCEPT"
      case _ => "UNION"
    }
    val selList = items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    val (lk, rk) = chain.joins.head
    val kw = if (joinKind == "LEFT") "LEFT JOIN" else "JOIN"
    val from =
      s"FROM ${chain.tables.head} $kw ${chain.tables(1)} ON ($lk = $rk)"
    val sql = s"SELECT $selList $from WHERE ${predA.sql} " +
      s"$op SELECT $selList $from WHERE ${predB.sql} " +
      "ORDER BY " + items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ") +
      " LIMIT 1000"

    val build = (s: SparkSession, d: String) => {
      def branch(p: P) = {
        val l = loadFuzzTable(s, d, chain.tables.head)
        val r = loadFuzzTable(s, d, chain.tables(1))
        l.join(r, col(lk) === col(rk), if (joinKind == "LEFT") "left" else "inner")
          .where(p.col)
          .select(items.map(i => i.col.as(i.alias)): _*)
      }
      val a = branch(predA); val b = branch(predB)
      val combined = op match {
        case "UNION ALL" => a.union(b)
        case "UNION"     => a.union(b).distinct()
        case "INTERSECT" => a.intersect(b)
        case _           => a.except(b)
      }
      combined.orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
        .limit(1000)
    }
    GenQuery(seed, sql, build, mode = "setopjoin")
  }

  /** v10 aggregate-of-aggregate: per-key counts (and optionally a sum) in
    * a derived table, re-aggregated — globally, or grouped by a modulo
    * bucket of the key (the distribution-of-group-sizes shape: "how many
    * orders does a customer place", then "summarize that distribution").
    * Two aggregation LEVELS where v5's derived mode has one level plus a
    * dim join. Outer aggregates draw only integer-exact shapes (count,
    * min/max, BIGINT-cast sum, avg over ints).
    */
  private def aggOfAggQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val (factT, fk, _, _) = fkEdges(rnd.nextInt(fkEdges.length))
    val fCols = catalog(factT)
    val innerPreds = Vector.fill(rnd.nextInt(3))(genPred(rnd, fCols, version))
    val withSum = rnd.nextBoolean()
    val sumCol = {
      val ints = fCols.filter(_.kind == 'i')
      ints(rnd.nextInt(ints.length))
    }
    val grouped = rnd.nextBoolean()
    val m = 2 + rnd.nextInt(5)

    val innerSelect = new StringBuilder(s"SELECT $fk AS k0, count(*) AS n")
    if (withSum) innerSelect ++= s", CAST(sum(${sumCol.name}) AS BIGINT) AS s"
    innerSelect ++= s" FROM $factT"
    if (innerPreds.nonEmpty)
      innerSelect ++= " WHERE " + innerPreds.map(_.sql).mkString(" AND ")
    innerSelect ++= s" GROUP BY $fk"

    // outer aggregates over the per-key counts: distribution summary
    val outerAggs: Seq[(String, Column)] = Seq(
      "n_keys" -> count(lit(1)),
      "max_n" -> max(col("n")),
      "sum_n" -> sum(col("n")),
      "avg_n" -> avg(col("n"))) ++
      (if (withSum) Seq("max_s" -> max(col("s"))) else Nil)
    val outerSqls: Seq[String] = Seq(
      "count(*)", "max(n)", "CAST(sum(n) AS BIGINT)", "avg(n)") ++
      (if (withSum) Seq("max(s)") else Nil)

    val sb = new StringBuilder("SELECT ")
    if (grouped) sb ++= s"(k0 % $m) AS g, "
    sb ++= outerSqls.zip(outerAggs.map(_._1))
      .map { case (sql, a) => s"$sql AS $a" }.mkString(", ")
    sb ++= s" FROM (${innerSelect.result()}) t"
    if (grouped) sb ++= s" GROUP BY (k0 % $m) ORDER BY g ASC NULLS FIRST"

    val build = (s: SparkSession, d: String) => {
      var f = loadFuzzTable(s, d, factT)
      innerPreds.foreach(p => f = f.where(p.col))
      val innerAggs = Seq(count(lit(1)).as("n")) ++
        (if (withSum) Seq(sum(col(sumCol.name)).as("s")) else Nil)
      val inner = f.groupBy(col(fk).as("k0"))
        .agg(innerAggs.head, innerAggs.tail: _*)
      val aggCols = outerAggs.map { case (a, c) => c.as(a) }
      if (grouped)
        inner.groupBy((col("k0") % m).as("g"))
          .agg(aggCols.head, aggCols.tail: _*)
          .orderBy(col("g").asc_nulls_first)
      else inner.agg(aggCols.head, aggCols.tail: _*)
    }
    GenQuery(seed, sb.result(), build, mode = "aggofagg")
  }

  /** v11 grouping-sets mode: ROLLUP or CUBE over two groupable columns
    * with the GROUPING() flags projected. Determinism: the flag pair plus
    * the key pair is a candidate key of the output (within (0,0) key
    * combos are unique; each super-aggregate set pins one key to NULL and
    * keeps the other unique; the grand total is a single row), so the
    * ORDER BY (g0, g1, k0, k1) prefix is total. GROUPING() is cast BIGINT
    * in both renderings — Spark's grouping() is ByteType, DuckDB's is not,
    * and the driver compares canonicalized integer text. Aggregates follow
    * genAgg's cross-engine-exact rules.
    *
    * EMPTY-input divergence (found by the v11 DuckDB soak, 13/200 seeds at
    * sf0.001): on zero input rows DuckDB emits the grand-total grouping
    * set as one row (the SQL-standard global-aggregate semantics for the
    * `()` set) while Spark's grouping-sets aggregation yields no rows.
    * Both renderings therefore carry `HAVING count(*) > 0` — identity on
    * non-empty input (every grouping-set row aggregates ≥ 1 source row)
    * and removes exactly the divergent row on empty input.
    */
  private def rollupQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = v10Chains.filter(_.tables.flatMap(catalog).count(_.groupable) >= 2)
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val groupables = cols.filter(_.groupable)
    val keys = rnd.shuffle(groupables.toVector).take(2)
    val isCube = rnd.nextBoolean()
    val aggs = (0 until 1 + rnd.nextInt(2)).map(i => genAgg(rnd, cols, s"a$i", version))
    val op = if (isCube) "CUBE" else "ROLLUP"

    val flagItems = keys.zipWithIndex.map { case (c, i) =>
      Item(s"g$i", s"CAST(grouping(${c.name}) AS BIGINT)",
        grouping(col(c.name)).cast("long"))
    }
    val keyItems = keys.zipWithIndex.map { case (c, i) =>
      Item(s"k$i", c.name, col(c.name))
    }
    val items = flagItems ++ keyItems ++ aggs

    val sb = new StringBuilder("SELECT ")
    sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM ${chain.tables.head}"
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    sb ++= s" GROUP BY $op (${keys.map(_.name).mkString(", ")})"
    sb ++= " HAVING count(*) > 0"
    sb ++= " ORDER BY " + (flagItems ++ keyItems)
      .map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")

    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      val gb =
        if (isCube) j.cube(keys.map(c => col(c.name)): _*)
        else j.rollup(keys.map(c => col(c.name)): _*)
      val aggCols = (flagItems ++ aggs).map(i => i.col.as(i.alias)) :+
        count(lit(1)).as("_hv")
      gb.agg(aggCols.head, aggCols.tail: _*)
        .where(col("_hv") > 0)
        .select(items.map(i =>
          (if (i.alias.startsWith("k"))
            col(keys(i.alias.drop(1).toInt).name)
          else col(i.alias)).as(i.alias)): _*)
        .orderBy((flagItems ++ keyItems).map(i => col(i.alias).asc_nulls_first): _*)
    }
    GenQuery(seed, sb.result(), build, mode = op.toLowerCase)
  }

  /** v11 missing-LEFT-join mode: every corpus chain edge is FK-contained,
    * so a bare LEFT join never misses — pushing 1-2 dimension predicates
    * into the compound ON clause (`LEFT JOIN dim ON (fk = pk AND p…)`)
    * makes the right side genuinely NULL for non-qualifying rows. Three
    * consuming shapes: the IS NULL anti filter (the classic
    * find-the-orphans form), a COALESCE repair projection beside a
    * CASE-matched flag, and a GROUP BY over the matched flag. All
    * value-level — no accumulation-order dependence; total ORDER BY.
    */
  private def leftNullQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val edges = fkEdges :+ eventsCustomerEdge
    val (factT, fk, dimT, pk) = edges(rnd.nextInt(edges.length))
    val fCols = catalog(factT)
    val dCols = catalog(dimT)
    val onPreds = Vector.fill(1 + rnd.nextInt(2))(genPred(rnd, dCols, version))
    val outerPreds = Vector.fill(rnd.nextInt(2))(genPred(rnd, fCols, version))
    val shape = rnd.nextInt(3) // 0 anti, 1 coalesce proj, 2 matched-flag group

    val onSql = (s"$fk = $pk" +: onPreds.map(_.sql)).mkString(" AND ")
    val onCol = onPreds.foldLeft(col(fk) === col(pk))((c, p) => c && p.col)
    val fromSql = s"FROM $factT LEFT JOIN $dimT ON ($onSql)"
    def joined(s: SparkSession, d: String): DataFrame = {
      var f = loadFuzzTable(s, d, factT)
      outerPreds.foreach(p => f = f.where(p.col))
      f.join(loadFuzzTable(s, d, dimT), onCol, "left")
    }
    val outerWhere = outerPreds.map(_.sql)

    shape match {
      case 0 =>
        val k = 2 + rnd.nextInt(2)
        val picked = rnd.shuffle(fCols.toVector).take(k)
        val items = picked.zipWithIndex.map { case (c, i) =>
          Item(s"c$i", c.name, col(c.name))
        }
        val whereSql = (outerWhere :+ s"$pk IS NULL").mkString(" AND ")
        val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
          s" $fromSql WHERE $whereSql" +
          " ORDER BY " + items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ") +
          " LIMIT 1000"
        val build = (s: SparkSession, d: String) =>
          joined(s, d).where(col(pk).isNull)
            .select(items.map(i => i.col.as(i.alias)): _*)
            .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
            .limit(1000)
        GenQuery(seed, sql, build, mode = "leftnull:anti")
      case 1 =>
        val picked = rnd.shuffle(fCols.toVector).take(2)
        val dc = dCols(rnd.nextInt(dCols.length))
        val dl = dc.lits(rnd.nextInt(dc.lits.length))
        val items = picked.zipWithIndex.map { case (c, i) =>
          Item(s"c$i", c.name, col(c.name))
        } ++ Seq(
          Item("cx", s"COALESCE(${dc.name}, ${dl.sql})",
            coalesce(col(dc.name), dl.col)),
          Item("m", s"CASE WHEN $pk IS NULL THEN 0 ELSE 1 END",
            when(col(pk).isNull, 0).otherwise(1)))
        val whereSql =
          if (outerWhere.isEmpty) "" else " WHERE " + outerWhere.mkString(" AND ")
        val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
          s" $fromSql$whereSql" +
          " ORDER BY " + items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ") +
          " LIMIT 1000"
        val build = (s: SparkSession, d: String) =>
          joined(s, d)
            .select(items.map(i => i.col.as(i.alias)): _*)
            .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
            .limit(1000)
        GenQuery(seed, sql, build, mode = "leftnull:coalesce")
      case _ =>
        val aggs = (0 until 1 + rnd.nextInt(2)).map(i => genAgg(rnd, fCols, s"a$i", version))
        val flagSql = s"CASE WHEN $pk IS NULL THEN 0 ELSE 1 END"
        val items = Item("k0", flagSql, when(col(pk).isNull, 0).otherwise(1)) +:
          (Item("n", "count(*)", count(lit(1))) +: aggs)
        val whereSql =
          if (outerWhere.isEmpty) "" else " WHERE " + outerWhere.mkString(" AND ")
        val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
          s" $fromSql$whereSql GROUP BY $flagSql ORDER BY k0 ASC NULLS FIRST"
        val build = (s: SparkSession, d: String) => {
          val aggCols = items.drop(1).map(i => i.col.as(i.alias))
          joined(s, d)
            .groupBy(when(col(pk).isNull, 0).otherwise(1).as("k0"))
            .agg(aggCols.head, aggCols.tail: _*)
            .orderBy(col("k0").asc_nulls_first)
        }
        GenQuery(seed, sql, build, mode = "leftnull:flag")
    }
  }

  /** v11 top-N-groups mode: grouped aggregation ORDERED BY the first
    * aggregate (DESC NULLS LAST — Spark's desc default) with the group
    * keys as the unique ascending tiebreak, under LIMIT 100. Rows tied on
    * the aggregate are totally ordered by the keys, so the limit boundary
    * is deterministic. Aggregates follow genAgg's exact rules (avg-of-int
    * doubles are exactly representable, so DESC comparison ties resolve
    * identically in both engines).
    */
  private def topGroupsQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = v10Chains
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val groupables = cols.filter(_.groupable)
    val keys = rnd.shuffle(groupables.toVector).take(1 + rnd.nextInt(2))
    val aggs = (0 until 1 + rnd.nextInt(2)).map(i => genAgg(rnd, cols, s"a$i", version))
    val having = if (rnd.nextDouble() < 0.3) Some(1 + rnd.nextInt(3)) else None

    val keyItems = keys.zipWithIndex.map { case (c, i) =>
      Item(s"k$i", c.name, col(c.name))
    }
    val items = keyItems ++ aggs
    val orderSql = s"a0 DESC NULLS LAST, " +
      keyItems.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")

    val sb = new StringBuilder("SELECT ")
    sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM ${chain.tables.head}"
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    sb ++= s" GROUP BY ${keys.map(_.name).mkString(", ")}"
    having.foreach(h => sb ++= s" HAVING count(*) > $h")
    sb ++= s" ORDER BY $orderSql LIMIT 100"

    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      val aggCols = aggs.map(i => i.col.as(i.alias)) ++
        having.map(_ => count(lit(1)).as("_hv")).toSeq
      var agged = j.groupBy(keys.map(c => col(c.name)): _*)
        .agg(aggCols.head, aggCols.tail: _*)
      having.foreach(h => agged = agged.where(col("_hv") > h))
      agged
        .select(items.map(i =>
          (if (i.alias.startsWith("k"))
            col(keys(i.alias.drop(1).toInt).name)
          else col(i.alias)).as(i.alias)): _*)
        .orderBy(col("a0").desc_nulls_last +:
          keyItems.map(i => col(i.alias).asc_nulls_first): _*)
        .limit(100)
    }
    GenQuery(seed, sb.result(), build, mode = "topgroups")
  }

  /** v12 FULL OUTER mode: predicates on BOTH sides inside the compound ON
    * (`FULL JOIN dim ON (fk = pk AND factPred AND dimPred)`) so fact rows
    * without a qualifying dim AND dim rows without a qualifying fact both
    * survive NULL-extended. Consumed as a projection — COALESCE'd key, one
    * column from each side, a CASE source tag ('both'/'fact'/'dim') — or
    * as a GROUP BY over the tag. All value-level; total ORDER BY.
    */
  private def fullOuterQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val edges = fkEdges :+ eventsCustomerEdge
    val (factT, fk, dimT, pk) = edges(rnd.nextInt(edges.length))
    val fCols = catalog(factT)
    val dCols = catalog(dimT)
    val fPred = genPred(rnd, fCols, version)
    val dPred = genPred(rnd, dCols, version)
    val onSql = s"$fk = $pk AND ${fPred.sql} AND ${dPred.sql}"
    val onCol = col(fk) === col(pk) && fPred.col && dPred.col
    val fromSql = s"FROM $factT FULL JOIN $dimT ON ($onSql)"
    val tagSql = s"CASE WHEN $fk IS NULL THEN 'dim' WHEN $pk IS NULL" +
      " THEN 'fact' ELSE 'both' END"
    val tagCol = when(col(fk).isNull, "dim")
      .when(col(pk).isNull, "fact").otherwise("both")
    def joined(s: SparkSession, d: String): DataFrame =
      loadFuzzTable(s, d, factT)
        .join(loadFuzzTable(s, d, dimT), onCol, "full")

    if (rnd.nextBoolean()) {
      // projection shape
      val fc = fCols(rnd.nextInt(fCols.length))
      val dc = dCols(rnd.nextInt(dCols.length))
      val items = Seq(
        Item("k0", s"COALESCE($fk, $pk)", coalesce(col(fk), col(pk))),
        Item("c0", fc.name, col(fc.name)),
        Item("c1", dc.name, col(dc.name)),
        Item("src", tagSql, tagCol))
      val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
        s" $fromSql ORDER BY " +
        items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ") +
        " LIMIT 1000"
      val build = (s: SparkSession, d: String) =>
        joined(s, d)
          .select(items.map(i => i.col.as(i.alias)): _*)
          .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
          .limit(1000)
      GenQuery(seed, sql, build, mode = "fullouter:proj")
    } else {
      // grouped-by-tag shape
      val aggs = (0 until 1 + rnd.nextInt(2)).map(i => genAgg(rnd, dCols, s"a$i", version))
      val items = Item("k0", tagSql, tagCol) +:
        (Item("n", "count(*)", count(lit(1))) +: aggs)
      val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
        s" $fromSql GROUP BY $tagSql ORDER BY k0 ASC NULLS FIRST"
      val build = (s: SparkSession, d: String) => {
        val aggCols = items.drop(1).map(i => i.col.as(i.alias))
        joined(s, d)
          .groupBy(tagCol.as("k0"))
          .agg(aggCols.head, aggCols.tail: _*)
          .orderBy(col("k0").asc_nulls_first)
      }
      GenQuery(seed, sql, build, mode = "fullouter:group")
    }
  }

  /** v12 bag-semantics set ops: INTERSECT ALL / EXCEPT ALL of two
    * differently-filtered projections of one table — multiset semantics
    * (duplicate multiplicity min/difference) where v2/v8 draw only the
    * DISTINCT forms. Duplicate output rows are indistinguishable under the
    * total ORDER BY, so row order stays deterministic.
    */
  private def setopAllQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val tables = Vector("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents")
    val t = tables(rnd.nextInt(tables.length))
    val cols = catalog(t)
    val k = 2 + rnd.nextInt(2)
    val picked = rnd.shuffle(cols.toVector).take(k)
    val items = picked.zipWithIndex.map { case (c, i) =>
      Item(s"c$i", c.name, col(c.name))
    }
    val predA = genPred(rnd, cols, version)
    val predB = genPred(rnd, cols, version)
    val op = if (rnd.nextBoolean()) "INTERSECT ALL" else "EXCEPT ALL"
    val selList = items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    val sql = s"SELECT $selList FROM $t WHERE ${predA.sql} " +
      s"$op SELECT $selList FROM $t WHERE ${predB.sql} " +
      "ORDER BY " + items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ") +
      " LIMIT 1000"
    val build = (s: SparkSession, d: String) => {
      val base = loadFuzzTable(s, d, t)
      val proj = items.map(i => i.col.as(i.alias))
      val a = base.where(predA.col).select(proj: _*)
      val b = base.where(predB.col).select(proj: _*)
      val combined =
        if (op == "INTERSECT ALL") a.intersectAll(b) else a.exceptAll(b)
      combined.orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
        .limit(1000)
    }
    GenQuery(seed, sql, build, mode = "setopall")
  }

  /** v12 aggregate⋈aggregate: two differently-filtered groupings joined
    * per key — usually two filters over ONE fact table grouped by the
    * same FK (compare-two-cohorts), sometimes customer-vs-supplier
    * aggregates meeting on the shared nation key. INNER or LEFT (LEFT
    * NULL-extends the right cohort's aggregates for keys it lacks). Both
    * pipelines use genAgg's exact aggregates; the key is unique per side
    * after grouping, so ORDER BY k0 is total.
    */
  private def aggJoinQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    // (left table, left key, right table, right key)
    val (lt, lk, rt, rk) =
      if (rnd.nextInt(10) < 7) {
        val (factT, fk, _, _) = fkEdges(rnd.nextInt(fkEdges.length))
        (factT, fk, factT, fk)
      } else ("customer", "c_nationkey", "supplier", "s_nationkey")
    val lCols = catalog(lt)
    val rCols = catalog(rt)
    val predA = genPred(rnd, lCols, version)
    val predB = genPred(rnd, rCols, version)
    val aggA = genAgg(rnd, lCols, "xa", version)
    val aggB = genAgg(rnd, rCols, "xb", version)
    val joinKind = if (rnd.nextInt(4) == 0) "LEFT" else "INNER"
    val kw = if (joinKind == "LEFT") "LEFT JOIN" else "JOIN"

    val sql = s"SELECT a.k0 AS k0, a.na AS na, a.xa AS xa, b.nb AS nb, b.xb AS xb" +
      s" FROM (SELECT $lk AS k0, count(*) AS na, ${aggA.sql} AS xa" +
      s" FROM $lt WHERE ${predA.sql} GROUP BY $lk) a" +
      s" $kw (SELECT $rk AS k1, count(*) AS nb, ${aggB.sql} AS xb" +
      s" FROM $rt WHERE ${predB.sql} GROUP BY $rk) b ON (a.k0 = b.k1)" +
      " ORDER BY k0 ASC NULLS FIRST"

    val build = (s: SparkSession, d: String) => {
      val a = loadFuzzTable(s, d, lt).where(predA.col)
        .groupBy(col(lk).as("k0"))
        .agg(count(lit(1)).as("na"), aggA.col.as("xa"))
      val b = loadFuzzTable(s, d, rt).where(predB.col)
        .groupBy(col(rk).as("k1"))
        .agg(count(lit(1)).as("nb"), aggB.col.as("xb"))
      a.join(b, col("k0") === col("k1"),
          if (joinKind == "LEFT") "left" else "inner")
        .select(col("k0"), col("na"), col("xa"), col("nb"), col("xb"))
        .orderBy(col("k0").asc_nulls_first)
    }
    GenQuery(seed, sql, build, mode = "aggjoin")
  }

  /** v13 computed scalar expression: string functions (upper / 1-based
    * substr / character length), BIGINT arithmetic (operands cast BEFORE
    * the op — engines agree on BIGINT arithmetic, not on overflow), and
    * timestamp field extraction (cast BIGINT: Spark returns INT, DuckDB
    * BIGINT). The timestamp draw remaps to arithmetic when the chain has
    * no timestamp column (same remap discipline as the window functions).
    */
  private def genExpr(rnd: Random, cols: Seq[FCol], alias: String): Item = {
    val sCols = cols.filter(_.kind == 's')
    val iCols = cols.filter(_.kind == 'i')
    val tCols = cols.filter(_.kind == 't')
    val d0 = rnd.nextInt(6)
    val d = if (d0 == 5 && tCols.isEmpty) 3 else d0
    d match {
      case 0 =>
        val c = sCols(rnd.nextInt(sCols.length))
        Item(alias, s"upper(${c.name})", upper(col(c.name)))
      case 1 =>
        val c = sCols(rnd.nextInt(sCols.length))
        val l = 2 + rnd.nextInt(3)
        Item(alias, s"substr(${c.name}, 1, $l)", substring(col(c.name), 1, l))
      case 2 =>
        val c = sCols(rnd.nextInt(sCols.length))
        Item(alias, s"CAST(length(${c.name}) AS BIGINT)",
          length(col(c.name)).cast(org.apache.spark.sql.types.LongType))
      case 3 =>
        val a = iCols(rnd.nextInt(iCols.length))
        val b = iCols(rnd.nextInt(iCols.length))
        Item(alias, s"(CAST(${a.name} AS BIGINT) + CAST(${b.name} AS BIGINT))",
          col(a.name).cast(org.apache.spark.sql.types.LongType) +
            col(b.name).cast(org.apache.spark.sql.types.LongType))
      case 4 =>
        val a = iCols(rnd.nextInt(iCols.length))
        Item(alias, s"(CAST(${a.name} AS BIGINT) * 2)",
          col(a.name).cast(org.apache.spark.sql.types.LongType) * 2)
      case _ =>
        val c = tCols(rnd.nextInt(tCols.length))
        val (fnSql, fnCol) = rnd.nextInt(3) match {
          case 0 => ("year", year(col(c.name)))
          case 1 => ("month", month(col(c.name)))
          case _ => ("day", dayofmonth(col(c.name)))
        }
        Item(alias, s"CAST($fnSql(${c.name}) AS BIGINT)",
          fnCol.cast(org.apache.spark.sql.types.LongType))
    }
  }

  /** v13 computed-projection mode: raw columns beside drawn scalar
    * expressions, total ORDER BY over every output, LIMIT.
    */
  private def exprProjQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = v10Chains
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val nRaw = 1 + rnd.nextInt(2)
    val raw = rnd.shuffle(cols.toVector).take(nRaw).zipWithIndex.map {
      case (c, i) => Item(s"c$i", c.name, col(c.name))
    }
    val exprs = (0 until 2).map(i => genExpr(rnd, cols, s"e$i"))
    val items = raw ++ exprs

    val sb = new StringBuilder("SELECT ")
    sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM ${chain.tables.head}"
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    sb ++= " ORDER BY " +
      items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
    sb ++= " LIMIT 1000"

    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      j.select(items.map(i => i.col.as(i.alias)): _*)
        .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
        .limit(1000)
    }
    GenQuery(seed, sb.result(), build, mode = "exprproj")
  }

  /** v13 sliding-frame window mode: sum/min/max/count OVER a bounded
    * ROWS BETWEEN k PRECEDING AND CURRENT ROW frame, ordered by the head
    * table's verified-unique key (a bounded frame's content depends on
    * peer ORDER, so only total orderings are drawn — the same discipline
    * as row_number/lag). Every older frame is unbounded, running, or
    * whole-partition.
    */
  private def slidingWindowQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = (chains :+ eventsCustomerChain :+ eventsChain :+ documentsChain)
      .filter(c => uniqueKeys.contains(c.tables.head))
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val uk = uniqueKeys(chain.tables.head)
    val groupables = cols.filter(_.groupable)
    val g = groupables(rnd.nextInt(groupables.length))
    val k = 1 + rnd.nextInt(4)
    val intCols = cols.filter(_.kind == 'i')
    val anyCol = cols(rnd.nextInt(cols.length))
    val sumCol = intCols(rnd.nextInt(intCols.length))
    val ukOrderSql = uk.map(kc => s"$kc ASC NULLS FIRST").mkString(", ")
    val frameSql = s"ROWS BETWEEN $k PRECEDING AND CURRENT ROW"
    def w = Window.partitionBy(col(g.name))
      .orderBy(uk.map(col(_).asc_nulls_first): _*)
      .rowsBetween(-k, Window.currentRow)
    val (wSql, wCol) = rnd.nextInt(4) match {
      case 0 =>
        (s"CAST(sum(${sumCol.name}) OVER (PARTITION BY ${g.name}" +
          s" ORDER BY $ukOrderSql $frameSql) AS BIGINT)",
          sum(col(sumCol.name)).over(w))
      case 1 =>
        (s"min(${anyCol.name}) OVER (PARTITION BY ${g.name}" +
          s" ORDER BY $ukOrderSql $frameSql)",
          min(col(anyCol.name)).over(w))
      case 2 =>
        (s"max(${anyCol.name}) OVER (PARTITION BY ${g.name}" +
          s" ORDER BY $ukOrderSql $frameSql)",
          max(col(anyCol.name)).over(w))
      case _ =>
        (s"count(${anyCol.name}) OVER (PARTITION BY ${g.name}" +
          s" ORDER BY $ukOrderSql $frameSql)",
          count(col(anyCol.name)).over(w))
    }
    val items =
      uk.zipWithIndex.map { case (kc, i) => Item(s"u$i", kc, col(kc)) } ++
        Seq(Item("k0", g.name, col(g.name)), Item("w0", wSql, wCol))

    val sb = new StringBuilder("SELECT ")
    sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM ${chain.tables.head}"
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    sb ++= " ORDER BY " +
      items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
    sb ++= " LIMIT 1000"

    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      j.select(items.map(i => i.col.as(i.alias)): _*)
        .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
        .limit(1000)
    }
    GenQuery(seed, sb.result(), build, mode = "sliding")
  }

  /** v13 CASE-expression group key: GROUP BY a computed predicate bucket
    * ('hit'/'miss'), sometimes beside a raw second key. Every older
    * grouped mode keys on raw columns (v10's modulo bucket excepted).
    */
  private def caseKeyQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = v10Chains
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val guard = genPred(rnd, cols, version)
    val keySql = s"CASE WHEN ${guard.sql} THEN 'hit' ELSE 'miss' END"
    val keyCol = when(guard.col, "hit").otherwise("miss")
    val groupables = cols.filter(_.groupable)
    val g2: Option[FCol] =
      if (rnd.nextInt(3) == 0 && groupables.nonEmpty)
        Some(groupables(rnd.nextInt(groupables.length)))
      else None
    val aggs = (0 until 1 + rnd.nextInt(2)).map(i => genAgg(rnd, cols, s"a$i", version))
    val keyItems = Item("k0", keySql, keyCol) +:
      g2.map(c => Item("k1", c.name, col(c.name))).toSeq
    val items = keyItems ++ aggs

    val sb = new StringBuilder("SELECT ")
    sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM ${chain.tables.head}"
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    sb ++= s" GROUP BY $keySql" + g2.map(c => s", ${c.name}").getOrElse("")
    sb ++= " ORDER BY " +
      keyItems.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")

    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      val gCols = keyCol.as("k0") +: g2.map(c => col(c.name).as("k1")).toSeq
      val aggCols = aggs.map(i => i.col.as(i.alias))
      j.groupBy(gCols: _*)
        .agg(aggCols.head, aggCols.tail: _*)
        .orderBy(keyItems.map(i => col(i.alias).asc_nulls_first): _*)
    }
    GenQuery(seed, sb.result(), build, mode = "casekey")
  }

  /** v14 correlated scalar subquery: `(SELECT min/max/avg(ic) FROM inner
    * WHERE pk = fk AND …)` — in the projection (NULL where no inner row
    * qualifies, both engines) or in WHERE (NULL comparison → row dropped,
    * both engines). The SQL rendering makes both engines DECORRELATE the
    * correlated scalar; the DataFrame rendering is the decorrelated plan
    * itself — a LEFT join against the per-key inner aggregate. avg stays
    * int-only per genAgg's exactness rules.
    */
  private def corrScalarQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val edges = fkEdges :+ eventsCustomerEdge
    val (outerT, fk, innerT, pk) = edges(rnd.nextInt(edges.length))
    val oCols = catalog(outerT)
    val iCols = catalog(innerT)
    val iInts = iCols.filter(_.kind == 'i')
    val ic = iInts(rnd.nextInt(iInts.length))
    val aggDraw = rnd.nextInt(3)
    val (aggSql, aggCol: Column) = aggDraw match {
      case 0 => (s"min(${ic.name})", min(col(ic.name)))
      case 1 => (s"max(${ic.name})", max(col(ic.name)))
      case _ => (s"avg(${ic.name})", avg(col(ic.name)))
    }
    val innerPreds = Vector.fill(rnd.nextInt(2))(genPred(rnd, iCols, version))
    val outerPreds = Vector.fill(rnd.nextInt(2))(genPred(rnd, oCols, version))
    val innerWhere =
      (s"$pk = $fk" +: innerPreds.map(_.sql)).mkString(" AND ")
    val subSql = s"(SELECT $aggSql FROM $innerT WHERE $innerWhere)"
    val inWhere = rnd.nextBoolean()

    def innerAgg(s: SparkSession, d: String): DataFrame = {
      var in = loadFuzzTable(s, d, innerT)
      innerPreds.foreach(p => in = in.where(p.col))
      in.groupBy(col(pk)).agg(aggCol.as("_sc"))
    }

    if (inWhere) {
      val oInts = oCols.filter(_.kind == 'i')
      val oc = oInts(rnd.nextInt(oInts.length))
      val op = if (rnd.nextBoolean()) ">" else "<="
      val k = 2 + rnd.nextInt(2)
      val picked = rnd.shuffle(oCols.toVector).take(k)
      val items = picked.zipWithIndex.map { case (c, i) =>
        Item(s"c$i", c.name, col(c.name))
      }
      val whereSql =
        (outerPreds.map(_.sql) :+ s"${oc.name} $op $subSql").mkString(" AND ")
      val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
        s" FROM $outerT WHERE $whereSql" +
        " ORDER BY " + items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ") +
        " LIMIT 1000"
      val build = (s: SparkSession, d: String) => {
        var o = loadFuzzTable(s, d, outerT)
        outerPreds.foreach(p => o = o.where(p.col))
        val cmp = if (op == ">") col(oc.name) > col("_sc")
                  else col(oc.name) <= col("_sc")
        o.join(innerAgg(s, d), col(fk) === col(pk), "left")
          .where(cmp)
          .select(items.map(i => i.col.as(i.alias)): _*)
          .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
          .limit(1000)
      }
      GenQuery(seed, sql, build, mode = "corrscalar:where")
    } else {
      val picked = rnd.shuffle(oCols.toVector).take(2)
      val items = picked.zipWithIndex.map { case (c, i) =>
        Item(s"c$i", c.name, col(c.name))
      } :+ Item("sc", subSql, col("_sc"))
      val whereSql =
        if (outerPreds.isEmpty) ""
        else " WHERE " + outerPreds.map(_.sql).mkString(" AND ")
      val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
        s" FROM $outerT$whereSql" +
        " ORDER BY " + items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ") +
        " LIMIT 1000"
      val build = (s: SparkSession, d: String) => {
        var o = loadFuzzTable(s, d, outerT)
        outerPreds.foreach(p => o = o.where(p.col))
        o.join(innerAgg(s, d), col(fk) === col(pk), "left")
          .select(items.map(i => i.col.as(i.alias)): _*)
          .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
          .limit(1000)
      }
      GenQuery(seed, sql, build, mode = "corrscalar:proj")
    }
  }

  /** v14 non-count HAVING: grouped aggregation filtered on `max(ic) > v`
    * or `min(ic) <= v` — a value-deterministic aggregate bound, where
    * every older HAVING is count(*) > h.
    */
  private def havingAggQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = v10Chains
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val groupables = cols.filter(_.groupable)
    val keys = rnd.shuffle(groupables.toVector).take(1 + rnd.nextInt(2))
    val aggs = (0 until 1 + rnd.nextInt(2)).map(i => genAgg(rnd, cols, s"a$i", version))
    val iCols = cols.filter(_.kind == 'i')
    val hc = iCols(rnd.nextInt(iCols.length))
    val hl = hc.lits(rnd.nextInt(hc.lits.length))
    val useMax = rnd.nextBoolean()
    val havSql = if (useMax) s"max(${hc.name}) > ${hl.sql}"
                 else s"min(${hc.name}) <= ${hl.sql}"
    val havCol = if (useMax) max(col(hc.name)) > hl.col
                 else min(col(hc.name)) <= hl.col

    val keyItems = keys.zipWithIndex.map { case (c, i) =>
      Item(s"k$i", c.name, col(c.name))
    }
    val items = keyItems ++ aggs

    val sb = new StringBuilder("SELECT ")
    sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM ${chain.tables.head}"
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    sb ++= s" GROUP BY ${keys.map(_.name).mkString(", ")} HAVING $havSql"
    sb ++= " ORDER BY " +
      keyItems.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")

    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      val aggCols = aggs.map(i => i.col.as(i.alias)) :+ havCol.as("_hv")
      j.groupBy(keys.map(c => col(c.name)): _*)
        .agg(aggCols.head, aggCols.tail: _*)
        .where(col("_hv"))
        .select(items.map(i =>
          (if (i.alias.startsWith("k"))
            col(keys(i.alias.drop(1).toInt).name)
          else col(i.alias)).as(i.alias)): _*)
        .orderBy(keyItems.map(i => col(i.alias).asc_nulls_first): _*)
    }
    GenQuery(seed, sb.result(), build, mode = "havingagg")
  }

  /** v14 three-branch UNION ALL: associativity and column alignment over
    * more than two inputs — every older set-op has exactly two branches.
    */
  private def unionThreeQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val tables = Vector("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents")
    val t = tables(rnd.nextInt(tables.length))
    val cols = catalog(t)
    val k = 2 + rnd.nextInt(2)
    val picked = rnd.shuffle(cols.toVector).take(k)
    val items = picked.zipWithIndex.map { case (c, i) =>
      Item(s"c$i", c.name, col(c.name))
    }
    val ps = Vector.fill(3)(genPred(rnd, cols, version))
    val selList = items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    val sql = ps.map(p => s"SELECT $selList FROM $t WHERE ${p.sql}")
      .mkString(" UNION ALL ") +
      " ORDER BY " + items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ") +
      " LIMIT 1000"
    val build = (s: SparkSession, d: String) => {
      val base = loadFuzzTable(s, d, t)
      val proj = items.map(i => i.col.as(i.alias))
      val parts = ps.map(p => base.where(p.col).select(proj: _*))
      parts.reduce(_ union _)
        .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
        .limit(1000)
    }
    GenQuery(seed, sql, build, mode = "union3")
  }

  /** v15 window-over-aggregate: rank the GROUPS by their aggregate value
    * (DESC, keys as the unique ascending tiebreak — a total order, so
    * even row_number is deterministic) inside the grouped SELECT itself:
    * both engines evaluate window functions after aggregation. Cast
    * BIGINT — Spark's rank family returns INT, DuckDB's BIGINT. The
    * global (unpartitioned) window runs over POST-aggregate rows — group
    * cardinality, not corpus cardinality — which is what makes the
    * rank-the-cohorts pattern scale-sane.
    */
  private def aggRankQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = v10Chains
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val groupables = cols.filter(_.groupable)
    val keys = rnd.shuffle(groupables.toVector).take(1 + rnd.nextInt(2))
    val measure = genAgg(rnd, cols, "a0", version)
    val fnDraw = rnd.nextInt(3)
    val keyItems = keys.zipWithIndex.map { case (c, i) =>
      Item(s"k$i", c.name, col(c.name))
    }
    val overSql = s"ORDER BY ${measure.sql} DESC NULLS LAST, " +
      keys.map(c => s"${c.name} ASC NULLS FIRST").mkString(", ")
    val fnSql = fnDraw match {
      case 0 => "rank()"
      case 1 => "dense_rank()"
      case _ => "row_number()"
    }
    // the real window Column (over the post-aggregate aliases a0/k*, which
    // resolve where the build applies it) — ADVICE r11: a lit(0) placeholder
    // here would silently render a constant if the Item were ever consumed
    // as a Column by a future refactor
    val w0 = Window.orderBy(
      col("a0").desc_nulls_last +:
        keys.indices.map(i => col(s"k$i").asc_nulls_first): _*)
    val fnCol0 = fnDraw match {
      case 0 => rank()
      case 1 => dense_rank()
      case _ => row_number()
    }
    val rankItem = Item("r", s"CAST($fnSql OVER ($overSql) AS BIGINT)",
      fnCol0.over(w0).cast(org.apache.spark.sql.types.LongType))
    val items = keyItems ++ Seq(measure, rankItem)

    val sb = new StringBuilder("SELECT ")
    sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM ${chain.tables.head}"
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    sb ++= s" GROUP BY ${keys.map(_.name).mkString(", ")}"
    sb ++= " ORDER BY " +
      keyItems.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")

    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      j.groupBy(keys.map(c => col(c.name)): _*)
        .agg(measure.col.as("a0"))
        .select(keyItems.map(i => col(i.sql).as(i.alias)) :+ col("a0"): _*)
        .withColumn("r", rankItem.col)
        .orderBy(keyItems.map(i => col(i.alias).asc_nulls_first): _*)
    }
    GenQuery(seed, sb.result(), build, mode = "aggrank")
  }

  /** v15 pagination: a total-ordered projection under LIMIT n OFFSET m —
    * deterministic because the ORDER BY covers every output column.
    */
  private def offsetQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = v10Chains
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val k = 2 + rnd.nextInt(2)
    val picked = rnd.shuffle(cols.toVector).take(k)
    val items = picked.zipWithIndex.map { case (c, i) =>
      Item(s"c$i", c.name, col(c.name))
    }
    val lim = 50 + rnd.nextInt(200)
    val off = 1 + rnd.nextInt(50)

    val sb = new StringBuilder("SELECT ")
    sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM ${chain.tables.head}"
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    sb ++= " ORDER BY " +
      items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
    sb ++= s" LIMIT $lim OFFSET $off"

    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      j.select(items.map(i => i.col.as(i.alias)): _*)
        .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
        .offset(off)
        .limit(lim)
    }
    GenQuery(seed, sb.result(), build, mode = "offset")
  }

  /** v15 NULL-injection scalars: NULLIF manufactures NULLs mid-projection
    * (flowing through the ORDER BY NULLS placement), IS DISTINCT FROM is
    * the null-safe comparison projected as a BOOLEAN column.
    */
  private def nullScalarQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = v10Chains
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val isCols = cols.filter(c => c.kind == 'i' || c.kind == 's')
    val nc = isCols(rnd.nextInt(isCols.length))
    val nl = nc.lits(rnd.nextInt(nc.lits.length))
    val dc = isCols(rnd.nextInt(isCols.length))
    val dl = dc.lits(rnd.nextInt(dc.lits.length))
    val raw = rnd.shuffle(cols.toVector).take(1 + rnd.nextInt(2))
      .zipWithIndex.map { case (c, i) => Item(s"c$i", c.name, col(c.name)) }
    val items = raw ++ Seq(
      Item("nx", s"nullif(${nc.name}, ${nl.sql})", nullif(col(nc.name), nl.col)),
      Item("dx", s"(${dc.name} IS DISTINCT FROM ${dl.sql})",
        !(col(dc.name) <=> dl.col)))

    val sb = new StringBuilder("SELECT ")
    sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM ${chain.tables.head}"
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    sb ++= " ORDER BY " +
      items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
    sb ++= " LIMIT 1000"

    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      j.select(items.map(i => i.col.as(i.alias)): _*)
        .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
        .limit(1000)
    }
    GenQuery(seed, sb.result(), build, mode = "nullscalar")
  }

  /** v17 dedicated NULL-semantics mode over the nullable derived view:
    * the predicate families whose three-valued logic only shows up on
    * genuinely-NULL operands. Five shapes:
    *   0  NOT IN — the all-rows-vanish trap: `NULL NOT IN (a, b)` is NULL,
    *      so every NULL row is dropped in both engines (and a NOT IN whose
    *      list CONTAINED a NULL would drop everything — that list shape is
    *      drawn in shape 1 under plain IN, where it is merely weird, not
    *      vacuous);
    *   1  IN with a NULL literal in the list — true on match, NULL (drop)
    *      otherwise; the DF rendering is the expansion `c = a OR c = b OR
    *      c = NULL`, which is exactly IN's defined semantics;
    *   2  IS [NOT] DISTINCT FROM — the null-safe comparison: IS DISTINCT
    *      FROM keeps NULL rows a plain <> would drop, so the survivors
    *      flow into the ORDER BY NULLS placement;
    *   3  IS NULL / IS NOT NULL over a column with real NULLs;
    *   4  NULL-skipping aggregate contrast — count(*) vs count(c) vs
    *      count(DISTINCT c) vs sum/min + max over the partially-NULL
    *      victim, grouped by a non-victim key (or globally on tables
    *      without one).
    * Projection shapes carry the victim itself plus a COALESCE repair, so
    * NULL output values cross the ORDER BY (per-key ASC NULLS FIRST /
    * DESC NULLS LAST draw, explicit in both renderings) and the driver's
    * value canonicalization.
    */
  private def nullPredQuery(seed: Int, rnd: Random, version: Int,
                            chain: Chain, tov: TableOverride,
                            victims: Seq[FCol]): GenQuery = {
    val t = chain.tables.head
    val cols = catalog(t)
    val vc = victims(rnd.nextInt(victims.length))
    val l1 = vc.lits(rnd.nextInt(vc.lits.length))
    val l2 = vc.lits(rnd.nextInt(vc.lits.length))
    val shape = rnd.nextInt(5)
    val extra = if (rnd.nextBoolean()) Some(genPred(rnd, cols, version)) else None

    if (shape == 4) {
      val groupables = cols.filter(c => c.groupable && c.name != vc.name)
      val keyOpt =
        if (groupables.nonEmpty && rnd.nextInt(10) < 8)
          Some(groupables(rnd.nextInt(groupables.length)))
        else None
      val aggItems = Seq(
        Item("n_all", "count(*)", count(lit(1))),
        Item("n_vc", s"count(${vc.name})", count(col(vc.name))),
        Item("n_d", s"count(DISTINCT ${vc.name})", countDistinct(col(vc.name))),
        if (vc.kind == 'i')
          Item("m0", s"CAST(sum(${vc.name}) AS BIGINT)", sum(col(vc.name)))
        else Item("m0", s"min(${vc.name})", min(col(vc.name))),
        Item("m1", s"max(${vc.name})", max(col(vc.name))))
      val keyItems = keyOpt.toSeq.map(c => Item("k0", c.name, col(c.name)))
      val items = keyItems ++ aggItems
      val sb = new StringBuilder("SELECT ")
      sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
      sb ++= s" FROM ${tov.fromDuck}"
      extra.foreach(p => sb ++= s" WHERE ${p.sql}")
      keyOpt.foreach(c => sb ++= s" GROUP BY ${c.name}")
      if (keyItems.nonEmpty) sb ++= " ORDER BY k0 ASC NULLS FIRST"
      val build = (s: SparkSession, d: String) => {
        var df = tov.load(s, d)
        extra.foreach(p => df = df.where(p.col))
        val aggCols = aggItems.map(i => i.col.as(i.alias))
        val out = keyOpt match {
          case Some(c) =>
            df.groupBy(col(c.name).as("k0"))
              .agg(aggCols.head, aggCols.tail: _*)
              .orderBy(col("k0").asc_nulls_first)
          case None => df.agg(aggCols.head, aggCols.tail: _*)
        }
        out
      }
      GenQuery(seed, sb.result(), build, mode = "nullfz:agg")
    } else {
      val (pSql, pCol, tag) = shape match {
        case 0 =>
          (s"${vc.name} NOT IN (${l1.sql}, ${l2.sql})",
            !col(vc.name).isin(l1.col, l2.col), "nullfz:notin")
        case 1 =>
          (s"${vc.name} IN (${l1.sql}, ${l2.sql}, NULL)",
            col(vc.name) === l1.col || col(vc.name) === l2.col ||
              col(vc.name) === lit(null), "nullfz:innull")
        case 2 =>
          if (rnd.nextBoolean())
            (s"${vc.name} IS DISTINCT FROM ${l1.sql}",
              !(col(vc.name) <=> l1.col), "nullfz:distinct")
          else
            (s"${vc.name} IS NOT DISTINCT FROM ${l1.sql}",
              col(vc.name) <=> l1.col, "nullfz:distinct")
        case _ =>
          if (rnd.nextBoolean())
            (s"${vc.name} IS NULL", col(vc.name).isNull, "nullfz:isnull")
          else
            (s"${vc.name} IS NOT NULL", col(vc.name).isNotNull, "nullfz:isnull")
      }
      val raw = rnd.shuffle(cols.filterNot(_.name == vc.name).toVector)
        .take(1 + rnd.nextInt(2)).zipWithIndex
        .map { case (c, i) => Item(s"c$i", c.name, col(c.name)) }
      val items = raw ++ Seq(
        Item("v0", vc.name, col(vc.name)),
        Item("cx", s"COALESCE(${vc.name}, ${l1.sql})",
          coalesce(col(vc.name), l1.col)))
      val orderAsc = items.map(_ => rnd.nextBoolean())
      val whereSql = (extra.map(_.sql).toSeq :+ pSql).mkString(" AND ")
      val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
        s" FROM ${tov.fromDuck} WHERE $whereSql" +
        " ORDER BY " + items.zip(orderAsc).map {
          case (i, true)  => s"${i.alias} ASC NULLS FIRST"
          case (i, false) => s"${i.alias} DESC NULLS LAST"
        }.mkString(", ") +
        " LIMIT 1000"
      val build = (s: SparkSession, d: String) => {
        var df = tov.load(s, d)
        extra.foreach(p => df = df.where(p.col))
        df.where(pCol)
          .select(items.map(i => i.col.as(i.alias)): _*)
          .orderBy(items.zip(orderAsc).map {
            case (i, true)  => col(i.alias).asc_nulls_first
            case (i, false) => col(i.alias).desc_nulls_last
          }: _*)
          .limit(1000)
      }
      GenQuery(seed, sql, build, mode = tag)
    }
  }

  /** v18 subquery-membership mode under NULL poisoning: `fk [NOT] IN
    * (SELECT v FROM dim [WHERE …])` where v is the dim PK with 1-in-m
    * values replaced by NULL. NOT IN against a subquery CONTAINING a NULL
    * is never true — every fact row vanishes in both engines — and
    * against a NULL-free subquery it is the plain anti-membership; which
    * of the two a seed lands on depends on the dim predicate draw, and
    * the differential holds either way. The DataFrame rendering is the
    * decorrelated three-valued plan (the same shape Spark's own NOT IN
    * rewrite produces): LEFT ANTI on [[notInAntiCond]]'s
    * `fk = v OR (fk = v) IS NULL` — a NULL fk matches any subquery row
    * (unknown ⇒ dropped), a NULL v matches every fact row
    * (list-with-NULL ⇒ nothing survives), and an EMPTY subquery keeps all
    * rows, NULL fk included (SQL defines [NOT] IN over zero comparisons
    * as FALSE/TRUE regardless of operand); the NAAJ-matching shape plans
    * as a linear null-aware hash join, except the frozen
    * [[expandedNotInContrastSeeds]] contrast which keeps the expanded
    * BNLJ form. Plain IN is the LEFT SEMI on `fk = v` (unknown and false
    * both filter).
    */
  private def notInSubqQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val (factT, fk, dimT, pk) = njoinEdges(rnd.nextInt(njoinEdges.length))
    val fCols = catalog(factT)
    val m = 5 + rnd.nextInt(5)
    val r = rnd.nextInt(m)
    val vSql = s"CASE WHEN ($pk % $m) = $r THEN NULL ELSE $pk END"
    val vCol = when((col(pk) % m) === r, lit(null)).otherwise(col(pk)).as("_v")
    val dimPred = if (rnd.nextBoolean()) Some(genPred(rnd, catalog(dimT), version)) else None
    val factPred = if (rnd.nextBoolean()) Some(genPred(rnd, fCols, version)) else None
    val negated = rnd.nextInt(10) < 6
    val picked = rnd.shuffle(fCols.filterNot(_.name == fk).toVector)
      .take(1 + rnd.nextInt(2))
    val items = picked.zipWithIndex.map { case (c, i) =>
      Item(s"c$i", c.name, col(c.name))
    } :+ Item("v0", fk, col(fk))
    val orderAsc = items.map(_ => rnd.nextBoolean())

    val subSql = s"SELECT $vSql FROM $dimT" +
      dimPred.map(p => s" WHERE ${p.sql}").getOrElse("")
    val inSql = s"$fk ${if (negated) "NOT IN" else "IN"} ($subSql)"
    val whereSql = (factPred.map(_.sql).toSeq :+ inSql).mkString(" AND ")
    val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
      s" FROM $factT WHERE $whereSql" +
      " ORDER BY " + items.zip(orderAsc).map {
        case (i, true)  => s"${i.alias} ASC NULLS FIRST"
        case (i, false) => s"${i.alias} DESC NULLS LAST"
      }.mkString(", ") +
      " LIMIT 1000"

    val build = (s: SparkSession, d: String) => {
      var sub = loadFuzzTable(s, d, dimT)
      dimPred.foreach(p => sub = sub.where(p.col))
      val subV = sub.select(vCol)
      var fact = loadFuzzTable(s, d, factT)
      factPred.foreach(p => fact = fact.where(p.col))
      val joined =
        if (negated) {
          val cond =
            if (expandedNotInContrastSeeds(seed))
              col(fk) === col("_v") || col(fk).isNull || col("_v").isNull
            else notInAntiCond(col(fk), col("_v"))
          fact.join(subV, cond, "left_anti")
        } else fact.join(subV, col(fk) === col("_v"), "left_semi")
      joined.select(items.map(i => i.col.as(i.alias)): _*)
        .orderBy(items.zip(orderAsc).map {
          case (i, true)  => col(i.alias).asc_nulls_first
          case (i, false) => col(i.alias).desc_nulls_last
        }: _*)
        .limit(1000)
    }
    GenQuery(seed, sql, build,
      mode = if (negated) "nsubq:notin" else "nsubq:in")
  }

  /** v20 dedicated mode: ROLLUP/CUBE where a group key is NULL-INJECTED —
    * the collision of the two NULL species. For `ROLLUP(k)` over a key
    * with real NULLs the output contains BOTH (k=NULL, GROUPING(k)=0)
    * — the genuine NULL group, aggregating the injected rows — and
    * (k=NULL, GROUPING(k)=1) — the grand total; only the flag separates
    * them, and the ORDER BY (flags, keys) prefix stays total exactly
    * because the flag column precedes the key. Carries v11's
    * `HAVING count(*) > 0` guard (the empty-input grand-total divergence)
    * and genAgg's cross-engine-exact aggregate rules; aggregates may draw
    * the victim itself, exercising NULL-skipping sums inside the NULL
    * group. Single-key ROLLUP when the drawn table has one groupable
    * non-key column (supplier); two-key ROLLUP/CUBE otherwise, with the
    * victim always first.
    */
  private def rollupNullQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val t = nullablePool(rnd.nextInt(nullablePool.length))
    val key = uniqueKeys(t).head
    val groupables = catalog(t).filter(c => c.groupable && c.name != key)
    val victim = groupables(rnd.nextInt(groupables.length))
    val rest = groupables.filterNot(_.name == victim.name)
    val second: Option[FCol] =
      if (rest.nonEmpty && rnd.nextBoolean()) Some(rest(rnd.nextInt(rest.length)))
      else None
    val m = 5 + rnd.nextInt(5)
    val r = rnd.nextInt(m)
    val colSqls = catalog(t).map { c =>
      if (c.name == victim.name)
        s"CASE WHEN ($key % $m) = $r THEN NULL ELSE ${c.name} END AS ${c.name}"
      else c.name
    }
    val frag = s"(SELECT ${colSqls.mkString(", ")} FROM $t) $t"
    val load = (s: SparkSession, d: String) =>
      loadFuzzTable(s, d, t).select(catalog(t).map { c =>
        if (c.name == victim.name)
          when((col(key) % m) === r, lit(null)).otherwise(col(c.name)).as(c.name)
        else col(c.name)
      }: _*)

    val keys = victim +: second.toSeq
    val isCube = second.isDefined && rnd.nextBoolean()
    val op = if (isCube) "CUBE" else "ROLLUP"
    val pred = if (rnd.nextBoolean()) Some(genPred(rnd, catalog(t), version)) else None
    val aggs = (0 until 1 + rnd.nextInt(2))
      .map(i => genAgg(rnd, catalog(t), s"a$i", version))

    val flagItems = keys.zipWithIndex.map { case (c, i) =>
      Item(s"g$i", s"CAST(grouping(${c.name}) AS BIGINT)",
        grouping(col(c.name)).cast("long"))
    }
    val keyItems = keys.zipWithIndex.map { case (c, i) =>
      Item(s"k$i", c.name, col(c.name))
    }
    val items = flagItems ++ keyItems ++ aggs

    val sb = new StringBuilder("SELECT ")
    sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM $frag"
    pred.foreach(p => sb ++= s" WHERE ${p.sql}")
    sb ++= s" GROUP BY $op (${keys.map(_.name).mkString(", ")})"
    sb ++= " HAVING count(*) > 0"
    sb ++= " ORDER BY " + (flagItems ++ keyItems)
      .map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")

    val build = (s: SparkSession, d: String) => {
      var df = load(s, d)
      pred.foreach(p => df = df.where(p.col))
      val gb =
        if (isCube) df.cube(keys.map(c => col(c.name)): _*)
        else df.rollup(keys.map(c => col(c.name)): _*)
      val aggCols = (flagItems ++ aggs).map(i => i.col.as(i.alias)) :+
        count(lit(1)).as("_hv")
      gb.agg(aggCols.head, aggCols.tail: _*)
        .where(col("_hv") > 0)
        .select(items.map(i =>
          (if (i.alias.startsWith("k"))
            col(keys(i.alias.drop(1).toInt).name)
          else col(i.alias)).as(i.alias)): _*)
        .orderBy((flagItems ++ keyItems).map(i => col(i.alias).asc_nulls_first): _*)
    }
    GenQuery(seed, sb.result(), build,
      mode = s"nrollup:${op.toLowerCase}:${keys.length}key")
  }

  /** v24 dedicated mode: TWO-SIDED NULL-injection — BOTH the fact FK and
    * the dim PK carry injected NULLs. v18 injects the fact side only; the
    * dim-PK victims are the remaining three-valued blind corner (r12
    * verdict item #5): an injected dim PK makes 1-in-m2 dim rows
    * unreachable under `=` — their fact children go ORPHAN (dropped by
    * INNER, NULL-extended by LEFT) — while a NULL fk still matches
    * nothing, and NULL never meets NULL. Optionally one more victim on
    * EACH side: a fact value column (the NULL-injected AGGREGATE INPUT)
    * and a dim payload column (so a group key can be NULL for two — under
    * LEFT, three — different reasons: injected payload, LEFT-miss
    * extension, and the ROLLUP super-aggregate, the last disambiguated by
    * GROUPING()). Three consuming shapes over the dual-injected join:
    *   0 ROLLUP over a dim group key with the GROUPING() flag (v20
    *     discipline: flag precedes key in the ORDER BY, `HAVING
    *     count(*) > 0` guards the empty-input grand total), aggregates
    *     via genAgg over BOTH sides' columns — the grouping-set ×
    *     NULL-injected-input composition;
    *   1 window composition — partition by the (NULL-bearing) dim
    *     payload, order by the fact head key (unique, never injected),
    *     function over the possibly-injected fact int column; window sum
    *     rendered `CAST(sum(…) OVER … AS BIGINT)` (DuckDB windows
    *     sum(INTEGER) as HUGEINT — the q12 bug class, pre-empted);
    *   2 projection of both sides' nullable columns plus the
    *     orphan-classifier `CASE WHEN fk IS NULL … WHEN pk IS NULL …`
    *     through the total ORDER BY.
    * Both fragments are plain CASE derived tables — ONE shared SQL text.
    */
  private def dualNullQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val (factT, fk, dimT, pk) = njoinEdges(rnd.nextInt(njoinEdges.length))
    val factKey = uniqueKeys(factT).head
    val m1 = 5 + rnd.nextInt(5); val r1 = rnd.nextInt(m1)
    val factExtra: Option[String] =
      if (rnd.nextBoolean()) {
        val cands = catalog(factT).map(_.name)
          .filterNot(n => n == factKey || n == fk)
        Some(cands(rnd.nextInt(cands.length)))
      } else None
    val factVictims = Set(fk) ++ factExtra
    val m2 = 5 + rnd.nextInt(5); val r2 = rnd.nextInt(m2)
    val dimExtra: Option[String] =
      if (rnd.nextBoolean()) {
        val cands = catalog(dimT).map(_.name).filterNot(_ == pk)
        Some(cands(rnd.nextInt(cands.length)))
      } else None
    val dimVictims = Set(pk) ++ dimExtra

    def frag(t: String, driver: String, victims: Set[String],
             m: Int, r: Int): String =
      s"(SELECT " + catalog(t).map { c =>
        if (victims(c.name))
          s"CASE WHEN ($driver % $m) = $r THEN NULL ELSE ${c.name} END AS ${c.name}"
        else c.name
      }.mkString(", ") + s" FROM $t) $t"
    def loadInj(s: SparkSession, d: String, t: String, driver: String,
                victims: Set[String], m: Int, r: Int): DataFrame =
      loadFuzzTable(s, d, t).select(catalog(t).map { c =>
        if (victims(c.name))
          when((col(driver) % m) === r, lit(null)).otherwise(col(c.name))
            .as(c.name)
        else col(c.name)
      }: _*)

    val leftJoin = rnd.nextBoolean()
    val joinSql = (if (leftJoin) "LEFT JOIN " else "JOIN ") +
      frag(dimT, pk, dimVictims, m2, r2) + s" ON ($fk = $pk)"
    val fromSql = "FROM " + frag(factT, factKey, factVictims, m1, r1) +
      s" $joinSql"
    val allCols = catalog(factT) ++ catalog(dimT)
    val pred = if (rnd.nextBoolean()) Some(genPred(rnd, allCols, version)) else None
    def joined(s: SparkSession, d: String): DataFrame = {
      var j = loadInj(s, d, factT, factKey, factVictims, m1, r1)
        .join(loadInj(s, d, dimT, pk, dimVictims, m2, r2),
          col(fk) === col(pk), if (leftJoin) "left" else "inner")
      pred.foreach(p => j = j.where(p.col))
      j
    }
    val whereSql = pred.map(p => s" WHERE ${p.sql}").getOrElse("")
    val kindTag = if (leftJoin) "left" else "inner"

    rnd.nextInt(3) match {
      case 0 => // ROLLUP over a dim group key, genAgg over both sides
        val groupables = catalog(dimT).filter(c => c.groupable && c.name != pk)
        val gkey = groupables(rnd.nextInt(groupables.length))
        val aggs = (0 until 1 + rnd.nextInt(2))
          .map(i => genAgg(rnd, allCols, s"a$i", version))
        val flagItem = Item("g0", s"CAST(grouping(${gkey.name}) AS BIGINT)",
          grouping(col(gkey.name)).cast("long"))
        val keyItem = Item("k0", gkey.name, col(gkey.name))
        val items = Seq(flagItem, keyItem) ++ aggs
        val sql = "SELECT " +
          items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ") +
          s" $fromSql$whereSql GROUP BY ROLLUP (${gkey.name})" +
          " HAVING count(*) > 0" +
          " ORDER BY g0 ASC NULLS FIRST, k0 ASC NULLS FIRST"
        val build = (s: SparkSession, d: String) => {
          val aggCols = (flagItem +: aggs).map(i => i.col.as(i.alias)) :+
            count(lit(1)).as("_hv")
          joined(s, d).rollup(col(gkey.name))
            .agg(aggCols.head, aggCols.tail: _*)
            .where(col("_hv") > 0)
            .select(items.map(i =>
              (if (i.alias == "k0") col(gkey.name) else col(i.alias))
                .as(i.alias)): _*)
            .orderBy(col("g0").asc_nulls_first, col("k0").asc_nulls_first)
        }
        GenQuery(seed, sql, build, mode = s"dualnull:rollup:$kindTag")

      case 1 => // window over the dual-injected join
        val parts = catalog(dimT).filter(c => c.groupable && c.name != pk)
        val part = parts(rnd.nextInt(parts.length))
        val intCands = catalog(factT)
          .filter(c => c.kind == 'i' && c.name != factKey)
        val shape =
          if (intCands.isEmpty) 0
          else rnd.nextInt(3) // 0 row_number, 1 running sum, 2 lag
        val vc = if (intCands.isEmpty) factKey
          else intCands(rnd.nextInt(intCands.length)).name
        val overSql = s"PARTITION BY ${part.name} ORDER BY $factKey ASC"
        val w = Window.partitionBy(col(part.name)).orderBy(col(factKey).asc)
        val (wSql, wCol) = shape match {
          case 0 => (s"row_number() OVER ($overSql)",
            row_number().over(w).cast("long"))
          case 1 => (s"CAST(sum($vc) OVER ($overSql" +
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
            sum(col(vc)).over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)).cast("long"))
          case _ => (s"lag($vc) OVER ($overSql)", lag(col(vc), 1).over(w))
        }
        val items = Seq(Item("u0", factKey, col(factKey)),
          Item("p0", part.name, col(part.name)), Item("w0", wSql, wCol))
        val sql = "SELECT " +
          items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ") +
          s" $fromSql$whereSql" +
          " ORDER BY u0 ASC NULLS FIRST LIMIT 1000"
        val build = (s: SparkSession, d: String) =>
          joined(s, d).select(items.map(i => i.col.as(i.alias)): _*)
            .orderBy(col("u0").asc_nulls_first).limit(1000)
        GenQuery(seed, sql, build,
          mode = s"dualnull:window$shape:$kindTag")

      case _ => // projection + orphan classifier
        val picked = rnd.shuffle(
          (catalog(factT).filterNot(_.name == factKey) ++
            catalog(dimT)).toVector).take(2)
        val classifier = Item("cx",
          s"CASE WHEN $fk IS NULL THEN 0 WHEN $pk IS NULL THEN 1 ELSE 2 END",
          when(col(fk).isNull, 0).when(col(pk).isNull, 1).otherwise(2))
        val items = Item("u0", factKey, col(factKey)) +:
          picked.zipWithIndex.map { case (c, i) =>
            Item(s"c$i", c.name, col(c.name))
          } :+ classifier
        val sql = "SELECT " +
          items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ") +
          s" $fromSql$whereSql" +
          " ORDER BY u0 ASC NULLS FIRST LIMIT 1000"
        val build = (s: SparkSession, d: String) =>
          joined(s, d).select(items.map(i => i.col.as(i.alias)): _*)
            .orderBy(col("u0").asc_nulls_first).limit(1000)
        GenQuery(seed, sql, build, mode = s"dualnull:proj:$kindTag")
    }
  }

  /** v19 dedicated mode: the four membership quantifiers over a
    * NULL-injected FK — `EXISTS` / `NOT EXISTS` (correlated `pk = fk`;
    * two-valued, so a NULL fk never correlates and NOT EXISTS KEEPS the
    * NULL-key rows) vs `IN` / `NOT IN` (uncorrelated subquery on the
    * clean dim PK; three-valued, so a NULL fk is unknown and BOTH IN and
    * NOT IN drop it). Two consuming shapes: the projection (survivors
    * cross the ORDER BY with explicit NULLS placement — under NOT EXISTS
    * the output genuinely contains NULL fks, under NOT IN it never does)
    * and the count contrast (count(*) vs count(fk) over the survivors —
    * equal exactly when the quantifier dropped the NULL rows). DataFrame
    * renderings are the decorrelated plans Spark's own rewrites produce:
    * LEFT SEMI on `fk = pk` for EXISTS and IN, LEFT ANTI on `fk = pk`
    * for NOT EXISTS, LEFT ANTI on [[notInAntiCond]]'s NAAJ-matching
    * three-valued shape for NOT IN (pk is never NULL on the corpus dims —
    * pinned by the corpus-preconditions test — but the rendering keeps
    * the full three-valued condition so it is correct by construction,
    * not by precondition; it plans as a linear null-aware hash join, not
    * the former BNLJ).
    */
  private def existsNullQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val (factT, fk, dimT, pk) = njoinEdges(rnd.nextInt(njoinEdges.length))
    val key = uniqueKeys(factT).head
    val fCols = catalog(factT)
    val m = 5 + rnd.nextInt(5)
    val r = rnd.nextInt(m)
    val factColSqls = fCols.map { c =>
      if (c.name == fk)
        s"CASE WHEN ($key % $m) = $r THEN NULL ELSE ${c.name} END AS ${c.name}"
      else c.name
    }
    val factFrag = s"(SELECT ${factColSqls.mkString(", ")} FROM $factT) $factT"
    val loadFact = (s: SparkSession, d: String) =>
      loadFuzzTable(s, d, factT).select(fCols.map { c =>
        if (c.name == fk)
          when((col(key) % m) === r, lit(null)).otherwise(col(c.name)).as(c.name)
        else col(c.name)
      }: _*)

    val quant = rnd.nextInt(4) // 0 EXISTS, 1 NOT EXISTS, 2 IN, 3 NOT IN
    val dimPred = if (rnd.nextBoolean()) Some(genPred(rnd, catalog(dimT), version)) else None
    val factPred = if (rnd.nextBoolean()) Some(genPred(rnd, fCols, version)) else None
    val dimWhereTail = dimPred.map(p => s" AND ${p.sql}").getOrElse("")
    val dimWhere = dimPred.map(p => s" WHERE ${p.sql}").getOrElse("")
    val memberSql = quant match {
      case 0 => s"EXISTS (SELECT 1 FROM $dimT WHERE $pk = $fk$dimWhereTail)"
      case 1 => s"NOT EXISTS (SELECT 1 FROM $dimT WHERE $pk = $fk$dimWhereTail)"
      case 2 => s"$fk IN (SELECT $pk FROM $dimT$dimWhere)"
      case _ => s"$fk NOT IN (SELECT $pk FROM $dimT$dimWhere)"
    }
    val whereSql = (factPred.map(_.sql).toSeq :+ memberSql).mkString(" AND ")
    val tag = quant match {
      case 0 => "nexists:exists"
      case 1 => "nexists:notexists"
      case 2 => "nexists:in"
      case _ => "nexists:notin"
    }

    def survivors(s: SparkSession, d: String): DataFrame = {
      var sub = loadFuzzTable(s, d, dimT)
      dimPred.foreach(p => sub = sub.where(p.col))
      val subV = sub.select(col(pk).as("_v"))
      var fact = loadFact(s, d)
      factPred.foreach(p => fact = fact.where(p.col))
      quant match {
        case 0 | 2 => fact.join(subV, col(fk) === col("_v"), "left_semi")
        case 1     => fact.join(subV, col(fk) === col("_v"), "left_anti")
        case _ =>
          val cond =
            if (expandedNotInContrastSeeds(seed))
              col(fk) === col("_v") || col(fk).isNull || col("_v").isNull
            else notInAntiCond(col(fk), col("_v"))
          fact.join(subV, cond, "left_anti")
      }
    }

    if (rnd.nextInt(10) < 3) {
      // count-contrast shape: count(*) == count(fk) exactly when the
      // quantifier dropped the NULL-key rows
      val sql = s"SELECT count(*) AS n_all, CAST(count($fk) AS BIGINT) AS n_fk" +
        s" FROM $factFrag WHERE $whereSql"
      val build = (s: SparkSession, d: String) =>
        survivors(s, d).agg(count(lit(1)).as("n_all"),
          count(col(fk)).as("n_fk"))
      GenQuery(seed, sql, build, mode = s"$tag:agg")
    } else {
      val picked = rnd.shuffle(fCols.filterNot(_.name == fk).toVector)
        .take(1 + rnd.nextInt(2))
      val items = picked.zipWithIndex.map { case (c, i) =>
        Item(s"c$i", c.name, col(c.name))
      } :+ Item("v0", fk, col(fk))
      val orderAsc = items.map(_ => rnd.nextBoolean())
      val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
        s" FROM $factFrag WHERE $whereSql" +
        " ORDER BY " + items.zip(orderAsc).map {
          case (i, true)  => s"${i.alias} ASC NULLS FIRST"
          case (i, false) => s"${i.alias} DESC NULLS LAST"
        }.mkString(", ") +
        " LIMIT 1000"
      val build = (s: SparkSession, d: String) =>
        survivors(s, d).select(items.map(i => i.col.as(i.alias)): _*)
          .orderBy(items.zip(orderAsc).map {
            case (i, true)  => col(i.alias).asc_nulls_first
            case (i, false) => col(i.alias).desc_nulls_last
          }: _*)
          .limit(1000)
      GenQuery(seed, sql, build, mode = tag)
    }
  }

  /** v18 null-safe join mode: fact FK and dim PK BOTH 1-in-m NULL-injected,
    * joined ON `fk IS NOT DISTINCT FROM pkx` — NULL meets NULL, so the
    * matched relation contains the (nullFacts × nullDims) cross block that
    * a plain `=` join annihilates. Both engines must still plan it as an
    * equi hash join (Spark extracts EqualNullSafe join keys via the
    * coalesce-wrap; a nested loop here would be a scale bug — FuzzSpec
    * pins the plan class). Cardinality: dims are restricted to nation
    * (25 rows ⇒ ≤5 NULL PKs), so the cross block is ≤ 5 × facts/5 — same
    * order as the fact table itself at every sf. Consumed aggregated:
    * globally, or grouped by the dim payload / the nullable key itself
    * (one NULL group in both engines).
    */
  private def nullSafeJoinQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val edges = Vector(
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey"))
    val (factT, fk, dimT, pk) = edges(rnd.nextInt(edges.length))
    val key = uniqueKeys(factT).head
    val mF = 5 + rnd.nextInt(5)
    val rF = rnd.nextInt(mF)
    val mD = 5 + rnd.nextInt(5)
    val rD = rnd.nextInt(mD)
    val fCols = catalog(factT)
    val dCols = catalog(dimT)

    val factColSqls = fCols.map { c =>
      if (c.name == fk)
        s"CASE WHEN ($key % $mF) = $rF THEN NULL ELSE ${c.name} END AS ${c.name}"
      else c.name
    }
    val factFrag = s"(SELECT ${factColSqls.mkString(", ")} FROM $factT) $factT"
    val payload = dCols.filterNot(_.name == pk) match {
      case Seq() => dCols.head
      case rest  => rest(rnd.nextInt(rest.length))
    }
    val dimFrag = s"(SELECT CASE WHEN ($pk % $mD) = $rD THEN NULL ELSE $pk END" +
      s" AS pkx, ${payload.name} FROM $dimT) dimx"
    val loadFact = (s: SparkSession, d: String) =>
      loadFuzzTable(s, d, factT).select(fCols.map { c =>
        if (c.name == fk)
          when((col(key) % mF) === rF, lit(null)).otherwise(col(c.name)).as(c.name)
        else col(c.name)
      }: _*)
    val loadDim = (s: SparkSession, d: String) =>
      loadFuzzTable(s, d, dimT).select(
        when((col(pk) % mD) === rD, lit(null)).otherwise(col(pk)).as("pkx"),
        col(payload.name))

    val intCols = fCols.filter(_.kind == 'i')
    val sumC = intCols(rnd.nextInt(intCols.length))
    val aggItems = Seq(
      Item("n_all", "count(*)", count(lit(1))),
      Item("n_pk", "CAST(count(pkx) AS BIGINT)", count(col("pkx"))),
      Item("a0", s"CAST(sum(${sumC.name}) AS BIGINT)", sum(col(sumC.name))),
      Item("a1", s"max(${payload.name})", max(col(payload.name))))
    // group key: the dim payload, the nullable join key itself, or global
    val keyOpt: Option[(String, Column)] = rnd.nextInt(3) match {
      case 0 => Some(payload.name -> col(payload.name))
      case 1 => Some(fk -> col(fk))
      case _ => None
    }
    val keyItems = keyOpt.toSeq.map { case (n, c) => Item("k0", n, c) }
    val items = keyItems ++ aggItems
    val onSql = s"$fk IS NOT DISTINCT FROM pkx"

    val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
      s" FROM $factFrag JOIN $dimFrag ON ($onSql)" +
      keyOpt.map { case (n, _) => s" GROUP BY $n" }.getOrElse("") +
      (if (keyItems.nonEmpty) " ORDER BY k0 ASC NULLS FIRST" else "")

    val build = (s: SparkSession, d: String) => {
      val j = loadFact(s, d).join(loadDim(s, d), col(fk) <=> col("pkx"), "inner")
      val aggCols = aggItems.map(i => i.col.as(i.alias))
      keyOpt match {
        case Some((_, c)) =>
          j.groupBy(c.as("k0")).agg(aggCols.head, aggCols.tail: _*)
            .orderBy(col("k0").asc_nulls_first)
        case None => j.agg(aggCols.head, aggCols.tail: _*)
      }
    }
    GenQuery(seed, sql, build,
      mode = if (keyOpt.isDefined) "nsafe:group" else "nsafe:global")
  }

  /** v21 RANGE-valued window frames — see the class doc. The order column
    * is drawn from the HEAD table only: head columns survive LEFT joins
    * non-NULL, keeping the null-peer-group frame semantics deliberately
    * out of scope (v17/v18 own NULL windows). lineitem-headed chains are
    * allowed — uniquely among order-sensitive modes — because a range
    * frame assigns each row a result independent of peer order: the
    * corpus's duplicate (l_orderkey, l_linenumber) pairs yield identical
    * output rows, which the sorted compare cannot distinguish.
    */
  private def rangeWindowQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = chains :+ eventsChain :+ documentsChain :+ eventsCustomerChain
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val uk = headOrderCols(chain.tables.head)
    val groupables = cols.filter(_.groupable)
    val g = groupables(rnd.nextInt(groupables.length))
    // Order column: a head-table integer, never the partition key itself
    // (region-headed draws may leave nothing else — there the degenerate
    // order-by-the-partition-key is legal and still deterministic: all
    // rows of a partition are peers, so every frame is the whole set).
    val headIntsAll = catalog(chain.tables.head).filter(_.kind == 'i')
    val headIntsPref = headIntsAll.filterNot(_.name == g.name)
    val headInts = if (headIntsPref.nonEmpty) headIntsPref else headIntsAll
    val o = headInts(rnd.nextInt(headInts.length))
    val desc = rnd.nextInt(4) == 0
    // Value offsets span the corpus key ranges: small ones leave most
    // frames at just the peer group (value gaps >> offset — the sharpest
    // RANGE-vs-ROWS contrast), large ones pull real neighbors in.
    val offsets = Vector(1, 2, 3, 5, 10, 100, 1000, 20000)
    val kPre = offsets(rnd.nextInt(offsets.length))
    val kFol = offsets(rnd.nextInt(offsets.length))
    val frameDraw = rnd.nextInt(4)
    val frameSql = frameDraw match {
      case 0 => s" RANGE BETWEEN $kPre PRECEDING AND CURRENT ROW"
      case 1 => s" RANGE BETWEEN $kPre PRECEDING AND $kFol FOLLOWING"
      case 2 => s" RANGE BETWEEN CURRENT ROW AND $kFol FOLLOWING"
      case _ => "" // the implicit SQL-standard default frame
    }
    val ordSql =
      if (desc) s"${o.name} DESC NULLS LAST" else s"${o.name} ASC NULLS FIRST"
    def base = Window.partitionBy(col(g.name)).orderBy(
      if (desc) col(o.name).desc_nulls_last else col(o.name).asc_nulls_first)
    def w = frameDraw match {
      case 0 => base.rangeBetween(-kPre, 0)
      case 1 => base.rangeBetween(-kPre, kFol)
      case 2 => base.rangeBetween(0, kFol)
      // the DF side spells the standard's implicit frame explicitly — the
      // differential pins that the SQL side's bare ORDER BY means this
      case _ => base.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val intCols = cols.filter(_.kind == 'i')
    val sumCol = intCols(rnd.nextInt(intCols.length))
    val anyCol = cols(rnd.nextInt(cols.length))
    val over = s" OVER (PARTITION BY ${g.name} ORDER BY $ordSql$frameSql)"
    val (wSql, wCol) = rnd.nextInt(4) match {
      case 0 => // CAST for the same HUGEINT reason as genAgg's sum
        (s"CAST(sum(${sumCol.name})$over AS BIGINT)",
          sum(col(sumCol.name)).over(w))
      case 1 => (s"min(${anyCol.name})$over", min(col(anyCol.name)).over(w))
      case 2 => (s"max(${anyCol.name})$over", max(col(anyCol.name)).over(w))
      case _ => (s"count(${anyCol.name})$over", count(col(anyCol.name)).over(w))
    }
    val items =
      uk.zipWithIndex.map { case (kc, i) => Item(s"u$i", kc, col(kc)) } ++
        Seq(Item("k0", g.name, col(g.name)), Item("o0", o.name, col(o.name)),
          Item("w0", wSql, wCol))

    val sb = new StringBuilder("SELECT ")
    sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
    sb ++= s" FROM ${chain.tables.head}"
    chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
      val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
      sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
    }
    if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    sb ++= " ORDER BY " +
      items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
    sb ++= " LIMIT 1000"

    val build = (s: SparkSession, d: String) => {
      val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      j.select(items.map(i => i.col.as(i.alias)): _*)
        .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
        .limit(1000)
    }
    val shape = frameDraw match {
      case 0 => "pre"
      case 1 => "both"
      case 2 => "fol"
      case _ => "default"
    }
    GenQuery(seed, sb.result(), build,
      mode = s"range:$shape${if (desc) ":desc" else ""}:${chain.tables.head}")
  }

  /** v22 temporal semantics — see the class doc. Every shape computes from
    * the HEAD table's timestamp column (non-NULL under LEFT joins). The
    * portability rules the probe established, pinned by every seed:
    * date_trunc must be CAST AS TIMESTAMP in the shared SQL (DuckDB
    * returns DATE for day-and-coarser units, Spark always TIMESTAMP);
    * EXTRACT must be CAST AS BIGINT (DuckDB BIGINT vs Spark INT); the
    * unquoted `INTERVAL k unit` literal parses in both dialects; and
    * month arithmetic clamps identically (Jan 31 + 1 MONTH = Feb 29).
    */
  private def temporalQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = (chains :+ eventsChain :+ eventsCustomerChain)
      .filter(c => catalog(c.tables.head).exists(_.kind == 't'))
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val tc = catalog(chain.tables.head).filter(_.kind == 't').head
    val t = tc.name
    val uk = headOrderCols(chain.tables.head)
    val headUnique = uniqueKeys.contains(chain.tables.head)
    val groupables = cols.filter(_.groupable)
    val intCols = cols.filter(_.kind == 'i')

    def joinTail(sb: StringBuilder): Unit = {
      sb ++= s" FROM ${chain.tables.head}"
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
        sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
      }
      if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    }
    def joined(s: SparkSession, d: String): org.apache.spark.sql.DataFrame = {
      val dfs = chain.tables.map(tb => loadFuzzTable(s, d, tb))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      j
    }
    def extractCol(part: String): Column = (part match {
      case "YEAR"  => year(col(t))
      case "MONTH" => month(col(t))
      case "DAY"   => dayofmonth(col(t))
      case "HOUR"  => hour(col(t))
      case _       => minute(col(t))
    }).cast("long")

    rnd.nextInt(4) match {
      case 0 => // calendar-bucket GROUP BY: date_trunc as the group key
        val unit = Vector("year", "quarter", "month", "week", "day",
          "hour")(rnd.nextInt(6))
        val keySql = s"CAST(date_trunc('$unit', $t) AS TIMESTAMP)"
        val keyCol = date_trunc(unit, col(t)).cast("timestamp")
        val g2: Option[FCol] =
          if (rnd.nextInt(3) == 0) Some(groupables(rnd.nextInt(groupables.length)))
          else None
        val aggs = (0 until 1 + rnd.nextInt(2))
          .map(i => genAgg(rnd, cols, s"a$i", version))
        val keyItems = Item("k0", keySql, keyCol) +:
          g2.map(c => Item("k1", c.name, col(c.name))).toSeq
        val items = keyItems ++ aggs
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        joinTail(sb)
        sb ++= s" GROUP BY $keySql" + g2.map(c => s", ${c.name}").getOrElse("")
        sb ++= " ORDER BY " +
          keyItems.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
        val build = (s: SparkSession, d: String) => {
          val gCols = keyCol.as("k0") +: g2.map(c => col(c.name).as("k1")).toSeq
          val aggCols = aggs.map(i => i.col.as(i.alias))
          joined(s, d).groupBy(gCols: _*)
            .agg(aggCols.head, aggCols.tail: _*)
            .orderBy(keyItems.map(i => col(i.alias).asc_nulls_first): _*)
        }
        GenQuery(seed, sb.result(), build,
          mode = s"temporal:trunc:$unit:${chain.tables.head}")

      case 1 => // EXTRACT projections: a drawn field + the YYYYMM bucket,
        // optionally filtered on a day-of-month band (valid for every head)
        val part = Vector("YEAR", "MONTH", "DAY", "HOUR",
          "MINUTE")(rnd.nextInt(5))
        val e0Sql = s"CAST(EXTRACT($part FROM $t) AS BIGINT)"
        val e1Sql = s"CAST(EXTRACT(YEAR FROM $t) AS BIGINT) * 100 + " +
          s"CAST(EXTRACT(MONTH FROM $t) AS BIGINT)"
        val e1Col = year(col(t)).cast("long") * 100 + month(col(t)).cast("long")
        val dayPred = rnd.nextInt(3) match {
          case 0 => None
          case _ =>
            val a = 1 + rnd.nextInt(15)
            val b = a + 1 + rnd.nextInt(14)
            Some((s"CAST(EXTRACT(DAY FROM $t) AS BIGINT) BETWEEN $a AND $b",
              dayofmonth(col(t)).cast("long").between(a, b)))
        }
        val items =
          uk.zipWithIndex.map { case (kc, i) => Item(s"u$i", kc, col(kc)) } ++
            Seq(Item("e0", e0Sql, extractCol(part)), Item("e1", e1Sql, e1Col))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        joinTail(sb)
        dayPred.foreach { case (psql, _) =>
          sb ++= (if (preds.nonEmpty) s" AND $psql" else s" WHERE $psql")
        }
        sb ++= " ORDER BY " +
          items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
        sb ++= " LIMIT 1000"
        val build = (s: SparkSession, d: String) => {
          var j = joined(s, d)
          dayPred.foreach { case (_, pcol) => j = j.where(pcol) }
          j.select(items.map(i => i.col.as(i.alias)): _*)
            .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
            .limit(1000)
        }
        GenQuery(seed, sb.result(), build,
          mode = s"temporal:extract:${chain.tables.head}")

      case 2 => // ± INTERVAL shift, optionally under a shifted comparison
        val k = 1 + rnd.nextInt(30)
        val u2 = Vector("DAY", "HOUR", "MONTH")(rnd.nextInt(3))
        val minus = rnd.nextBoolean()
        val op = if (minus) "-" else "+"
        val shiftSql = s"$t $op INTERVAL $k $u2"
        val iv = expr(s"INTERVAL $k $u2")
        val shiftCol = if (minus) col(t) - iv else col(t) + iv
        val shiftPred: Option[(String, Column)] = rnd.nextInt(3) match {
          case 0 => None
          case 1 =>
            val cmp = Vector("<", "<=", ">", ">=")(rnd.nextInt(4))
            val l = tc.lits(rnd.nextInt(tc.lits.length))
            Some((s"$shiftSql $cmp ${l.sql}", cmp match {
              case "<"  => shiftCol < l.col
              case "<=" => shiftCol <= l.col
              case ">"  => shiftCol > l.col
              case _    => shiftCol >= l.col
            }))
          case _ =>
            val i1 = rnd.nextInt(tc.lits.length - 1)
            val (lo, hi) = (tc.lits(i1), tc.lits(i1 + 1 + rnd.nextInt(tc.lits.length - i1 - 1)))
            Some((s"$shiftSql BETWEEN ${lo.sql} AND ${hi.sql}",
              shiftCol.between(lo.col, hi.col)))
        }
        val items =
          uk.zipWithIndex.map { case (kc, i) => Item(s"u$i", kc, col(kc)) } ++
            Seq(Item("t0", t, col(t)), Item("s0", shiftSql, shiftCol))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        joinTail(sb)
        shiftPred.foreach { case (psql, _) =>
          sb ++= (if (preds.nonEmpty) s" AND $psql" else s" WHERE $psql")
        }
        sb ++= " ORDER BY " +
          items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
        sb ++= " LIMIT 1000"
        val build = (s: SparkSession, d: String) => {
          var j = joined(s, d)
          shiftPred.foreach { case (_, pcol) => j = j.where(pcol) }
          j.select(items.map(i => i.col.as(i.alias)): _*)
            .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
            .limit(1000)
        }
        GenQuery(seed, sb.result(), build,
          mode = s"temporal:shift${if (minus) ":minus" else ""}:${chain.tables.head}")

      case _ => // window PARTITIONED BY the calendar bucket
        val unit = Vector("year", "quarter", "month", "week",
          "day")(rnd.nextInt(5))
        val partSql = s"CAST(date_trunc('$unit', $t) AS TIMESTAMP)"
        val partCol = date_trunc(unit, col(t)).cast("timestamp")
        val anyCol = cols(rnd.nextInt(cols.length))
        val sumCol = intCols(rnd.nextInt(intCols.length))
        val ukOrderSql = uk.map(kc => s"$kc ASC NULLS FIRST").mkString(", ")
        def ukW = Window.partitionBy(partCol)
          .orderBy(uk.map(col(_).asc_nulls_first): _*)
        def valW = Window.partitionBy(partCol)
          .orderBy(col(anyCol.name).asc_nulls_first)
        val funcDraw0 = rnd.nextInt(4)
        // row_number needs a total in-partition order: remap onto rank for
        // the duplicate-PK lineitem head (the windowQuery convention)
        val funcDraw = if (!headUnique && funcDraw0 == 0) 1 else funcDraw0
        val (wSql, wCol) = funcDraw match {
          case 0 =>
            (s"row_number() OVER (PARTITION BY $partSql ORDER BY $ukOrderSql)",
              row_number().over(ukW))
          case 1 =>
            (s"rank() OVER (PARTITION BY $partSql ORDER BY ${anyCol.name} ASC NULLS FIRST)",
              rank().over(valW))
          case 2 =>
            (s"dense_rank() OVER (PARTITION BY $partSql ORDER BY ${anyCol.name} ASC NULLS FIRST)",
              dense_rank().over(valW))
          case _ =>
            (s"CAST(sum(${sumCol.name}) OVER (PARTITION BY $partSql) AS BIGINT)",
              sum(col(sumCol.name)).over(Window.partitionBy(partCol)))
        }
        val items =
          uk.zipWithIndex.map { case (kc, i) => Item(s"u$i", kc, col(kc)) } ++
            Seq(Item("k0", partSql, partCol), Item("w0", wSql, wCol))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        joinTail(sb)
        sb ++= " ORDER BY " +
          items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
        sb ++= " LIMIT 1000"
        val build = (s: SparkSession, d: String) => {
          joined(s, d).select(items.map(i => i.col.as(i.alias)): _*)
            .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
            .limit(1000)
        }
        GenQuery(seed, sb.result(), build,
          mode = s"temporal:twin:$unit:${chain.tables.head}")
    }
  }

  /** v23 string-scalar semantics — see the class doc. String inputs may
    * come from a LEFT-joined dim side (NULL in → NULL out is part of the
    * contract under test: replace/lower/||/split_part/instr all propagate
    * NULL identically in both engines). Search/find literals are drawn
    * from the column's own corpus-profiled literal pool, so replace and
    * instr genuinely hit.
    */
  private def strScalarQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = chains :+ eventsChain :+ documentsChain :+ eventsCustomerChain
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val nPred = rnd.nextInt(3)
    val preds = Vector.fill(nPred)(genPred(rnd, cols, version))
    val uk = headOrderCols(chain.tables.head)
    val sCols = cols.filter(_.kind == 's')
    val s1 = sCols(rnd.nextInt(sCols.length))
    val s2 = sCols(rnd.nextInt(sCols.length))
    /** A literal's raw text (sLit stores the quoted SQL form). The result
      * is spliced UNESCAPED into single-quoted shared SQL (replace/instr
      * search strings below); today's sLit pools are quote-and-backslash
      * free, and a future literal carrying either would generate broken or
      * divergent shared SQL — fail loudly at generation time instead (r12
      * advice).
      */
    def raw(c: FCol): String = {
      val q = c.lits(rnd.nextInt(c.lits.length)).sql
      val r = q.substring(1, q.length - 1)
      require(!r.contains('\'') && !r.contains('\\'),
        s"strScalarQuery literal $q contains a quote/backslash — add " +
          "escaping at this render site before adding such sLit values")
      r
    }

    rnd.nextInt(3) match {
      case 0 => // computed projections + || concatenation
        val k = 1 + rnd.nextInt(6)
        val (c0Sql, c0Col) = rnd.nextInt(6) match {
          case 0 => (s"lower(${s1.name})", lower(col(s1.name)))
          case 1 => (s"reverse(${s1.name})", reverse(col(s1.name)))
          case 2 =>
            val f = raw(s1)
            (s"replace(${s1.name}, '$f', '@')",
              replace(col(s1.name), lit(f), lit("@")))
          case 3 => (s"left(${s1.name}, $k)", left(col(s1.name), lit(k)))
          case 4 => (s"right(${s1.name}, $k)", right(col(s1.name), lit(k)))
          case _ =>
            // k may be SHORTER than the input — the truncate path both
            // engines share (lpad('abcd', 2, 'x') = 'ab')
            (s"lpad(${s1.name}, ${k + 2}, '_')",
              lpad(col(s1.name), k + 2, "_"))
        }
        val c1Sql = s"${s1.name} || '~' || ${s2.name}"
        val c1Col = concat(col(s1.name), lit("~"), col(s2.name))
        val items =
          uk.zipWithIndex.map { case (kc, i) => Item(s"u$i", kc, col(kc)) } ++
            Seq(Item("c0", c0Sql, c0Col), Item("c1", c1Sql, c1Col))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        sb ++= s" FROM ${chain.tables.head}"
        chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
          val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
          sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
        }
        if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
        sb ++= " ORDER BY " +
          items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
        sb ++= " LIMIT 1000"
        val build = (s: SparkSession, d: String) => {
          val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
          var j = dfs.head
          chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
            j = j.join(dfs(i + 1), col(lk) === col(rk),
              if (joinKinds(i) == "LEFT") "left" else "inner")
          }
          preds.foreach(p => j = j.where(p.col))
          j.select(items.map(i => i.col.as(i.alias)): _*)
            .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
            .limit(1000)
        }
        GenQuery(seed, sb.result(), build,
          mode = s"str:proj:${chain.tables.head}")

      case 1 => // split_part as a computed GROUP BY key
        val sep = Vector(" ", "-", "#")(rnd.nextInt(3))
        val n = 1 + rnd.nextInt(4)
        val keySql = s"split_part(${s1.name}, '$sep', $n)"
        val keyCol = split_part(col(s1.name), lit(sep), lit(n))
        val g2: Option[FCol] = {
          val groupables = cols.filter(_.groupable)
          if (rnd.nextInt(3) == 0 && groupables.nonEmpty)
            Some(groupables(rnd.nextInt(groupables.length)))
          else None
        }
        val aggs = (0 until 1 + rnd.nextInt(2))
          .map(i => genAgg(rnd, cols, s"a$i", version))
        val keyItems = Item("k0", keySql, keyCol) +:
          g2.map(c => Item("k1", c.name, col(c.name))).toSeq
        val items = keyItems ++ aggs
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        sb ++= s" FROM ${chain.tables.head}"
        chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
          val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
          sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
        }
        if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
        sb ++= s" GROUP BY $keySql" + g2.map(c => s", ${c.name}").getOrElse("")
        sb ++= " ORDER BY " +
          keyItems.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
        val build = (s: SparkSession, d: String) => {
          val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
          var j = dfs.head
          chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
            j = j.join(dfs(i + 1), col(lk) === col(rk),
              if (joinKinds(i) == "LEFT") "left" else "inner")
          }
          preds.foreach(p => j = j.where(p.col))
          val gCols = keyCol.as("k0") +: g2.map(c => col(c.name).as("k1")).toSeq
          val aggCols = aggs.map(i => i.col.as(i.alias))
          j.groupBy(gCols: _*)
            .agg(aggCols.head, aggCols.tail: _*)
            .orderBy(keyItems.map(i => col(i.alias).asc_nulls_first): _*)
        }
        GenQuery(seed, sb.result(), build,
          mode = s"str:splitkey:${chain.tables.head}")

      case _ => // instr find + length arithmetic (1-based, 0 when absent)
        val f = raw(s1)
        val e0Sql = s"CAST(instr(${s1.name}, '$f') AS BIGINT)"
        val e0Col = instr(col(s1.name), f).cast("long")
        val e1Sql = s"CAST(length(${s1.name}) AS BIGINT)"
        val e1Col = length(col(s1.name)).cast("long")
        val findPred: Option[(String, Column)] = rnd.nextInt(3) match {
          case 0 => None
          case 1 => Some((s"instr(${s1.name}, '$f') > 0",
            instr(col(s1.name), f) > 0))
          case _ => Some((s"instr(${s1.name}, '$f') = 0",
            instr(col(s1.name), f) === 0))
        }
        val items =
          uk.zipWithIndex.map { case (kc, i) => Item(s"u$i", kc, col(kc)) } ++
            Seq(Item("e0", e0Sql, e0Col), Item("e1", e1Sql, e1Col),
              Item("e2", s"$e1Sql - $e0Sql", e1Col - e0Col))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        sb ++= s" FROM ${chain.tables.head}"
        chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
          val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
          sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
        }
        if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
        findPred.foreach { case (psql, _) =>
          sb ++= (if (preds.nonEmpty) s" AND $psql" else s" WHERE $psql")
        }
        sb ++= " ORDER BY " +
          items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
        sb ++= " LIMIT 1000"
        val build = (s: SparkSession, d: String) => {
          val dfs = chain.tables.map(t => loadFuzzTable(s, d, t))
          var j = dfs.head
          chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
            j = j.join(dfs(i + 1), col(lk) === col(rk),
              if (joinKinds(i) == "LEFT") "left" else "inner")
          }
          preds.foreach(p => j = j.where(p.col))
          findPred.foreach { case (_, pcol) => j = j.where(pcol) }
          j.select(items.map(i => i.col.as(i.alias)): _*)
            .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
            .limit(1000)
        }
        GenQuery(seed, sb.result(), build,
          mode = s"str:poslen:${chain.tables.head}")
    }
  }

  /** v25 dedicated mode: explicit GROUPING SETS + multi-DISTINCT
    * aggregates — the two grouping surfaces no older grammar draws.
    * ROLLUP/CUBE (v11/v20/v24) always expand to the standard prefix /
    * power-set lattices; an EXPLICIT set list can skip lattice levels or
    * include only the grand total, and each output row is attributable to
    * its set ONLY via the GROUPING() flags. Multi-DISTINCT aggregates over
    * pairwise-DIFFERENT argument columns are the other un-drawn surface:
    * Spark plans them with an Expand (one input replica per distinct
    * group) — a physically different shape from single-distinct hash
    * aggregation, cross-checked here against DuckDB's independent
    * implementation. Three sub-shapes:
    *   0 explicit GROUPING SETS: 2-3 keys, 2-4 distinct drawn subsets of
    *     the key list (bitmask draw — may omit the full set, may include
    *     the () grand total) over a possibly-LEFT join chain; aggregates =
    *     genAgg + one DISTINCT agg; per-key GROUPING() flag precedes the
    *     keys in the total ORDER BY (v20 discipline — flags ↔ sets are a
    *     bijection, so flags+keys is a total order), HAVING count(*) > 0
    *     guards the empty-input grand-total row;
    *   1 multi-DISTINCT: GROUP BY one key (or global), 2-3 DISTINCT
    *     aggregates over pairwise-different columns beside plain
    *     aggregates — the Expand plan;
    *   2 FILTER (WHERE …) aggregate clause (standard SQL; Spark parses it
    *     on plain AND DISTINCT aggregates): count(*)/count(DISTINCT c)/
    *     sum(int) each FILTERed beside their unfiltered contrasts. The DF
    *     rendering uses the when()-NULL equivalence — count/sum skip
    *     NULLs, and DISTINCT over the when-projection drops exactly the
    *     filtered-out rows' values.
    * Integer sum / sum(DISTINCT) are CAST BIGINT on the shared text
    * (DuckDB HUGEINT — the q12 class). sum(DISTINCT) draws INT columns
    * only: a double DISTINCT-set still sums in engine-chosen order, which
    * is not order-free; count(DISTINCT) draws int/string/timestamp kinds
    * (value equality, no arithmetic).
    */
  private def groupingSetsQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val shape = rnd.nextInt(3)
    val basePool = chains :+ eventsChain :+ documentsChain :+ eventsCustomerChain
    // shape 0 needs >= 2 groupable keys (the single-table supplier chain
    // has exactly one); the filtered pool keeps the draw well-defined
    val pool =
      if (shape == 0) basePool.filter(c => c.tables.flatMap(catalog).count(_.groupable) >= 2)
      else basePool
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val groupables = cols.filter(_.groupable)
    val intCols = cols.filter(_.kind == 'i')

    def joinTail(sb: StringBuilder, preds: Seq[P]): Unit = {
      sb ++= s" FROM ${chain.tables.head}"
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
        sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
      }
      if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    }
    def joined(s: SparkSession, d: String, preds: Seq[P]): DataFrame = {
      val dfs = chain.tables.map(tb => loadFuzzTable(s, d, tb))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      j
    }
    /** One DISTINCT aggregate over a column not already used by another
      * distinct agg (pairwise-different arguments are what makes the plan
      * multi-distinct). Returns the item and the drawn column's name.
      */
    def genDistinctAgg(alias: String, used: Set[String]): (Item, String) = {
      val istPool = cols.filter(c => "ist".contains(c.kind) && !used(c.name))
      val c = istPool(rnd.nextInt(istPool.length))
      val item =
        if (c.kind == 'i' && rnd.nextInt(3) == 0)
          Item(alias, s"CAST(sum(DISTINCT ${c.name}) AS BIGINT)",
            sum_distinct(col(c.name)))
        else Item(alias, s"count(DISTINCT ${c.name})", countDistinct(col(c.name)))
      (item, c.name)
    }

    shape match {
      case 0 => // explicit GROUPING SETS
        val nKeys = if (groupables.length >= 3 && rnd.nextBoolean()) 3 else 2
        val drawn = rnd.shuffle(groupables.toVector).take(nKeys)
        val allMasks = rnd.shuffle((0 until (1 << nKeys)).toVector)
        val nSets = 2 + rnd.nextInt(3) // 2..4 distinct subsets (of 4 or 8)
        val masks = allMasks.take(nSets)
        // Spark rejects GROUPING(k) for a column in NO drawn set
        // (GROUPING_COLUMN_MISMATCH) — and selecting such a key is
        // meaningless anyway. Keep only the set-covered keys; ≥1 survives
        // because masks are distinct and nSets ≥ 2 forces a nonzero mask.
        val union = masks.foldLeft(0)(_ | _)
        val keptIdx = (0 until nKeys).filter(i => ((union >> i) & 1) == 1)
        val keys = keptIdx.map(drawn).toVector
        def setCols(m: Int): Seq[FCol] =
          keptIdx.collect { case i if ((m >> i) & 1) == 1 => drawn(i) }
        val preds = Vector.fill(rnd.nextInt(2))(genPred(rnd, cols, version))
        val aggs = Seq(genAgg(rnd, cols, "a0", version), genDistinctAgg("a1", Set.empty)._1)
        val flagItems = keys.zipWithIndex.map { case (c, i) =>
          Item(s"g$i", s"CAST(grouping(${c.name}) AS BIGINT)",
            grouping(col(c.name)).cast("long"))
        }
        val keyItems = keys.zipWithIndex.map { case (c, i) =>
          Item(s"k$i", c.name, col(c.name))
        }
        val items = flagItems ++ keyItems ++ aggs
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        joinTail(sb, preds)
        sb ++= " GROUP BY GROUPING SETS " +
          masks.map(m => setCols(m).map(_.name).mkString("(", ", ", ")"))
            .mkString("(", ", ", ")")
        sb ++= " HAVING count(*) > 0"
        sb ++= " ORDER BY " + (flagItems ++ keyItems)
          .map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
        val build = (s: SparkSession, d: String) => {
          val df = joined(s, d, preds)
          val sets = masks.map(m => setCols(m).map(c => col(c.name)))
          val aggCols = (flagItems ++ aggs).map(i => i.col.as(i.alias)) :+
            count(lit(1)).as("_hv")
          df.groupingSets(sets, keys.map(c => col(c.name)): _*)
            .agg(aggCols.head, aggCols.tail: _*)
            .where(col("_hv") > 0)
            .select(items.map(i =>
              (if (i.alias.startsWith("k")) col(keys(i.alias.drop(1).toInt).name)
               else col(i.alias)).as(i.alias)): _*)
            .orderBy((flagItems ++ keyItems).map(i => col(i.alias).asc_nulls_first): _*)
        }
        GenQuery(seed, sb.result(), build,
          mode = s"gsets:sets:${nKeys}key:${masks.length}set")

      case 1 => // multi-DISTINCT aggregates (the Expand plan)
        val keyOpt =
          if (rnd.nextInt(4) > 0) Some(groupables(rnd.nextInt(groupables.length)))
          else None
        val preds = Vector.fill(rnd.nextInt(2))(genPred(rnd, cols, version))
        val istAvail = cols.count(c => "ist".contains(c.kind) &&
          !keyOpt.exists(_.name == c.name))
        val nDist = math.min(2 + rnd.nextInt(2), istAvail)
        var used = keyOpt.map(_.name).toSet
        val distAggs = (0 until nDist).map { i =>
          val (item, cn) = genDistinctAgg(s"d$i", used)
          used += cn
          item
        }
        val plainAggs = (0 until 1 + rnd.nextInt(2))
          .map(i => genAgg(rnd, cols, s"a$i", version))
        val keyItems = keyOpt.toSeq.map(c => Item("k0", c.name, col(c.name)))
        val items = keyItems ++ distAggs ++ plainAggs
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        joinTail(sb, preds)
        keyOpt.foreach(c => sb ++= s" GROUP BY ${c.name}")
        keyOpt.foreach(_ => sb ++= " ORDER BY k0 ASC NULLS FIRST")
        val build = (s: SparkSession, d: String) => {
          val df = joined(s, d, preds)
          val aggCols = (distAggs ++ plainAggs).map(i => i.col.as(i.alias))
          val out = keyOpt match {
            case Some(k) =>
              df.groupBy(col(k.name)).agg(aggCols.head, aggCols.tail: _*)
                .select((col(k.name).as("k0") +: (distAggs ++ plainAggs)
                  .map(i => col(i.alias))): _*)
                .orderBy(col("k0").asc_nulls_first)
            case None => df.agg(aggCols.head, aggCols.tail: _*)
          }
          out
        }
        GenQuery(seed, sb.result(), build,
          mode = s"gsets:multidistinct:${nDist}d${if (keyOpt.isEmpty) ":global" else ""}")

      case _ => // FILTER (WHERE …) aggregates beside unfiltered contrasts
        val key = groupables(rnd.nextInt(groupables.length))
        val fp = genPred(rnd, cols.filterNot(_.name == key.name), version)
        val preds = Vector.fill(rnd.nextInt(2))(genPred(rnd, cols, version))
        val (dItem0, dCol) = genDistinctAgg("df0", Set(key.name))
        // render the FILTERed distinct from the same drawn column
        val dFiltered = dItem0.sql match {
          case s if s.startsWith("CAST(sum(DISTINCT") =>
            Item("df0", s"CAST(sum(DISTINCT $dCol) FILTER (WHERE ${fp.sql}) AS BIGINT)",
              sum_distinct(when(fp.col, col(dCol))))
          case _ =>
            Item("df0", s"count(DISTINCT $dCol) FILTER (WHERE ${fp.sql})",
              countDistinct(when(fp.col, col(dCol))))
        }
        val sc = intCols(rnd.nextInt(intCols.length))
        val items = Seq(
          Item("k0", key.name, col(key.name)),
          Item("nf", s"count(*) FILTER (WHERE ${fp.sql})", count(when(fp.col, lit(1)))),
          Item("n", "count(*)", count(lit(1))),
          dFiltered,
          Item("du", s"count(DISTINCT $dCol)", countDistinct(col(dCol))),
          Item("sf", s"CAST(sum(${sc.name}) FILTER (WHERE ${fp.sql}) AS BIGINT)",
            sum(when(fp.col, col(sc.name)))))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        joinTail(sb, preds)
        sb ++= s" GROUP BY ${key.name} ORDER BY k0 ASC NULLS FIRST"
        val build = (s: SparkSession, d: String) => {
          val df = joined(s, d, preds)
          val aggCols = items.tail.map(i => i.col.as(i.alias))
          df.groupBy(col(key.name)).agg(aggCols.head, aggCols.tail: _*)
            .select((col(key.name).as("k0") +: items.tail.map(i => col(i.alias))): _*)
            .orderBy(col("k0").asc_nulls_first)
        }
        GenQuery(seed, sb.result(), build, mode = "gsets:filter")
    }
  }

  /** v26 dedicated mode: the extended window-function family no older
    * grammar draws — percent_rank / cume_dist (relative-position over PEER
    * GROUPS: their results depend only on the ORDER VALUE, so genuinely
    * TIED orderings are legal and are the point) and nth_value (positional
    * within the frame: requires the verified-unique head key as the
    * ordering, v2's discipline). Portability rule every seed pins: window
    * ORDER BY is rendered with an explicit `ASC NULLS FIRST` — Spark's
    * default null ordering is NULLS FIRST, DuckDB's is NULLS LAST, so a
    * bare `ORDER BY c` inside OVER() silently diverges the moment a
    * LEFT-join NULL-extends the ordering column. Three sub-shapes:
    *   0 percent_rank() / cume_dist() partitioned by a groupable dim,
    *     ordered by a possibly-tied (and, under LEFT, possibly-NULL)
    *     numeric column — (rank-1)/(n-1) and peers_cum/n are exact small
    *     integer ratios in DOUBLE, one IEEE division, engine-identical;
    *   1 nth_value(c, k) ordered by the unique head key under a drawn
    *     frame: the standard default (RANGE UNBOUNDED PRECEDING..CURRENT
    *     ROW — NULL until k rows accumulate; the DF side spells it
    *     explicitly, pinning both engines' implicit frame), the explicit
    *     ROWS equivalent, or the whole-partition frame (constant per
    *     partition once k ≤ partition size);
    *   2 the combo: one relative-position function and one nth_value with
    *     DIFFERENT window specs in a single projection.
    */
  private def extWindowQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = (chains :+ eventsChain :+ documentsChain :+ eventsCustomerChain)
      .filter(c => uniqueKeys.contains(c.tables.head))
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val preds = Vector.fill(rnd.nextInt(3))(genPred(rnd, cols, version))
    val uk = uniqueKeys(chain.tables.head).head
    val groupables = cols.filter(_.groupable)
    val g = groupables(rnd.nextInt(groupables.length))

    def joinTail(sb: StringBuilder): Unit = {
      sb ++= s" FROM ${chain.tables.head}"
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
        sb ++= s" $kw ${chain.tables(i + 1)} ON ($lk = $rk)"
      }
      if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    }
    def joined(s: SparkSession, d: String): DataFrame = {
      val dfs = chain.tables.map(tb => loadFuzzTable(s, d, tb))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      j
    }
    def emit(items: Seq[Item], modeTag: String): GenQuery = {
      val sb = new StringBuilder("SELECT ")
      sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
      joinTail(sb)
      sb ++= " ORDER BY " +
        items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
      sb ++= " LIMIT 1000"
      val build = (s: SparkSession, d: String) =>
        joined(s, d)
          .select(items.map(i => i.col.as(i.alias)): _*)
          .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
          .limit(1000)
      GenQuery(seed, sb.result(), build,
        mode = s"extwin:$modeTag:${chain.tables.head}")
    }
    /** percent_rank or cume_dist over (PARTITION BY g ORDER BY oc NULLS
      * FIRST) — oc possibly tied, possibly NULL under LEFT. */
    def relPos(alias: String, partC: FCol): Item = {
      val ocPool = cols.filter(c => c.kind == 'i' || c.kind == 'd')
      val oc = ocPool(rnd.nextInt(ocPool.length))
      val over = s"OVER (PARTITION BY ${partC.name} ORDER BY ${oc.name} ASC NULLS FIRST)"
      val w = Window.partitionBy(col(partC.name)).orderBy(col(oc.name).asc_nulls_first)
      if (rnd.nextBoolean())
        Item(alias, s"percent_rank() $over", percent_rank().over(w))
      else Item(alias, s"cume_dist() $over", cume_dist().over(w))
    }
    /** nth_value over the unique head key under a drawn frame. */
    def nthItem(alias: String, partC: FCol): Item = {
      val vc = cols(rnd.nextInt(cols.length))
      val k = 1 + rnd.nextInt(3)
      val base = Window.partitionBy(col(partC.name)).orderBy(col(uk).asc_nulls_first)
      rnd.nextInt(3) match {
        case 0 => // standard default frame; DF side spells it explicitly
          Item(alias,
            s"nth_value(${vc.name}, $k) OVER (PARTITION BY ${partC.name} " +
              s"ORDER BY $uk ASC NULLS FIRST)",
            nth_value(col(vc.name), k)
              .over(base.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
        case 1 => // explicit ROWS UNBOUNDED PRECEDING..CURRENT ROW
          Item(alias,
            s"nth_value(${vc.name}, $k) OVER (PARTITION BY ${partC.name} " +
              s"ORDER BY $uk ASC NULLS FIRST " +
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
            nth_value(col(vc.name), k)
              .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        case _ => // whole-partition frame
          Item(alias,
            s"nth_value(${vc.name}, $k) OVER (PARTITION BY ${partC.name} " +
              s"ORDER BY $uk ASC NULLS FIRST " +
              "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
            nth_value(col(vc.name), k)
              .over(base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      }
    }
    val base = Seq(Item("k0", uk, col(uk)), Item("p0", g.name, col(g.name)))
    rnd.nextInt(3) match {
      case 0 => emit(base :+ relPos("w0", g), "relpos")
      case 1 => emit(base :+ nthItem("w0", g), "nth")
      case _ =>
        val rest = groupables.filterNot(_.name == g.name)
        val g2 = if (rest.isEmpty) g else rest(rnd.nextInt(rest.length))
        emit(base ++ Seq(relPos("w0", g), nthItem("w1", g2)), "combo")
    }
  }

  /** Per-column DECIMAL(p, s) target for the v27 decimal derived view.
    * Every scale is ≥ the column's corpus generation scale (monetary and
    * rate columns are generated at 2 decimals), so the double → DECIMAL
    * cast never lands on an exact .5 tie: the binary double sits an
    * epsilon off the decimal value and both engines round to the same
    * nearest representable — the derived view is engine-identical by
    * construction. Exact-decimal ties (where rounding MODE must agree)
    * are then tested deliberately on the DECIMAL side by shape 3's
    * round(x, s-1) over 2-decimal data.
    */
  private[graft] val decSpec: Map[String, (Int, Int)] = Map(
    "c_acctbal" -> ((12, 2)), "s_acctbal" -> ((12, 2)),
    "p_retailprice" -> ((12, 2)), "o_totalprice" -> ((14, 2)),
    "l_quantity" -> ((10, 2)), "l_extendedprice" -> ((14, 2)),
    "l_discount" -> ((8, 4)), "l_tax" -> ((8, 4)), "value" -> ((12, 4)))

  /** v27 dedicated mode: EXACT DECIMAL semantics — the one numeric type
    * the corpus doesn't carry (doubles everywhere), derived per seed by
    * casting every double column of the drawn chain to its fixed
    * [[decSpec]] DECIMAL target inside the FROM fragments (ONE shared SQL
    * text: plain CASTs parse identically in both dialects). The engines'
    * DECIMAL result-type rules differ (Spark sum(DECIMAL(14,2)) is
    * DECIMAL(24,2), DuckDB's is DECIMAL(38,2); products add one precision
    * digit in Spark only), so every aggregate/arithmetic output is CAST
    * to an explicit DECIMAL(38, s) with s fixed by the operand scales —
    * value-exact in both engines because widening casts never round.
    *
    * RENDERED SURFACE (r13 verdict #1): no declared output column may be
    * DECIMAL-typed — the driver's typed hasher renders trailing-zero
    * decimals through a shortest-repr float path on one side and a
    * scale-preserving path on the other, so `134821.00` hash-diverges on
    * values that are engine-identical (27/28 frozen v27 seeds failed r13
    * this way). Every decimal-typed item is therefore wrapped in an outer
    * CAST(… AS STRING): both engines render DECIMAL→VARCHAR scale-
    * preserving (`1.500`, `-134821.00`, `0.000000` — verified on both),
    * the comparison is exact by construction with no float anywhere, and
    * the exactness v27 tests lives untouched in the DECIMAL arithmetic
    * inside. STRING sort order (ORDER BY the rendered columns) is binary
    * in both engines, so row order stays deterministic. WHERE predicates
    * draw from NON-decimal columns only: genPred emits double literals,
    * and DECIMAL-vs-DOUBLE comparison coercion is the engines' own
    * business (exact today, silently fragile — ADVICE r13); decimal
    * comparison predicates are covered deliberately by v31 with
    * scale-pinned decimal literals.
    *
    * Four sub-shapes:
    *   0 grouped decimal aggregation: CAST(sum AS DECIMAL(38,s)), min /
    *     max (result type = input type in both engines), count(*);
    *   1 arithmetic projection: a*b at scale sa+sb, a±b at max(sa,sb),
    *     a*(1-d) — all exact integer arithmetic under the hood, outer
    *     CASTs pin one rendered type;
    *   2 sum-of-products (the TPC-H revenue shape on exact money): the
    *     inner product CAST keeps scale 6 — a widening, so no rounding —
    *     then the sum is pinned at DECIMAL(38,6);
    *   3 decimal scalar functions: round(a, s-1) — REAL half-way ties on
    *     2-decimal data, both engines must round half AWAY FROM ZERO
    *     (c_acctbal goes negative: -0.x5 ties too); floor/ceil CAST
    *     BIGINT; abs (type-preserving).
    */
  private def decimalQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = (chains :+ eventsChain)
      .filter(c => c.tables.flatMap(catalog).exists(cc => decSpec.contains(cc.name)))
    val chain = pool(rnd.nextInt(pool.length))
    val joinKinds = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    // Predicates over NON-decimal columns only (see scaladoc): genPred's
    // double literals against the DECIMAL-cast view would rely on both
    // engines coercing DECIMAL-vs-DOUBLE identically.
    val predCols = cols.filterNot(c => decSpec.contains(c.name))
    val preds = Vector.fill(rnd.nextInt(2))(genPred(rnd, predCols, version))
    val decCols = cols.filter(c => decSpec.contains(c.name))
    val groupables = cols.filter(_.groupable)
    val uk = headOrderCols(chain.tables.head)

    def frag(t: String): String = {
      val colSqls = catalog(t).map { c =>
        decSpec.get(c.name) match {
          case Some((p, s)) => s"CAST(${c.name} AS DECIMAL($p, $s)) AS ${c.name}"
          case None         => c.name
        }
      }
      s"(SELECT ${colSqls.mkString(", ")} FROM $t) $t"
    }
    def loadDec(s: SparkSession, d: String, t: String): DataFrame =
      loadFuzzTable(s, d, t).select(catalog(t).map { c =>
        decSpec.get(c.name) match {
          case Some((p, s2)) => col(c.name).cast(s"decimal($p, $s2)").as(c.name)
          case None          => col(c.name)
        }
      }: _*)
    def joinTail(sb: StringBuilder): Unit = {
      sb ++= s" FROM ${frag(chain.tables.head)}"
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
        sb ++= s" $kw ${frag(chain.tables(i + 1))} ON ($lk = $rk)"
      }
      if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    }
    def joined(s: SparkSession, d: String): DataFrame = {
      val dfs = chain.tables.map(tb => loadDec(s, d, tb))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        j = j.join(dfs(i + 1), col(lk) === col(rk),
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      j
    }
    def scaleOf(c: FCol): Int = decSpec(c.name)._2
    def draw(): FCol = decCols(rnd.nextInt(decCols.length))
    // Declared surface must not be DECIMAL-typed (scaladoc above): render
    // each decimal item as its exact scale-preserving string.
    def asStr(i: Item): Item =
      Item(i.alias, s"CAST(${i.sql} AS STRING)", i.col.cast("string"))
    // Java BigDecimal (Spark's decimal→string path) renders |v| < 1e-6 at
    // scale > 6 — including zero — in scientific notation ("0E-8") where
    // DuckDB stays plain, so cap the RENDERED scale at 6 with one extra
    // cast. Value-exact: decSpec columns carry ≤2 corpus decimals
    // (asserted by FuzzSpec's corpus-preconditions test), so any product
    // of two carries ≤4 — the recast never rounds.
    def capStr(alias: String, sql: String, c: Column, s: Int): Item =
      if (s <= 6) asStr(Item(alias, sql, c))
      else asStr(Item(alias, s"CAST($sql AS DECIMAL(38, 6))",
        c.cast("decimal(38, 6)")))

    def emitProj(items: Seq[Item], modeTag: String): GenQuery = {
      val keyItems = uk.zipWithIndex.map { case (k, i) => Item(s"k$i", k, col(k)) }
      val all = keyItems ++ items
      val sb = new StringBuilder("SELECT ")
      sb ++= all.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
      joinTail(sb)
      sb ++= " ORDER BY " + all.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
      sb ++= " LIMIT 1000"
      val build = (s: SparkSession, d: String) =>
        joined(s, d)
          .select(all.map(i => i.col.as(i.alias)): _*)
          .orderBy(all.map(i => col(i.alias).asc_nulls_first): _*)
          .limit(1000)
      GenQuery(seed, sb.result(), build, mode = s"dec:$modeTag:${chain.tables.head}")
    }

    rnd.nextInt(4) match {
      case 0 => // grouped decimal aggregation
        val g = groupables(rnd.nextInt(groupables.length))
        val d1 = draw(); val d2 = draw()
        val (_, s1) = decSpec(d1.name)
        val (p2, s2) = decSpec(d2.name)
        val items = Seq(
          Item("k0", g.name, col(g.name)),
          asStr(Item("s0", s"CAST(sum(${d1.name}) AS DECIMAL(38, $s1))",
            sum(col(d1.name)).cast(s"decimal(38, $s1)"))),
          asStr(Item("m0", s"min(${d2.name})", min(col(d2.name)))),
          asStr(Item("m1", s"max(${d2.name})", max(col(d2.name)))),
          Item("n", "count(*)", count(lit(1))))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        joinTail(sb)
        sb ++= s" GROUP BY ${g.name} ORDER BY k0 ASC NULLS FIRST"
        val build = (s: SparkSession, d: String) =>
          joined(s, d)
            .groupBy(col(g.name))
            .agg(items(1).col.as("s0"), items(2).col.as("m0"),
              items(3).col.as("m1"), items(4).col.as("n"))
            .select(col(g.name).as("k0"), col("s0"), col("m0"), col("m1"), col("n"))
            .orderBy(col("k0").asc_nulls_first)
        GenQuery(seed, sb.result(), build, mode = s"dec:agg:${chain.tables.head}")

      case 1 => // arithmetic projection with pinned result scales
        val a = draw(); val b = draw(); val d = draw()
        val sMul = scaleOf(a) + scaleOf(b)
        val sAdd = math.max(scaleOf(a), scaleOf(b))
        val op = if (rnd.nextBoolean()) "+" else "-"
        val items = Seq(
          capStr("x0", s"CAST(${a.name} * ${b.name} AS DECIMAL(38, $sMul))",
            (col(a.name) * col(b.name)).cast(s"decimal(38, $sMul)"), sMul),
          asStr(Item("x1", s"CAST(${a.name} $op ${b.name} AS DECIMAL(38, $sAdd))",
            (if (op == "+") col(a.name) + col(b.name)
             else col(a.name) - col(b.name)).cast(s"decimal(38, $sAdd)"))),
          capStr("x2", s"CAST(${a.name} * (1 - ${d.name}) AS DECIMAL(38, ${scaleOf(a) + scaleOf(d)}))",
            (col(a.name) * (lit(1) - col(d.name)))
              .cast(s"decimal(38, ${scaleOf(a) + scaleOf(d)})"),
            scaleOf(a) + scaleOf(d)))
        emitProj(items, "arith")

      case 2 => // sum of exact products (the revenue shape on DECIMAL)
        val g = groupables(rnd.nextInt(groupables.length))
        val a = draw(); val d = draw()
        val sIn = scaleOf(a) + scaleOf(d)
        val inner = s"CAST(${a.name} * (1 - ${d.name}) AS DECIMAL(24, $sIn))"
        val innerCol = (col(a.name) * (lit(1) - col(d.name))).cast(s"decimal(24, $sIn)")
        val items = Seq(
          Item("k0", g.name, col(g.name)),
          capStr("rev", s"CAST(sum($inner) AS DECIMAL(38, $sIn))",
            sum(innerCol).cast(s"decimal(38, $sIn)"), sIn),
          Item("n", "count(*)", count(lit(1))))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        joinTail(sb)
        sb ++= s" GROUP BY ${g.name} ORDER BY k0 ASC NULLS FIRST"
        val build = (s: SparkSession, d2: String) =>
          joined(s, d2)
            .groupBy(col(g.name))
            .agg(items(1).col.as("rev"), items(2).col.as("n"))
            .select(col(g.name).as("k0"), col("rev"), col("n"))
            .orderBy(col("k0").asc_nulls_first)
        GenQuery(seed, sb.result(), build, mode = s"dec:sumprod:${chain.tables.head}")

      case _ => // decimal scalar functions incl. the real-tie round
        val a = draw()
        val (p, s) = decSpec(a.name)
        val rs = s - 1
        val items = Seq(
          asStr(Item("r0", s"CAST(round(${a.name}, $rs) AS DECIMAL($p, $rs))",
            round(col(a.name), rs).cast(s"decimal($p, $rs)"))),
          Item("f0", s"CAST(floor(${a.name}) AS BIGINT)",
            floor(col(a.name)).cast("long")),
          Item("c0", s"CAST(ceil(${a.name}) AS BIGINT)",
            ceil(col(a.name)).cast("long")),
          asStr(Item("ab", s"abs(${a.name})", abs(col(a.name)))))
        emitProj(items, "fns")
    }
  }

  /** v33 dedicated mode: DECIMAL × NULL — the composition of the two
    * semantics tiers that bit hardest (v27/v31's exact-decimal typed view
    * and v17's deterministic NULL injection): a genuinely-NULL DECIMAL
    * column through NULL-skipping aggregates, decimal GROUP BY keys with
    * a real NULL group, three-valued decimal comparisons, and COALESCE
    * repair at the column's exact type. The derived view casts every
    * decSpec column to its DECIMAL(p,s) target and NULLs ONE decimal
    * victim on a (uniquekey % m) = r stripe — one shared SQL text (CASTs
    * and CASE parse identically in both dialects). Same rendered-surface
    * rule as v27/v31: outputs are scale-preserving strings (a NULL cell
    * renders as SQL NULL in both engines) or integral counts. Three
    * sub-shapes:
    *   0 NULL-skipping aggregate contrast: count(*) vs count(v) beside
    *     sum/min/max over the NULL-bearing decimal (groups whose victims
    *     are ALL NULL yield NULL aggregates in both engines);
    *   1 the victim AS the GROUP BY key: decimal distinct-equality must
    *     collect the injected rows into ONE genuine NULL group, ordered
    *     NULLS FIRST over the rendered key;
    *   2 three-valued predicates + repair: v {cmp} scale-pinned-literal
    *     silently drops the NULL stripe, IS [NOT] NULL selects it
    *     exactly, and COALESCE(v, CAST(lit AS DECIMAL(p,s))) repairs at
    *     the pinned type so the coalesced rendering is scale-stable.
    */
  private def decimalNullQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = Vector("orders", "customer", "supplier", "part", "events")
    val t = pool(rnd.nextInt(pool.length))
    val key = uniqueKeys(t).head
    val decCols = catalog(t).filter(c => decSpec.contains(c.name))
    val v = decCols(rnd.nextInt(decCols.length))
    val (vp, vs) = decSpec(v.name)
    val m = 5 + rnd.nextInt(5)
    val r = rnd.nextInt(m)
    def frag: String = {
      val colSqls = catalog(t).map { c =>
        val base = decSpec.get(c.name) match {
          case Some((pp, ss)) => s"CAST(${c.name} AS DECIMAL($pp, $ss))"
          case None           => c.name
        }
        if (c.name == v.name)
          s"CASE WHEN ($key % $m) = $r THEN NULL ELSE $base END AS ${c.name}"
        else if (decSpec.contains(c.name)) s"$base AS ${c.name}"
        else c.name
      }
      s"(SELECT ${colSqls.mkString(", ")} FROM $t) $t"
    }
    def load(s: SparkSession, d: String): DataFrame =
      loadFuzzTable(s, d, t).select(catalog(t).map { c =>
        val base = decSpec.get(c.name) match {
          case Some((pp, ss)) => col(c.name).cast(s"decimal($pp, $ss)")
          case None           => col(c.name)
        }
        if (c.name == v.name)
          when((col(key) % m) === r, lit(null)).otherwise(base).as(c.name)
        else base.as(c.name)
      }: _*)
    // Scale-pinned literal from the victim's corpus pool, CAST to the
    // victim's exact DECIMAL type in both renderings so comparison and
    // COALESCE output types are pinned, never coerced.
    def vLit(): (String, Column) = {
      val l = v.lits(rnd.nextInt(v.lits.length))
      val bd = new java.math.BigDecimal(l.sql).setScale(vs, java.math.RoundingMode.UNNECESSARY)
      (s"CAST(${bd.toPlainString} AS DECIMAL($vp, $vs))",
        lit(bd).cast(s"decimal($vp, $vs)"))
    }
    val groupables = catalog(t).filter(_.groupable)
    val intCols = catalog(t).filter(_.kind == 'i')

    rnd.nextInt(3) match {
      case 0 => // NULL-skipping aggregate contrast over the victim
        val g = groupables(rnd.nextInt(groupables.length))
        val items = Seq(
          Item("k0", g.name, col(g.name)),
          Item("n", "count(*)", count(lit(1))),
          Item("nn", s"count(${v.name})", count(col(v.name))),
          Item("s0", s"CAST(CAST(sum(${v.name}) AS DECIMAL(38, $vs)) AS STRING)",
            sum(col(v.name)).cast(s"decimal(38, $vs)").cast("string")),
          Item("m0", s"CAST(min(${v.name}) AS STRING)",
            min(col(v.name)).cast("string")),
          Item("m1", s"CAST(max(${v.name}) AS STRING)",
            max(col(v.name)).cast("string")))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        sb ++= s" FROM $frag GROUP BY ${g.name} ORDER BY k0 ASC NULLS FIRST"
        val build = (s: SparkSession, d: String) =>
          load(s, d)
            .groupBy(col(g.name))
            .agg(items(1).col.as("n"), items(2).col.as("nn"),
              items(3).col.as("s0"), items(4).col.as("m0"),
              items(5).col.as("m1"))
            .select(col(g.name).as("k0"), col("n"), col("nn"), col("s0"),
              col("m0"), col("m1"))
            .orderBy(col("k0").asc_nulls_first)
        GenQuery(seed, sb.result(), build, mode = s"decn:agg:$t")

      case 1 => // the NULL-injected decimal AS the GROUP BY key
        val sc2 = intCols(rnd.nextInt(intCols.length))
        val items = Seq(
          Item("k0", s"CAST(${v.name} AS STRING)", col(v.name).cast("string")),
          Item("n", "count(*)", count(lit(1))),
          Item("s0", s"CAST(sum(${sc2.name}) AS BIGINT)", sum(col(sc2.name))))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        sb ++= s" FROM $frag GROUP BY ${v.name} " +
          "ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
        val build = (s: SparkSession, d: String) =>
          load(s, d)
            .groupBy(col(v.name))
            .agg(items(1).col.as("n"), items(2).col.as("s0"))
            .select(col(v.name).cast("string").as("k0"), col("n"), col("s0"))
            .orderBy(col("k0").asc_nulls_first)
            .limit(1000)
        GenQuery(seed, sb.result(), build, mode = s"decn:group:$t")

      case _ => // three-valued predicate + COALESCE repair projection
        val (lSql, lCol) = vLit()
        val pred = rnd.nextInt(4) match {
          case 0 => P(s"${v.name} IS NULL", col(v.name).isNull)
          case 1 => P(s"${v.name} IS NOT NULL", col(v.name).isNotNull)
          case 2 => P(s"${v.name} >= $lSql", col(v.name) >= lCol)
          case _ => P(s"${v.name} < $lSql", col(v.name) < lCol)
        }
        val (rSql, rCol) = vLit()
        val items = Seq(
          Item("k0", key, col(key)),
          Item("c0", s"CAST(${v.name} AS STRING)", col(v.name).cast("string")),
          Item("c1", s"CAST(COALESCE(${v.name}, $rSql) AS STRING)",
            coalesce(col(v.name), rCol).cast("string")))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        sb ++= s" FROM $frag WHERE ${pred.sql} " +
          "ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
        val build = (s: SparkSession, d: String) =>
          load(s, d)
            .where(pred.col)
            .select(items.map(i => i.col.as(i.alias)): _*)
            .orderBy(col("k0").asc_nulls_first)
            .limit(1000)
        GenQuery(seed, sb.result(), build, mode = s"decn:pred:$t")
    }
  }

  /** v32 dedicated mode: the documents ⋈ embeddings corpus edge — the one
    * table pair no other generated mode ever draws together (documents
    * joins nothing by FK; embeddings only appears through v16's
    * single-table derived view). The relation is doc_id = vec_id: both
    * 0..N-1 dense and verified unique, but at sf0.1 documents outnumber
    * embeddings 5000 vs 2000, so the LEFT form produces GENUINE
    * NULL-extended derived columns — a coverage edge (a fact keyed 1:≤1
    * against a partially-populated enrichment) none of the TPC-H FK
    * chains exhibit. The embeddings side is v16's [[drawEmbOverride]]
    * derived table (integer-exact element/fold scalars, dual-dialect
    * fragment — array syntax is the one surface the engines don't
    * share), everything outside the fragment is ONE shared SQL text.
    * Three sub-shapes:
    *   0 projection: doc_id-keyed rows with document dims + derived
    *     embedding scalars (NULL-extended under LEFT in both engines),
    *     total ORDER BY the unique doc_id;
    *   1 grouped: lang/source/label key, count(*) vs count(e_a) contrast
    *     (counts skip the NULL-extended rows), BIGINT-cast sums from
    *     both sides of the edge;
    *   2 coverage probe (forced LEFT): per-source count(*) /
    *     count(vec_id) / sum(CASE WHEN vec_id IS NULL) — the
    *     matched/unmatched decomposition of the partial edge.
    * Emb-side predicates are drawn only under INNER: a three-valued
    * WHERE over derived columns of the NULL-extended side would silently
    * reduce LEFT to INNER (both engines agree, but the shape would stop
    * testing what it claims to).
    */
  private def docembQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val tov = drawEmbOverride(rnd)
    val shape = rnd.nextInt(3)
    val leftJoin = shape == 2 || rnd.nextBoolean()
    val kw = if (leftJoin) "LEFT JOIN" else "JOIN"
    val docPred =
      if (rnd.nextBoolean()) Some(genPred(rnd, catalog("documents"), version))
      else None
    val embPred =
      if (!leftJoin && rnd.nextBoolean())
        Some(genPred(rnd, catalog("emb"), version))
      else None
    val preds = docPred.toSeq ++ embPred.toSeq
    def tailSql(frag: String): String = {
      val sb = new StringBuilder(s" FROM documents $kw $frag ON (doc_id = vec_id)")
      if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
      sb.result()
    }
    def joined(s: SparkSession, d: String): DataFrame = {
      var j = loadFuzzTable(s, d, "documents").join(tov.load(s, d),
        col("doc_id") === col("vec_id"), if (leftJoin) "left" else "inner")
      preds.foreach(p => j = j.where(p.col))
      j
    }
    def emit(items: Seq[Item], groupBy: Option[String], tag: String): GenQuery = {
      def sqlFor(frag: String): String = {
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        sb ++= tailSql(frag)
        groupBy.foreach(g => sb ++= s" GROUP BY $g")
        sb ++= " ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
        sb.result()
      }
      val build = (s: SparkSession, d: String) => {
        val base = joined(s, d)
        val out = groupBy match {
          case Some(g) =>
            base.groupBy(col(g))
              .agg(items(1).col.as(items(1).alias),
                items.drop(2).map(i => i.col.as(i.alias)): _*)
              .select(col(g).as("k0") +: items.drop(1).map(i => col(i.alias)): _*)
          case None =>
            base.select(items.map(i => i.col.as(i.alias)): _*)
        }
        out.orderBy(col("k0").asc_nulls_first).limit(1000)
      }
      GenQuery(seed, sqlFor(tov.fromDuck), build,
        sparkSqlOpt = Some(sqlFor(tov.fromSpark)),
        mode = s"docemb:$tag:${if (leftJoin) "left" else "inner"}")
    }

    shape match {
      case 0 => // doc_id-keyed projection across the edge
        val dim = Seq("lang", "source")(rnd.nextInt(2))
        val eCol = Seq("e_a", "e_s", "e_q", "e_np")(rnd.nextInt(4))
        val items = Seq(
          Item("k0", "doc_id", col("doc_id")),
          Item("c0", dim, col(dim)),
          Item("c1", eCol, col(eCol)),
          Item("c2", "e_np", col("e_np")))
        emit(items, None, "proj")

      case 1 => // grouped with the count(*) vs count(e_a) contrast
        val g = Seq("lang", "source", "label")(rnd.nextInt(3))
        val items = Seq(
          Item("k0", g, col(g)),
          Item("n", "count(*)", count(lit(1))),
          Item("nn", "count(e_a)", count(col("e_a"))),
          Item("s0", "CAST(sum(n_chars) AS BIGINT)", sum(col("n_chars"))),
          Item("s1", "CAST(sum(e_s) AS BIGINT)", sum(col("e_s"))))
        emit(items, Some(g), "group")

      case _ => // forced-LEFT coverage probe of the partial edge
        val g = Seq("lang", "source")(rnd.nextInt(2))
        val items = Seq(
          Item("k0", g, col(g)),
          Item("n", "count(*)", count(lit(1))),
          Item("m", "count(vec_id)", count(col("vec_id"))),
          Item("u", "CAST(sum(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)",
            sum(when(col("vec_id").isNull, 1).otherwise(0))))
        emit(items, Some(g), "coverage")
    }
  }

  /** v34 dedicated mode: JSON-path extraction — the one typed corpus
    * surface with zero generated coverage until now (events.props rode
    * only the fixed f9/x5/f15/f28 declared entries; VERDICT r14 #3). The
    * decimal saga (r12 HUGEINT, r13 trailing-zero) proved dialect
    * RENDERING boundaries are exactly where the driver's hasher diverges,
    * and JSON extraction is such a boundary: Spark's `get_json_object`
    * vs DuckDB's `json_extract_string` — different names, same scalar
    * semantics (present key → its text, missing key → NULL, nested paths
    * and array indices supported; both verified by the 3-SF sweep). The
    * function-name split lives INSIDE a v16 TableOverride-style
    * dual-dialect FROM fragment; every extracted value surfaces as a
    * plain STRING / TRY_CAST BIGINT column, so everything OUTSIDE the
    * fragment stays ONE shared SQL text.
    *
    * Two sources:
    *  - events.props DIRECT (the real corpus JSON, shape {"k": int}):
    *    $.k int-cast and a drawn absent key → NULL;
    *  - a CONSTRUCTED json view over a drawn base table: the fragment
    *    string-concats a JSON document from corpus columns — ints and
    *    enumerated/alphanumeric strings ONLY, doubles never enter the
    *    text (their cross-engine rendering is exactly the divergence
    *    class this grammar exists to quarantine) — with key "b" and
    *    array "e" PRESENT only off a (pk % m) = r stripe, so
    *    missing-key NULLs are genuine and row-dependent, not constant.
    *    Extracted inside the fragment: $.a int, $.b string
    *    (stripe-NULL), $.c.d nested int, $.e[i] array index
    *    (stripe-NULL), $.zz never-present (always NULL).
    *
    * Three outer shapes over the extracted scalars: keyed projection;
    * extracted value AS the GROUP BY key (count(*) vs count(j_b) NULL
    * contrast — the missing-key rows collect into a genuine NULL group);
    * extracted values in WHERE predicates (IS [NOT] NULL selects exactly
    * the stripe; comparisons reuse the SOURCE column's own corpus
    * literal pool — exact by construction, the extracted text
    * round-trips the integer/enum value unchanged).
    */
  private def jsonQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    import org.apache.spark.sql.types.LongType
    val direct = rnd.nextInt(10) < 3

    if (direct) {
      // ---- events.props direct extraction ----
      val missKey = Seq("missing", "kk", "zz")(rnd.nextInt(3))
      def frag(ex: (String, String) => String): String =
        "(SELECT event_id, user_id, event_type, " +
          s"TRY_CAST(${ex("props", "$.k")} AS BIGINT) AS j_k, " +
          s"${ex("props", "$." + missKey)} AS j_miss FROM events) ev"
      val fragDuck = frag((j, p) => s"json_extract_string($j, '$p')")
      val fragSpark = frag((j, p) => s"get_json_object($j, '$p')")
      def load(s: SparkSession, d: String): DataFrame =
        loadFuzzTable(s, d, "events").select(
          col("event_id"), col("user_id"), col("event_type"),
          get_json_object(col("props"), "$.k").try_cast(LongType).as("j_k"),
          get_json_object(col("props"), "$." + missKey).as("j_miss"))
      // the extracted int's literal pool: profiled props k values 0..99
      val kLits = Seq(7, 25, 42, 61, 87)

      rnd.nextInt(3) match {
        case 0 => // keyed projection
          val items = Seq(
            Item("k0", "event_id", col("event_id")),
            Item("c0", "j_k", col("j_k")),
            Item("c1", "j_miss", col("j_miss")),
            Item("c2", "event_type", col("event_type")))
          def sqlFor(f: String) =
            s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
              s" FROM $f ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sqlFor(fragDuck),
            (s, d) => load(s, d)
              .select(items.map(i => i.col.as(i.alias)): _*)
              .orderBy(col("k0").asc_nulls_first).limit(1000),
            sparkSqlOpt = Some(sqlFor(fragSpark)), mode = "json:direct:proj")

        case 1 => // extracted int AS the GROUP BY key
          val items = Seq(
            Item("k0", "j_k", col("j_k")),
            Item("n", "count(*)", count(lit(1))),
            Item("nm", "count(j_miss)", count(col("j_miss"))),
            Item("s0", "CAST(sum(user_id) AS BIGINT)", sum(col("user_id"))))
          def sqlFor(f: String) =
            s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
              s" FROM $f GROUP BY j_k ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sqlFor(fragDuck),
            (s, d) => load(s, d)
              .groupBy(col("j_k"))
              .agg(items(1).col.as("n"), items(2).col.as("nm"),
                items(3).col.as("s0"))
              .select(col("j_k").as("k0"), col("n"), col("nm"), col("s0"))
              .orderBy(col("k0").asc_nulls_first).limit(1000),
            sparkSqlOpt = Some(sqlFor(fragSpark)), mode = "json:direct:group")

        case _ => // extracted int in WHERE
          val pred = rnd.nextInt(4) match {
            case 0 =>
              val l = kLits(rnd.nextInt(kLits.length))
              P(s"j_k >= $l", col("j_k") >= l)
            case 1 =>
              val l = kLits(rnd.nextInt(kLits.length))
              P(s"j_k < $l", col("j_k") < l)
            case 2 =>
              val picked = rnd.shuffle(kLits.toVector).take(2 + rnd.nextInt(2))
              P(s"j_k IN (${picked.mkString(", ")})",
                col("j_k").isin(picked: _*))
            case _ => P("j_miss IS NULL", col("j_miss").isNull)
          }
          val items = Seq(
            Item("k0", "event_id", col("event_id")),
            Item("c0", "j_k", col("j_k")),
            Item("c1", "user_id", col("user_id")))
          def sqlFor(f: String) =
            s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
              s" FROM $f WHERE ${pred.sql} ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sqlFor(fragDuck),
            (s, d) => load(s, d).where(pred.col)
              .select(items.map(i => i.col.as(i.alias)): _*)
              .orderBy(col("k0").asc_nulls_first).limit(1000),
            sparkSqlOpt = Some(sqlFor(fragSpark)), mode = "json:direct:pred")
      }
    } else {
      // ---- constructed-JSON derived view over a drawn base table ----
      // (table, pk, JSON-safe string cols, int cols): only enumerated /
      // alphanumeric+space string columns enter the JSON text — no
      // quotes, backslashes or control chars exist in these pools, so
      // the constructed document is valid JSON by construction.
      val bases = Vector(
        ("orders", "o_orderkey", Vector("o_orderstatus", "o_orderpriority"),
          Vector("o_custkey")),
        ("customer", "c_custkey", Vector("c_mktsegment"), Vector("c_nationkey")),
        ("part", "p_partkey", Vector("p_brand", "p_type"), Vector("p_size")),
        ("events", "event_id", Vector("event_type"), Vector("user_id")))
      val (t, pk, scs, ics) = bases(rnd.nextInt(bases.length))
      val scName = scs(rnd.nextInt(scs.length))
      val icName = ics(rnd.nextInt(ics.length))
      val sc = catalog(t).find(_.name == scName).get
      val ic = catalog(t).find(_.name == icName).get
      val pkc = catalog(t).find(_.name == pk).get
      val m = 4 + rnd.nextInt(5)
      val r = rnd.nextInt(m)
      val arrIdx = rnd.nextInt(2)

      // Shared-dialect JSON construction (pure || concat + CASE).
      val jsSql =
        s"CASE WHEN ($pk % $m) = $r THEN " +
          s"""'{"a": ' || CAST($icName AS STRING) || ', "c": {"d": ' || CAST($pk AS STRING) || '}}'""" +
          " ELSE " +
          s"""'{"a": ' || CAST($icName AS STRING) || ', "b": "' || $scName || '", "c": {"d": ' || CAST($pk AS STRING) || '}, "e": [' || CAST($pk AS STRING) || ', ' || CAST($icName AS STRING) || ']}'""" +
          " END"
      def frag(ex: (String, String) => String): String =
        s"(SELECT $pk, " +
          s"TRY_CAST(${ex("js", "$.a")} AS BIGINT) AS j_a, " +
          s"${ex("js", "$.b")} AS j_b, " +
          s"TRY_CAST(${ex("js", "$.c.d")} AS BIGINT) AS j_d, " +
          s"TRY_CAST(${ex("js", s"$$.e[$arrIdx]")} AS BIGINT) AS j_e, " +
          s"${ex("js", "$.zz")} AS j_miss " +
          s"FROM (SELECT $pk, $jsSql AS js FROM $t) ${t}_j) $t"
      val fragDuck = frag((j, p) => s"json_extract_string($j, '$p')")
      val fragSpark = frag((j, p) => s"get_json_object($j, '$p')")
      def load(s: SparkSession, d: String): DataFrame = {
        val jsCol = when((col(pk) % m) === r,
          concat(lit("{\"a\": "), col(icName).cast("string"),
            lit(", \"c\": {\"d\": "), col(pk).cast("string"), lit("}}")))
          .otherwise(concat(lit("{\"a\": "), col(icName).cast("string"),
            lit(", \"b\": \""), col(scName),
            lit("\", \"c\": {\"d\": "), col(pk).cast("string"),
            lit("}, \"e\": ["), col(pk).cast("string"), lit(", "),
            col(icName).cast("string"), lit("]}")))
        loadFuzzTable(s, d, t).select(col(pk), jsCol.as("js"))
          .select(col(pk),
            get_json_object(col("js"), "$.a").try_cast(LongType).as("j_a"),
            get_json_object(col("js"), "$.b").as("j_b"),
            get_json_object(col("js"), "$.c.d").try_cast(LongType).as("j_d"),
            get_json_object(col("js"), s"$$.e[$arrIdx]")
              .try_cast(LongType).as("j_e"),
            get_json_object(col("js"), "$.zz").as("j_miss"))
      }
      def jsonPred(): P = rnd.nextInt(6) match {
        case 0 => P("j_b IS NULL", col("j_b").isNull)
        case 1 => P("j_b IS NOT NULL", col("j_b").isNotNull)
        case 2 => // extracted string vs the source column's own literal
          val l = sc.lits(rnd.nextInt(sc.lits.length))
          val op = Seq("=", "<>", ">=", "<")(rnd.nextInt(4))
          val cc = op match {
            case "="  => col("j_b") === l.col
            case "<>" => col("j_b") =!= l.col
            case ">=" => col("j_b") >= l.col
            case _    => col("j_b") < l.col
          }
          P(s"j_b $op ${l.sql}", cc)
        case 3 => // extracted int vs the source column's own literal
          val l = ic.lits(rnd.nextInt(ic.lits.length))
          val op = Seq("<", "<=", ">", ">=")(rnd.nextInt(4))
          val cc = op match {
            case "<"  => col("j_a") < l.col
            case "<=" => col("j_a") <= l.col
            case ">"  => col("j_a") > l.col
            case _    => col("j_a") >= l.col
          }
          P(s"j_a $op ${l.sql}", cc)
        case 4 => P("j_e IS NULL", col("j_e").isNull)
        case _ => // nested int (== pk) vs the pk's literal pool
          val l = pkc.lits(rnd.nextInt(pkc.lits.length))
          P(s"j_d >= ${l.sql}", col("j_d") >= l.col)
      }

      rnd.nextInt(3) match {
        case 0 => // keyed projection of every extracted scalar
          val items = Seq(
            Item("k0", pk, col(pk)),
            Item("c0", "j_a", col("j_a")),
            Item("c1", "j_b", col("j_b")),
            Item("c2", "j_d", col("j_d")),
            Item("c3", "j_e", col("j_e")),
            Item("c4", "j_miss", col("j_miss")))
          def sqlFor(f: String) =
            s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
              s" FROM $f ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sqlFor(fragDuck),
            (s, d) => load(s, d)
              .select(items.map(i => i.col.as(i.alias)): _*)
              .orderBy(col("k0").asc_nulls_first).limit(1000),
            sparkSqlOpt = Some(sqlFor(fragSpark)), mode = s"json:proj:$t")

        case 1 => // extracted value AS the GROUP BY key
          val gkey = Seq("j_b", "j_a", "j_e")(rnd.nextInt(3))
          val items = Seq(
            Item("k0", gkey, col(gkey)),
            Item("n", "count(*)", count(lit(1))),
            Item("nn", "count(j_b)", count(col("j_b"))),
            Item("s0", "CAST(sum(j_d) AS BIGINT)", sum(col("j_d"))))
          def sqlFor(f: String) =
            s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
              s" FROM $f GROUP BY $gkey ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sqlFor(fragDuck),
            (s, d) => load(s, d)
              .groupBy(col(gkey))
              .agg(items(1).col.as("n"), items(2).col.as("nn"),
                items(3).col.as("s0"))
              .select(col(gkey).as("k0"), col("n"), col("nn"), col("s0"))
              .orderBy(col("k0").asc_nulls_first).limit(1000),
            sparkSqlOpt = Some(sqlFor(fragSpark)),
            mode = s"json:group:$t:$gkey")

        case _ => // extracted values in WHERE predicates
          val preds = Vector.fill(1 + rnd.nextInt(2))(jsonPred())
          val items = Seq(
            Item("k0", pk, col(pk)),
            Item("c0", "j_a", col("j_a")),
            Item("c1", "j_b", col("j_b")),
            Item("c2", "j_e", col("j_e")))
          def sqlFor(f: String) =
            s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
              s" FROM $f WHERE ${preds.map(_.sql).mkString(" AND ")}" +
              s" ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sqlFor(fragDuck),
            (s, d) => {
              var df = load(s, d)
              preds.foreach(p => df = df.where(p.col))
              df.select(items.map(i => i.col.as(i.alias)): _*)
                .orderBy(col("k0").asc_nulls_first).limit(1000)
            },
            sparkSqlOpt = Some(sqlFor(fragSpark)), mode = s"json:pred:$t")
      }
    }
  }

  /** v38 dedicated mode: VARIANT typed extraction — Spark 4's
    * parse_json/variant_get semi-structured surface, until now covered by
    * the single fixed f28_variant entry (the v32/v34 lesson: single-entry
    * surfaces hide dialect boundaries; v34 fuzzes get_json_object STRING
    * extraction, not the TYPED variant path). The dialect split lives
    * inside a v16 TableOverride-style dual-rendered FROM fragment: Spark
    * renders `variant_get(parse_json(js), '$.p', '<type>')` (parse cost
    * once per row, binary-encoded variant, codegen'd typed extraction —
    * the scale default for heterogeneous props); DuckDB renders
    * `TRY_CAST(json_extract_string(js, '$.p') AS <TYPE>)`. Every
    * extracted value surfaces as a plain BIGINT / STRING / BOOLEAN
    * column, so everything OUTSIDE the fragment stays ONE shared text.
    *
    * Sources (the v34 constructed-JSON doctrine: ints, enumerated
    * strings, and JSON booleans only — doubles never enter the document
    * text, their cross-engine rendering being the quarantined divergence
    * class):
    *  - events.props DIRECT (~30%): $.k extracted as bigint AND as
    *    string (number→text renders identically in both engines — the
    *    f28-proven fact), plus a drawn never-present key through
    *    try_variant_get → NULL;
    *  - CONSTRUCTED document over a drawn base table: $.a int; $.b
    *    string, $.e[i] array-index int, and $.f JSON BOOLEAN present
    *    only OFF a (pk % m) = r stripe (missing-key NULLs genuine and
    *    row-dependent); $.c.d nested int; $.zz never present. The
    *    boolean ((ic % 2) = 0 rendered as literal true/false) is the
    *    typed surface v34 never drew: variant_get(..., 'boolean') vs
    *    DuckDB CAST('true' AS BOOLEAN).
    *
    * Shapes: keyed projection of every extracted scalar; an extracted
    * value AS the GROUP BY key — including the BOOLEAN j_f with its
    * true/false/NULL three-group split — with count(*) vs count(j_b)
    * NULL contrasts; extracted values in WHERE (boolean equality, IS
    * NULL stripe selection, int comparisons against the SOURCE column's
    * own corpus literal pool — exact by construction, the extracted text
    * round-trips the integer/enum value unchanged).
    */
  /** Grammar v39: XML round-trip extraction — Spark-4 native `from_xml`
    * over a CONSTRUCTED document (the f26 lossless-parse differential,
    * seeded). Each draw renders corpus scalars into an XML text inside
    * the view — drawn base table, int-as-attribute vs int-as-element, a
    * nested element, a repeated element (ARRAY extraction by drawn
    * index), and a 1-in-m stripe that OMITS an optional element (typed
    * NULL on extraction) — then extracts typed fields with from_xml on
    * the Spark side. DuckDB has no XML, so its frag computes the same
    * values from the RAW columns: the differential pins that render →
    * parse is lossless across document shapes, type coercions, attribute
    * naming (`_a` prefix), array indexing, and missing-element NULLs.
    * String pools are the v34/v38 XML/JSON-safe enumerated columns (no
    * `&<>` anywhere in the corpus values, so the document is well-formed
    * by construction).
    */
  private def xmlQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val bases = Vector(
      ("orders", "o_orderkey", Vector("o_orderstatus", "o_orderpriority"),
        Vector("o_custkey")),
      ("customer", "c_custkey", Vector("c_mktsegment"), Vector("c_nationkey")),
      ("part", "p_partkey", Vector("p_brand", "p_type"), Vector("p_size")),
      ("events", "event_id", Vector("event_type"), Vector("user_id")))
    val (t, pk, scs, ics) = bases(rnd.nextInt(bases.length))
    val scName = scs(rnd.nextInt(scs.length))
    val icName = ics(rnd.nextInt(ics.length))
    val sc = catalog(t).find(_.name == scName).get
    val ic = catalog(t).find(_.name == icName).get
    val pkc = catalog(t).find(_.name == pk).get
    val m = 4 + rnd.nextInt(5)
    val r = rnd.nextInt(m)
    val intAsAttr = rnd.nextBoolean()
    val arrIdx = 1 + rnd.nextInt(2) // element_at is 1-based

    // document: <rec [a="IC"]><s>SC</s>[<v>IC</v>]<n><d>PK</d></n>
    //           <i>PK</i><i>IC</i>[<opt>IC</opt> off-stripe]</rec>
    val xmlSql =
      (if (intAsAttr) s"""'<rec a="' || CAST($icName AS STRING) || '">'"""
       else s"'<rec>' || '<v>' || CAST($icName AS STRING) || '</v>'") +
        s" || '<s>' || $scName || '</s>'" +
        s" || '<n><d>' || CAST($pk AS STRING) || '</d></n>'" +
        s" || '<i>' || CAST($pk AS STRING) || '</i><i>' || CAST($icName AS STRING) || '</i>'" +
        s" || CASE WHEN ($pk % $m) = $r THEN '' ELSE '<opt>' || CAST($icName AS STRING) || '</opt>' END" +
        " || '</rec>'"
    val intField = if (intAsAttr) "_a" else "v"
    val schema =
      s"$intField BIGINT, s STRING, n STRUCT<d: BIGINT>, i ARRAY<BIGINT>, opt BIGINT"

    // Spark frag: construct + from_xml + typed extraction; the DuckDB
    // frag computes the SAME values from the raw scalars (no XML engine)
    val fragSpark =
      s"(SELECT $pk, xr.$intField AS x_a, xr.s AS x_s, xr.n.d AS x_d, " +
        s"element_at(xr.i, $arrIdx) AS x_e, xr.opt AS x_opt " +
        s"FROM (SELECT $pk, from_xml(x, '$schema') AS xr " +
        s"FROM (SELECT $pk, $xmlSql AS x FROM $t) ${t}_x) ${t}_p) $t"
    val fragDuck =
      s"(SELECT $pk, CAST($icName AS BIGINT) AS x_a, $scName AS x_s, " +
        s"CAST($pk AS BIGINT) AS x_d, " +
        s"CAST(${if (arrIdx == 1) pk else icName} AS BIGINT) AS x_e, " +
        s"CASE WHEN ($pk % $m) = $r THEN NULL ELSE CAST($icName AS BIGINT) END AS x_opt " +
        s"FROM $t) $t"
    def load(s: SparkSession, d: String): DataFrame = {
      val openCol =
        if (intAsAttr) concat(lit("<rec a=\""), col(icName).cast("string"), lit("\">"))
        else concat(lit("<rec><v>"), col(icName).cast("string"), lit("</v>"))
      val xCol = concat(openCol,
        lit("<s>"), col(scName), lit("</s>"),
        lit("<n><d>"), col(pk).cast("string"), lit("</d></n>"),
        lit("<i>"), col(pk).cast("string"), lit("</i><i>"),
        col(icName).cast("string"), lit("</i>"),
        when((col(pk) % m) === r, lit(""))
          .otherwise(concat(lit("<opt>"), col(icName).cast("string"), lit("</opt>"))),
        lit("</rec>"))
      loadFuzzTable(s, d, t).select(col(pk), xCol.as("x"))
        .select(col(pk), from_xml(col("x"), lit(schema)).as("xr"))
        .select(col(pk),
          col(s"xr.$intField").as("x_a"), col("xr.s").as("x_s"),
          col("xr.n.d").as("x_d"),
          element_at(col("xr.i"), arrIdx).as("x_e"),
          col("xr.opt").as("x_opt"))
    }
    def xmlPred(): P = rnd.nextInt(5) match {
      case 0 => P("x_opt IS NULL", col("x_opt").isNull)
      case 1 => P("x_opt IS NOT NULL", col("x_opt").isNotNull)
      case 2 => // extracted int vs the source column's own literal pool
        val l = ic.lits(rnd.nextInt(ic.lits.length))
        val op = Seq("<", "<=", ">", ">=")(rnd.nextInt(4))
        val cc = op match {
          case "<"  => col("x_a") < l.col
          case "<=" => col("x_a") <= l.col
          case ">"  => col("x_a") > l.col
          case _    => col("x_a") >= l.col
        }
        P(s"x_a $op ${l.sql}", cc)
      case 3 => // extracted string vs the source column's own literal
        val l = sc.lits(rnd.nextInt(sc.lits.length))
        P(s"x_s = ${l.sql}", col("x_s") === l.col)
      case _ => // nested int (== pk) vs the pk's literal pool
        val l = pkc.lits(rnd.nextInt(pkc.lits.length))
        P(s"x_d >= ${l.sql}", col("x_d") >= l.col)
    }

    rnd.nextInt(3) match {
      case 0 => // keyed projection of every extracted field
        def sqlFor(f: String) =
          s"SELECT $pk AS k0, x_a AS c0, x_s AS c1, x_d AS c2, x_e AS c3, " +
            s"x_opt AS c4 FROM $f ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
        GenQuery(seed, sqlFor(fragDuck),
          (s, d) => load(s, d)
            .select(col(pk).as("k0"), col("x_a").as("c0"), col("x_s").as("c1"),
              col("x_d").as("c2"), col("x_e").as("c3"), col("x_opt").as("c4"))
            .orderBy(col("k0").asc_nulls_first).limit(1000),
          sparkSqlOpt = Some(sqlFor(fragSpark)), mode = s"xml:proj:$t")

      case 1 => // an extracted field AS the GROUP BY key
        val gkey = Seq("x_s", "x_a")(rnd.nextInt(2))
        def sqlFor(f: String) =
          s"SELECT $gkey AS k0, count(*) AS n, count(x_opt) AS nn, " +
            s"CAST(sum(x_d) AS BIGINT) AS s0 FROM $f " +
            s"GROUP BY $gkey ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
        GenQuery(seed, sqlFor(fragDuck),
          (s, d) => load(s, d)
            .groupBy(col(gkey))
            .agg(count(lit(1)).as("n"), count(col("x_opt")).as("nn"),
              sum(col("x_d")).as("s0"))
            .select(col(gkey).as("k0"), col("n"), col("nn"), col("s0"))
            .orderBy(col("k0").asc_nulls_first).limit(1000),
          sparkSqlOpt = Some(sqlFor(fragSpark)), mode = s"xml:group:$t:$gkey")

      case _ => // extracted fields in WHERE predicates
        val preds = Vector.fill(1 + rnd.nextInt(2))(xmlPred())
        def sqlFor(f: String) =
          s"SELECT $pk AS k0, x_a AS c0, x_s AS c1, x_opt AS c2 " +
            s"FROM $f WHERE ${preds.map(_.sql).mkString(" AND ")}" +
            s" ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
        GenQuery(seed, sqlFor(fragDuck),
          (s, d) => {
            var df = load(s, d)
            preds.foreach(p => df = df.where(p.col))
            df.select(col(pk).as("k0"), col("x_a").as("c0"),
              col("x_s").as("c1"), col("x_opt").as("c2"))
              .orderBy(col("k0").asc_nulls_first).limit(1000)
          },
          sparkSqlOpt = Some(sqlFor(fragSpark)), mode = s"xml:pred:$t")
    }
  }

  private def variantQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    import org.apache.spark.sql.types.LongType
    // one typed extraction, rendered per dialect
    def exS(j: String, p: String, t: String): String =
      s"variant_get(parse_json($j), '$p', '$t')"
    def exD(j: String, p: String, t: String): String = t match {
      case "string" => s"json_extract_string($j, '$p')"
      case tt => s"TRY_CAST(json_extract_string($j, '$p') AS ${tt.toUpperCase})"
    }
    val direct = rnd.nextInt(10) < 3

    if (direct) {
      // ---- events.props direct typed extraction ----
      val missKey = Seq("missing", "kk", "zz")(rnd.nextInt(3))
      def frag(ex: (String, String, String) => String, tryS: String): String =
        "(SELECT event_id, user_id, event_type, " +
          s"${ex("props", "$.k", "bigint")} AS j_k, " +
          s"${ex("props", "$.k", "string")} AS j_ks, " +
          s"$tryS AS j_miss FROM events) ev"
      val fragDuck = frag(exD, exD("props", "$." + missKey, "bigint"))
      val fragSpark = frag(exS,
        s"try_variant_get(parse_json(props), '$$.$missKey', 'bigint')")
      def load(s: SparkSession, d: String): DataFrame =
        loadFuzzTable(s, d, "events").select(
          col("event_id"), col("user_id"), col("event_type"),
          expr(exS("props", "$.k", "bigint")).as("j_k"),
          expr(exS("props", "$.k", "string")).as("j_ks"),
          expr(s"try_variant_get(parse_json(props), '$$.$missKey', 'bigint')")
            .as("j_miss"))
      val kLits = Seq(7, 25, 42, 61, 87) // profiled props k values 0..99

      rnd.nextInt(3) match {
        case 0 => // keyed projection
          def sqlFor(f: String) =
            "SELECT event_id AS k0, j_k AS c0, j_ks AS c1, j_miss AS c2, " +
              s"event_type AS c3 FROM $f ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sqlFor(fragDuck),
            (s, d) => load(s, d)
              .select(col("event_id").as("k0"), col("j_k").as("c0"),
                col("j_ks").as("c1"), col("j_miss").as("c2"),
                col("event_type").as("c3"))
              .orderBy(col("k0").asc_nulls_first).limit(1000),
            sparkSqlOpt = Some(sqlFor(fragSpark)), mode = "variant:direct:proj")

        case 1 => // extracted bigint AS the GROUP BY key
          def sqlFor(f: String) =
            "SELECT j_k AS k0, count(*) AS n, count(j_miss) AS nm, " +
              s"CAST(sum(user_id) AS BIGINT) AS s0 FROM $f " +
              "GROUP BY j_k ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sqlFor(fragDuck),
            (s, d) => load(s, d)
              .groupBy(col("j_k"))
              .agg(count(lit(1)).as("n"), count(col("j_miss")).as("nm"),
                sum(col("user_id")).as("s0"))
              .select(col("j_k").as("k0"), col("n"), col("nm"), col("s0"))
              .orderBy(col("k0").asc_nulls_first).limit(1000),
            sparkSqlOpt = Some(sqlFor(fragSpark)), mode = "variant:direct:group")

        case _ => // extracted bigint in WHERE
          val pred = rnd.nextInt(4) match {
            case 0 =>
              val l = kLits(rnd.nextInt(kLits.length))
              P(s"j_k >= $l", col("j_k") >= l)
            case 1 =>
              val l = kLits(rnd.nextInt(kLits.length))
              P(s"j_k < $l", col("j_k") < l)
            case 2 =>
              val picked = rnd.shuffle(kLits.toVector).take(2 + rnd.nextInt(2))
              P(s"j_k IN (${picked.mkString(", ")})",
                col("j_k").isin(picked: _*))
            case _ => P("j_miss IS NULL", col("j_miss").isNull)
          }
          def sqlFor(f: String) =
            "SELECT event_id AS k0, j_k AS c0, user_id AS c1 " +
              s"FROM $f WHERE ${pred.sql} ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sqlFor(fragDuck),
            (s, d) => load(s, d).where(pred.col)
              .select(col("event_id").as("k0"), col("j_k").as("c0"),
                col("user_id").as("c1"))
              .orderBy(col("k0").asc_nulls_first).limit(1000),
            sparkSqlOpt = Some(sqlFor(fragSpark)), mode = "variant:direct:pred")
      }
    } else {
      // ---- constructed-JSON derived view over a drawn base table ----
      // (same JSON-safe column pools as v34: enumerated / alphanumeric
      // strings only, so the document is valid JSON by construction)
      val bases = Vector(
        ("orders", "o_orderkey", Vector("o_orderstatus", "o_orderpriority"),
          Vector("o_custkey")),
        ("customer", "c_custkey", Vector("c_mktsegment"), Vector("c_nationkey")),
        ("part", "p_partkey", Vector("p_brand", "p_type"), Vector("p_size")),
        ("events", "event_id", Vector("event_type"), Vector("user_id")))
      val (t, pk, scs, ics) = bases(rnd.nextInt(bases.length))
      val scName = scs(rnd.nextInt(scs.length))
      val icName = ics(rnd.nextInt(ics.length))
      val sc = catalog(t).find(_.name == scName).get
      val ic = catalog(t).find(_.name == icName).get
      val pkc = catalog(t).find(_.name == pk).get
      val m = 4 + rnd.nextInt(5)
      val r = rnd.nextInt(m)
      val arrIdx = rnd.nextInt(2)

      // Shared-dialect JSON construction (pure || concat + CASE); the
      // boolean field renders as a JSON literal true/false off-stripe.
      val boolSql = s"CASE WHEN ($icName % 2) = 0 THEN 'true' ELSE 'false' END"
      val jsSql =
        s"CASE WHEN ($pk % $m) = $r THEN " +
          s"""'{"a": ' || CAST($icName AS STRING) || ', "c": {"d": ' || CAST($pk AS STRING) || '}}'""" +
          " ELSE " +
          s"""'{"a": ' || CAST($icName AS STRING) || ', "b": "' || $scName || '", "c": {"d": ' || CAST($pk AS STRING) || '}, "e": [' || CAST($pk AS STRING) || ', ' || CAST($icName AS STRING) || '], "f": ' || $boolSql || '}'""" +
          " END"
      def frag(ex: (String, String, String) => String): String =
        s"(SELECT $pk, " +
          s"${ex("js", "$.a", "bigint")} AS j_a, " +
          s"${ex("js", "$.b", "string")} AS j_b, " +
          s"${ex("js", "$.c.d", "bigint")} AS j_d, " +
          s"${ex("js", s"$$.e[$arrIdx]", "bigint")} AS j_e, " +
          s"${ex("js", "$.f", "boolean")} AS j_f, " +
          s"${ex("js", "$.zz", "string")} AS j_miss " +
          s"FROM (SELECT $pk, $jsSql AS js FROM $t) ${t}_j) $t"
      val fragDuck = frag(exD)
      val fragSpark = frag(exS)
      def load(s: SparkSession, d: String): DataFrame = {
        val boolCol = when((col(icName) % 2) === 0, "true").otherwise("false")
        val jsCol = when((col(pk) % m) === r,
          concat(lit("{\"a\": "), col(icName).cast("string"),
            lit(", \"c\": {\"d\": "), col(pk).cast("string"), lit("}}")))
          .otherwise(concat(lit("{\"a\": "), col(icName).cast("string"),
            lit(", \"b\": \""), col(scName),
            lit("\", \"c\": {\"d\": "), col(pk).cast("string"),
            lit("}, \"e\": ["), col(pk).cast("string"), lit(", "),
            col(icName).cast("string"), lit("], \"f\": "), boolCol, lit("}")))
        loadFuzzTable(s, d, t).select(col(pk), jsCol.as("js"))
          .select(col(pk),
            expr(exS("js", "$.a", "bigint")).as("j_a"),
            expr(exS("js", "$.b", "string")).as("j_b"),
            expr(exS("js", "$.c.d", "bigint")).as("j_d"),
            expr(exS("js", s"$$.e[$arrIdx]", "bigint")).as("j_e"),
            expr(exS("js", "$.f", "boolean")).as("j_f"),
            expr(exS("js", "$.zz", "string")).as("j_miss"))
      }
      def variantPred(): P = rnd.nextInt(7) match {
        case 0 => P("j_b IS NULL", col("j_b").isNull)
        case 1 => P("j_b IS NOT NULL", col("j_b").isNotNull)
        case 2 => // the boolean surface: equality selects a genuine subset
          val v = rnd.nextBoolean()
          P(s"j_f = $v", col("j_f") === v)
        case 3 => P("j_f IS NULL", col("j_f").isNull)
        case 4 => // extracted int vs the source column's own literal
          val l = ic.lits(rnd.nextInt(ic.lits.length))
          val op = Seq("<", "<=", ">", ">=")(rnd.nextInt(4))
          val cc = op match {
            case "<"  => col("j_a") < l.col
            case "<=" => col("j_a") <= l.col
            case ">"  => col("j_a") > l.col
            case _    => col("j_a") >= l.col
          }
          P(s"j_a $op ${l.sql}", cc)
        case 5 => // extracted string vs the source column's own literal
          val l = sc.lits(rnd.nextInt(sc.lits.length))
          P(s"j_b = ${l.sql}", col("j_b") === l.col)
        case _ => // nested int (== pk) vs the pk's literal pool
          val l = pkc.lits(rnd.nextInt(pkc.lits.length))
          P(s"j_d >= ${l.sql}", col("j_d") >= l.col)
      }

      rnd.nextInt(3) match {
        case 0 => // keyed projection of every extracted scalar
          def sqlFor(f: String) =
            s"SELECT $pk AS k0, j_a AS c0, j_b AS c1, j_d AS c2, " +
              s"j_e AS c3, j_f AS c4, j_miss AS c5 " +
              s"FROM $f ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sqlFor(fragDuck),
            (s, d) => load(s, d)
              .select(col(pk).as("k0"), col("j_a").as("c0"),
                col("j_b").as("c1"), col("j_d").as("c2"),
                col("j_e").as("c3"), col("j_f").as("c4"),
                col("j_miss").as("c5"))
              .orderBy(col("k0").asc_nulls_first).limit(1000),
            sparkSqlOpt = Some(sqlFor(fragSpark)), mode = s"variant:proj:$t")

        case 1 => // extracted value AS the GROUP BY key (incl. boolean)
          val gkey = Seq("j_b", "j_f", "j_a")(rnd.nextInt(3))
          def sqlFor(f: String) =
            s"SELECT $gkey AS k0, count(*) AS n, count(j_b) AS nn, " +
              s"CAST(sum(j_d) AS BIGINT) AS s0 FROM $f " +
              s"GROUP BY $gkey ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sqlFor(fragDuck),
            (s, d) => load(s, d)
              .groupBy(col(gkey))
              .agg(count(lit(1)).as("n"), count(col("j_b")).as("nn"),
                sum(col("j_d")).as("s0"))
              .select(col(gkey).as("k0"), col("n"), col("nn"), col("s0"))
              .orderBy(col("k0").asc_nulls_first).limit(1000),
            sparkSqlOpt = Some(sqlFor(fragSpark)),
            mode = s"variant:group:$t:$gkey")

        case _ => // extracted values in WHERE predicates
          val preds = Vector.fill(1 + rnd.nextInt(2))(variantPred())
          def sqlFor(f: String) =
            s"SELECT $pk AS k0, j_a AS c0, j_b AS c1, j_f AS c2 " +
              s"FROM $f WHERE ${preds.map(_.sql).mkString(" AND ")}" +
              s" ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sqlFor(fragDuck),
            (s, d) => {
              var df = load(s, d)
              preds.foreach(p => df = df.where(p.col))
              df.select(col(pk).as("k0"), col("j_a").as("c0"),
                col("j_b").as("c1"), col("j_f").as("c2"))
                .orderBy(col("k0").asc_nulls_first).limit(1000)
            },
            sparkSqlOpt = Some(sqlFor(fragSpark)), mode = s"variant:pred:$t")
      }
    }
  }

  /** v37 dedicated mode: multimodal META scalars — the documents table
    * re-shaped as the media-metadata view the multimodal suite's fixed
    * queries consume (mm_binary_meta's byte length / first byte,
    * mm_frame_sample's frame count, MultimodalQueries.scala:29,71), the
    * one derived-column family with zero generated coverage before r16
    * (the v32 lesson: partial-coverage edges hide genuine semantics — the
    * binary PAYLOAD is not DuckDB-portable, but every META column is a
    * plain scalar). Per-seed draws: frame size F ∈ {32,64,128} chars,
    * sampling stride S ∈ {2,3,4}, a format-tag modulus M ∈ {3,4,5}, a
    * meta predicate, and one of three shapes. The derived view (the v16
    * TableOverride pattern):
    *
    *   n_bytes     = octet_length(text)           — the ONE dialect split:
    *                 DuckDB needs encode() first (its octet_length takes
    *                 BLOB), Spark takes STRING directly; both count UTF-8
    *                 bytes of the same parquet value
    *   first_byte  = ascii(substr(text, 1, 1))    — shared dialect
    *   n_frames    = greatest(ceil(length(text)/F), 1) — mm_frame_sample's
    *                 frame count (length() = CHARACTERS in both engines)
    *   kept_frames = ceil(n_frames/S)              — frames a stride-S
    *                 sampler keeps (#{f < n_frames : f % S = 0})
    *   fmt         = CASE n_bytes % M → 'png'/'jpeg'/'webp' — a synthetic
    *                 format tag making the meta surface groupable
    *
    * All integer-exact: ceil() of a small-int / small-double division is
    * exact in IEEE double well past these magnitudes; %, greatest and
    * CASE are shared dialect. Shapes: per-format grouped aggregates
    * (count / summed kept_frames / min-max byte stats), a first_byte
    * histogram (the ascii distribution), and a keyed meta projection
    * under a drawn predicate with a total ORDER BY + LIMIT.
    */
  private def mediaMetaQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val f = Vector(32, 64, 128)(rnd.nextInt(3))
    val s = Vector(2, 3, 4)(rnd.nextInt(3))
    val m = Vector(3, 4, 5)(rnd.nextInt(3))

    def innerFrom(octet: String): String =
      s"(SELECT doc_id, n_bytes, first_byte, n_frames, " +
        s"CAST(ceil(n_frames / $s.0) AS BIGINT) AS kept_frames, " +
        s"CASE WHEN n_bytes % $m = 0 THEN 'png' " +
        s"WHEN n_bytes % $m = 1 THEN 'jpeg' ELSE 'webp' END AS fmt " +
        s"FROM (SELECT doc_id, CAST($octet AS BIGINT) AS n_bytes, " +
        s"CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte, " +
        s"greatest(CAST(ceil(length(text) / $f.0) AS BIGINT), " +
        s"CAST(1 AS BIGINT)) AS n_frames FROM documents) b) media"
    val fromDuck = innerFrom("octet_length(encode(text))")
    val fromSpark = innerFrom("octet_length(text)")
    val load = (sp: SparkSession, d: String) => {
      val base = loadFuzzTable(sp, d, "documents").select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"),
        greatest(ceil(length(col("text")) / lit(f.toDouble)).cast("long"),
          lit(1L)).as("n_frames"))
      base.select(col("doc_id"), col("n_bytes"), col("first_byte"),
        col("n_frames"),
        ceil(col("n_frames") / lit(s.toDouble)).cast("long").as("kept_frames"),
        when(col("n_bytes") % m === 0, "png")
          .when(col("n_bytes") % m === 1, "jpeg")
          .otherwise("webp").as("fmt"))
    }

    // meta predicate pool (applies to all shapes; bounds sized to the
    // corpus envelope — 10-99 words × short vocab ≈ 40-700 bytes — so
    // draws stay non-empty-capable at every SF)
    val (predSql, predCol): (String, Column) = rnd.nextInt(5) match {
      case 0 =>
        val lo = Vector(100, 200, 300)(rnd.nextInt(3))
        val hi = lo + Vector(150, 250, 350)(rnd.nextInt(3))
        (s"n_bytes BETWEEN $lo AND $hi",
          col("n_bytes").between(lo, hi))
      case 1 =>
        val v = Vector(2L, 3L)(rnd.nextInt(2))
        (s"n_frames >= $v", col("n_frames") >= v)
      case 2 =>
        val tag = Vector("png", "jpeg", "webp")(rnd.nextInt(3))
        (s"fmt <> '$tag'", col("fmt") =!= tag)
      case 3 =>
        val v = Vector(98L, 106L, 116L)(rnd.nextInt(3)) // around a-z ascii
        (s"first_byte < $v", col("first_byte") < v)
      case _ =>
        val v = Vector(1L, 2L)(rnd.nextInt(2))
        (s"kept_frames > $v", col("kept_frames") > v)
    }

    rnd.nextInt(3) match {
      case 0 => // per-format grouped aggregates
        val sql =
          s"SELECT fmt AS k0, count(*) AS n, " +
            s"CAST(sum(kept_frames) AS BIGINT) AS sk, " +
            s"min(first_byte) AS mn, max(n_bytes) AS mx " +
            s"FROM $fromDuck WHERE $predSql " +
            s"GROUP BY fmt ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
        val spkSql = sql.replace(fromDuck, fromSpark)
        GenQuery(seed, sql,
          (sp, d) => load(sp, d).where(predCol)
            .groupBy(col("fmt").as("k0"))
            .agg(count(lit(1)).as("n"),
              sum(col("kept_frames")).as("sk"),
              min(col("first_byte")).as("mn"),
              max(col("n_bytes")).as("mx"))
            .select(col("k0"), col("n"), col("sk"), col("mn"), col("mx"))
            .orderBy(col("k0").asc_nulls_first).limit(1000),
          sparkSqlOpt = Some(spkSql),
          mode = s"media:group:f$f:s$s")
      case 1 => // first_byte histogram
        val sql =
          s"SELECT first_byte AS k0, count(*) AS n, " +
            s"CAST(sum(n_bytes) AS BIGINT) AS sb, " +
            s"CAST(sum(n_frames) AS BIGINT) AS sf " +
            s"FROM $fromDuck WHERE $predSql " +
            s"GROUP BY first_byte ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
        val spkSql = sql.replace(fromDuck, fromSpark)
        GenQuery(seed, sql,
          (sp, d) => load(sp, d).where(predCol)
            .groupBy(col("first_byte").as("k0"))
            .agg(count(lit(1)).as("n"),
              sum(col("n_bytes")).as("sb"),
              sum(col("n_frames")).as("sf"))
            .select(col("k0"), col("n"), col("sb"), col("sf"))
            .orderBy(col("k0").asc_nulls_first).limit(1000),
          sparkSqlOpt = Some(spkSql),
          mode = s"media:hist:f$f:s$s")
      case _ => // keyed meta projection
        val sql =
          s"SELECT doc_id AS k0, n_bytes, n_frames, kept_frames, fmt " +
            s"FROM $fromDuck WHERE $predSql " +
            s"ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
        val spkSql = sql.replace(fromDuck, fromSpark)
        GenQuery(seed, sql,
          (sp, d) => load(sp, d).where(predCol)
            .select(col("doc_id").as("k0"), col("n_bytes"), col("n_frames"),
              col("kept_frames"), col("fmt"))
            .orderBy(col("k0").asc_nulls_first).limit(1000),
          sparkSqlOpt = Some(spkSql),
          mode = s"media:proj:f$f:s$s")
    }
  }

  /** v36 dedicated mode: RANGE / BAND joins — the one JOIN-condition class
    * no older grammar draws (every generated join is pure FK equality;
    * the fixed j8 form was the only range-join coverage). Every draw
    * anchors the band on an EQUALITY key, so both engines plan a hash /
    * sort-merge join with the band as a join filter — never a nested
    * loop (the plan-signature gate pins this for the frozen slice), which
    * is also the only shape that survives 100 TB. Three chain templates:
    *
    *   - orders ⋈ lineitem on the FK plus a TEMPORAL band
    *     `l_shipdate BETWEEN o_orderdate + INTERVAL lo DAY AND
    *      o_orderdate + INTERVAL hi DAY` (the corpus ships l_shipdate
    *     1..~120 days after o_orderdate, so drawn bands genuinely split
    *     matched from unmatched; shared unquoted INTERVAL syntax — the
    *     v22 portability fact);
    *   - events SELF-join (event_id parity split) on user_id plus a
    *     two-sided ts band `r.ts BETWEEN l.ts - INTERVAL a HOUR AND
    *     l.ts + INTERVAL b HOUR` — the batch analogue of streaming v5;
    *   - part ⋈ lineitem on the FK plus a NUMERIC band
    *     `l_extendedprice BETWEEN p_retailprice * lo AND
    *      p_retailprice * hi` (double × int literal is one IEEE multiply
    *     — deterministic in both engines; comparisons over doubles are
    *     exact, the grammar-wide rule).
    *
    * INNER and LEFT kinds (LEFT misses are genuine — produced by the
    * BAND, not by key containment, which no older LEFT draw could do
    * without NULL injection). Output shapes: grouped counts with the
    * count(*) vs count(right-key) LEFT contrast, and keyed projections
    * under a total ORDER BY + LIMIT.
    */
  private def rangeJoinQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val template = rnd.nextInt(3)
    val left = rnd.nextInt(10) < 4
    val kind = if (left) "LEFT JOIN" else "JOIN"

    // (fromSql, dfJoin, head-groupable (sqlName, col), head pk, right pk)
    val (fromSql, joined, grpCol, headPk, rightPk): (String,
        (SparkSession, String) => DataFrame, (String, Column), String, String) =
      template match {
        case 0 => // orders ⋈ lineitem, temporal day band
          val lo = Vector(0, 15, 30)(rnd.nextInt(3))
          val hi = lo + Vector(30, 60, 120)(rnd.nextInt(3))
          val from =
            s"orders $kind lineitem ON l_orderkey = o_orderkey AND " +
              s"l_shipdate BETWEEN o_orderdate + INTERVAL $lo DAY " +
              s"AND o_orderdate + INTERVAL $hi DAY"
          val build = (s: SparkSession, d: String) => {
            val o = loadFuzzTable(s, d, "orders")
            val l = loadFuzzTable(s, d, "lineitem")
            o.join(l, l("l_orderkey") === o("o_orderkey") &&
              l("l_shipdate").between(
                o("o_orderdate") + expr(s"INTERVAL $lo DAY"),
                o("o_orderdate") + expr(s"INTERVAL $hi DAY")),
              if (left) "left" else "inner")
          }
          (from, build, ("o_orderstatus", col("o_orderstatus")),
            "o_orderkey", "l_linenumber")

        case 1 => // events self-join, two-sided hour band on user_id
          val a = Vector(0, 2, 6)(rnd.nextInt(3))
          val b = Vector(1, 6, 24)(rnd.nextInt(3))
          val from =
            "(SELECT event_id AS l_id, user_id AS l_uid, ts AS l_ts, " +
              "event_type AS l_type FROM events WHERE (event_id % 2) = 0) le " +
              s"$kind (SELECT event_id AS r_id, user_id AS r_uid, ts AS r_ts " +
              "FROM events WHERE (event_id % 2) = 1) re " +
              "ON r_uid = l_uid AND " +
              s"r_ts BETWEEN l_ts - INTERVAL $a HOUR AND l_ts + INTERVAL $b HOUR"
          val build = (s: SparkSession, d: String) => {
            val ev = loadFuzzTable(s, d, "events")
            val le = ev.where((col("event_id") % 2) === 0).select(
              col("event_id").as("l_id"), col("user_id").as("l_uid"),
              col("ts").as("l_ts"), col("event_type").as("l_type"))
            val re = ev.where((col("event_id") % 2) === 1).select(
              col("event_id").as("r_id"), col("user_id").as("r_uid"),
              col("ts").as("r_ts"))
            le.join(re, col("r_uid") === col("l_uid") &&
              col("r_ts").between(
                col("l_ts") - expr(s"INTERVAL $a HOUR"),
                col("l_ts") + expr(s"INTERVAL $b HOUR")),
              if (left) "left" else "inner")
          }
          (from, build, ("l_type", col("l_type")), "l_id", "r_id")

        case _ => // part ⋈ lineitem, numeric multiple band
          val lo = Vector(1, 2, 5)(rnd.nextInt(3))
          val hi = lo + Vector(10, 40, 80)(rnd.nextInt(3))
          val from =
            s"part $kind lineitem ON l_partkey = p_partkey AND " +
              s"l_extendedprice BETWEEN p_retailprice * $lo " +
              s"AND p_retailprice * $hi"
          val build = (s: SparkSession, d: String) => {
            val p = loadFuzzTable(s, d, "part")
            val l = loadFuzzTable(s, d, "lineitem")
            p.join(l, l("l_partkey") === p("p_partkey") &&
              l("l_extendedprice").between(
                p("p_retailprice") * lo, p("p_retailprice") * hi),
              if (left) "left" else "inner")
          }
          (from, build, ("p_brand", col("p_brand")), "p_partkey", "l_linenumber")
      }

    if (rnd.nextInt(2) == 0) {
      // grouped counts: the LEFT count(*) vs count(right-key) contrast is
      // the band-miss detector (NULL right keys skip count(col))
      val (gSql, gCol) = grpCol
      val sql =
        s"SELECT $gSql AS k0, count(*) AS n, count($rightPk) AS nm " +
          s"FROM $fromSql GROUP BY $gSql ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
      GenQuery(seed, sql,
        (s, d) => joined(s, d)
          .groupBy(gCol.as("k0"))
          .agg(count(lit(1)).as("n"), count(col(rightPk)).as("nm"))
          .select(col("k0"), col("n"), col("nm"))
          .orderBy(col("k0").asc_nulls_first).limit(1000),
        mode = s"range:group:$template:${if (left) "left" else "inner"}")
    } else {
      // keyed projection under a total ORDER BY (both pks) + LIMIT
      val sql =
        s"SELECT $headPk AS k0, $rightPk AS k1 FROM $fromSql " +
          s"ORDER BY k0 ASC NULLS FIRST, k1 ASC NULLS FIRST LIMIT 1000"
      GenQuery(seed, sql,
        (s, d) => joined(s, d)
          .select(col(headPk).as("k0"), col(rightPk).as("k1"))
          .orderBy(col("k0").asc_nulls_first, col("k1").asc_nulls_first)
          .limit(1000),
        mode = s"range:proj:$template:${if (left) "left" else "inner"}")
    }
  }

  /** v35's collation fragment pool — every Unicode shape where a binary
    * (code-unit / byte) order and a collation-aware order VISIBLY differ,
    * written as \\u escapes because the build runs under a POSIX locale
    * (scalac's source charset follows file.encoding; raw UTF-8 literals
    * would mis-compile silently). `caseSafe = false` marks the one probed
    * upper/lower divergence: Spark (java.lang.String semantics) maps
    * U+00DF LATIN SMALL LETTER SHARP S to "SS" while DuckDB (utf8proc)
    * maps it to U+1E9E LATIN CAPITAL LETTER SHARP S — so case functions
    * are never drawn over a pool containing it. Everything else was
    * probed IDENTICAL across the two engines (upper/lower over Latin-1 /
    * Greek / Cyrillic / full-width, code-point length/substr, unsigned
    * byte-wise comparison and LIKE).
    */
  private final case class CollFrag(s: String, caseSafe: Boolean = true)
  private val collFrags: Vector[CollFrag] = Vector(
    CollFrag(""),                        // empty prefix: shortest-string boundary
    CollFrag(" sp"),                     // leading space (0x20, lowest printable)
    CollFrag("A1"), CollFrag("Z~"),      // ASCII upper + highest printable 0x7E
    CollFrag("apple"), CollFrag("APPLE"),// ASCII case pair ('A' 0x41 < 'a' 0x61)
    CollFrag("zebra"),                   // highest ASCII lower block
    CollFrag("\u00C1baco"),              // Á: Latin-1, 2-byte UTF-8 0xC3 0x81
    CollFrag("\u00C9cole"),              // É / é case pair: binary-DISTINCT,
    CollFrag("\u00E9cole"),              //   case-fold-EQUAL groups
    CollFrag("e\u0301cole"),             // DECOMPOSED e+U+0301 ≠ precomposed é
    CollFrag("\u00FCber"),               // ü 0xC3 0xBC (top of Latin-1)
    CollFrag("stra\u00DFe", caseSafe = false), // ß: upper() diverges (doc above)
    CollFrag("\u03B1\u03B2"),            // Greek αβ / Αβ case pair
    CollFrag("\u0391\u03B2"),
    CollFrag("\u041C\u043E\u0441"),      // Cyrillic Мос
    CollFrag("\u4E2D\u6587"),            // CJK 中文 (3-byte UTF-8 0xE4..)
    CollFrag("\u65E5\u672C"),            // 日本 (0xE6..)
    CollFrag("\uD55C\uAD6D"),            // Hangul 한국 (0xED.. — above CJK)
    CollFrag("\uFF11\uFF12"),            // full-width digits １２ (0xEF..)
    CollFrag("\uFF21b"),                 // full-width Ａ + ASCII tail
    CollFrag("\uD83C\uDF89p"))           // 🎉: supplementary plane, 4-byte 0xF0

  /** Named code points of the sensitive pool entries, for FuzzSpec's
    * encoding canary (the pool is \\u-escaped in source precisely because
    * the build's locale is POSIX; the canary fails loudly if a future
    * re-encoding ships mojibake that both query renderings would agree on).
    */
  private[graft] def collationCanary: Map[String, Int] = Map(
    "latin1Upper" -> collFrags(7).s.codePointAt(0),          // A-acute
    "decomposedSecondCp" -> collFrags(10).s.codePointAt(1),  // U+0301
    "sharpS" -> collFrags(12).s.codePointAt(4),              // U+00DF
    "cjk" -> collFrags(16).s.codePointAt(0),                 // U+4E2D
    "hangul" -> collFrags(18).s.codePointAt(0),              // U+D55C
    "fullwidth" -> collFrags(19).s.codePointAt(0),           // U+FF11
    "emoji" -> collFrags(21).s.codePointAt(0))               // U+1F389

  /** Unsigned UTF-8 byte order — the order BOTH engines implement for
    * string comparison (verified by probe and pinned by every v35 sweep).
    * Used at GENERATION time to draw BETWEEN bounds lo < hi.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** v35 dedicated mode: COLLATION portability — string ORDERING as data.
    * Both engines document binary (unsigned UTF-8 byte-wise) string
    * comparison, and the driver's hasher compares rows POSITIONALLY, so
    * ORDER BY over non-ASCII / mixed-case keys is a genuine differential
    * surface that no older grammar touches (every corpus string pool is
    * plain ASCII). The constructed view maps (pk % m) through a drawn
    * subset of [[collFrags]] and CONCATENATES a corpus string column (and
    * the frags cover 1/2/3/4-byte UTF-8 leads, case pairs, decomposed
    * combining marks, full-width forms and the empty string), optionally
    * NULLing one residue class so the NULLS FIRST/LAST discipline rides
    * the same draw.
    *
    * TWO probed engine facts shape the construction — both documented
    * here because they are the kind of silent divergence this grammar
    * exists to quarantine:
    *   - a sort key that is DIRECTLY the output of a CASE whose THEN
    *     branches are string literals comes back from DuckDB 1.0.0 in
    *     SIGNED-byte order (non-ASCII block first; flat computed vectors
    *     and parquet-scanned columns sort correctly unsigned — plausibly
    *     its dictionary-vector sort path). Every v35 key is therefore
    *     concat-DERIVED (`CASE .. END || col`), never a bare CASE output
    *     — which the uniqueness construction wants anyway;
    *   - upper('straße') is 'STRASSE' in Spark but 'STRAẞE' in
    *     DuckDB (see [[collFrags]]), so the case-function shape draws
    *     from the caseSafe pool only.
    *
    * Five sub-shapes: (0) total ORDER BY over the collation key ±
    * direction with code-point length/substr projections; (1) the
    * collation key as GROUP BY key, ordered; (2) min/max/count-DISTINCT
    * of the key, grouped by an ASCII dim; (3) byte-order predicates
    * (>=, <, BETWEEN with generation-time utf8-ordered bounds, LIKE
    * prefix/contains, IS [NOT] NULL); (4) case-fold grouping by
    * lower(key) (merges the É/é-prefixed groups) or ordering by
    * upper(key).
    */
  private def collationQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val bases = Vector(
      ("customer", "c_custkey", "c_mktsegment"),
      ("orders", "o_orderkey", "o_orderpriority"),
      ("part", "p_partkey", "p_brand"),
      ("events", "event_id", "event_type"),
      ("documents", "doc_id", "lang"))
    val (t, pk, src) = bases(rnd.nextInt(bases.length))
    val shape = rnd.nextInt(5)
    val pool = if (shape == 4) collFrags.filter(_.caseSafe) else collFrags
    val m = 8 + rnd.nextInt(7) // 8..14 residue classes
    val frags = rnd.shuffle(pool).take(m)
    val nullIdx = if (rnd.nextInt(2) == 0) Some(rnd.nextInt(m)) else None
    val prefix = rnd.nextInt(4) > 0 // 3:1 prefix (frag leads the key bytes)

    // ---- the shared-dialect derived view: cs = frag-CASE || src ----
    val branches = frags.zipWithIndex.map { case (f, i) =>
      if (nullIdx.contains(i)) s"WHEN $i THEN NULL"
      else s"WHEN $i THEN '${f.s}'"
    }.mkString(" ")
    val caseSql = s"CASE ($pk % $m) $branches END"
    val csSql = if (prefix) s"$caseSql || $src" else s"$src || $caseSql"
    val frag =
      s"(SELECT $pk AS pk, $csSql AS cs, $src AS sv FROM $t) $t"
    def load(s: SparkSession, d: String): DataFrame = {
      var cc: Column = null
      frags.zipWithIndex.foreach { case (f, i) =>
        val v =
          if (nullIdx.contains(i)) lit(null).cast("string") else lit(f.s)
        cc = if (cc == null) when((col(pk) % m) === i, v)
             else cc.when((col(pk) % m) === i, v)
      }
      val cs = if (prefix) concat(cc, col(src)) else concat(col(src), cc)
      loadFuzzTable(s, d, t)
        .select(col(pk).as("pk"), cs.as("cs"), col(src).as("sv"))
    }
    // explicit two-engine direction rendering (Spark defaults NULLS FIRST
    // for ASC, DuckDB NULLS LAST — the grammar-wide rule)
    val desc = rnd.nextInt(2) == 1
    val dirSql = if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST"
    def dirCol(c: Column) = if (desc) c.desc_nulls_last else c.asc_nulls_first

    shape match {
      case 0 => // total ORDER BY the collation key; length/substr ride along
        val sql =
          s"SELECT pk AS k0, cs AS c0, CAST(length(cs) AS BIGINT) AS c1, " +
            s"substr(cs, 1, 3) AS c2 FROM $frag " +
            s"ORDER BY c0 $dirSql, k0 ASC NULLS FIRST LIMIT 1000"
        GenQuery(seed, sql,
          (s, d) => load(s, d).select(
            col("pk").as("k0"), col("cs").as("c0"),
            length(col("cs")).cast("long").as("c1"),
            substring(col("cs"), 1, 3).as("c2"))
            .orderBy(dirCol(col("c0")), col("k0").asc_nulls_first)
            .limit(1000),
          mode = s"coll:order:$t")

      case 1 => // the collation key AS the GROUP BY key, ordered
        val sql =
          s"SELECT cs AS k0, count(*) AS n, min(sv) AS mn, max(sv) AS mx " +
            s"FROM $frag GROUP BY cs ORDER BY k0 $dirSql LIMIT 1000"
        GenQuery(seed, sql,
          (s, d) => load(s, d).groupBy(col("cs"))
            .agg(count(lit(1)).as("n"), min(col("sv")).as("mn"),
              max(col("sv")).as("mx"))
            .select(col("cs").as("k0"), col("n"), col("mn"), col("mx"))
            .orderBy(dirCol(col("k0"))).limit(1000),
          mode = s"coll:group:$t")

      case 2 => // min/max/count-DISTINCT of the key, grouped by an ASCII dim
        val sql =
          s"SELECT sv AS k0, min(cs) AS mn, max(cs) AS mx, " +
            s"count(DISTINCT cs) AS nd FROM $frag " +
            s"GROUP BY sv ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
        GenQuery(seed, sql,
          (s, d) => load(s, d).groupBy(col("sv"))
            .agg(min(col("cs")).as("mn"), max(col("cs")).as("mx"),
              countDistinct(col("cs")).as("nd"))
            .select(col("sv").as("k0"), col("mn"), col("mx"), col("nd"))
            .orderBy(col("k0").asc_nulls_first).limit(1000),
          mode = s"coll:minmax:$t")

      case 3 => // byte-order predicates over the key
        val lits = frags.zipWithIndex
          .filterNot { case (_, i) => nullIdx.contains(i) }
          .map(_._1.s).filter(_.nonEmpty)
        def pick(): String = lits(rnd.nextInt(lits.length))
        val pred: P = rnd.nextInt(6) match {
          case 0 =>
            val l = pick(); P(s"cs >= '$l'", col("cs") >= l)
          case 1 =>
            val l = pick(); P(s"cs < '$l'", col("cs") < l)
          case 2 =>
            val a = pick(); val b = pick()
            if (a == b) P(s"cs = '$a'", col("cs") === a)
            else {
              val (lo, hi) = if (utf8Lt(a, b)) (a, b) else (b, a)
              P(s"cs BETWEEN '$lo' AND '$hi'", col("cs").between(lo, hi))
            }
          case 3 if prefix =>
            val l = pick(); P(s"cs LIKE '$l%'", col("cs").like(s"$l%"))
          case 3 =>
            // first CODE POINT (charAt would split the emoji frag's
            // surrogate pair into invalid UTF-8 inside the SQL text)
            val f = pick()
            val ch = new String(Character.toChars(f.codePointAt(0)))
            P(s"cs LIKE '%$ch%'", col("cs").like(s"%$ch%"))
          case 4 => P("cs IS NULL", col("cs").isNull)
          case _ => P("cs IS NOT NULL", col("cs").isNotNull)
        }
        val sql =
          s"SELECT pk AS k0, cs AS c0, sv AS c1 FROM $frag " +
            s"WHERE ${pred.sql} ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
        GenQuery(seed, sql,
          (s, d) => load(s, d).where(pred.col)
            .select(col("pk").as("k0"), col("cs").as("c0"),
              col("sv").as("c1"))
            .orderBy(col("k0").asc_nulls_first).limit(1000),
          mode = s"coll:pred:$t")

      case _ => // case-fold: GROUP BY lower(cs) or ORDER BY upper(cs)
        if (rnd.nextInt(2) == 0) {
          val sql =
            s"SELECT lower(cs) AS k0, count(*) AS n, max(cs) AS mx " +
              s"FROM $frag GROUP BY lower(cs) " +
              s"ORDER BY k0 $dirSql LIMIT 1000"
          GenQuery(seed, sql,
            (s, d) => load(s, d).groupBy(lower(col("cs")).as("k0"))
              .agg(count(lit(1)).as("n"), max(col("cs")).as("mx"))
              .select(col("k0"), col("n"), col("mx"))
              .orderBy(dirCol(col("k0"))).limit(1000),
            mode = s"coll:fold:$t")
        } else {
          val sql =
            s"SELECT pk AS k0, upper(cs) AS c0 FROM $frag " +
              s"ORDER BY c0 $dirSql, k0 ASC NULLS FIRST LIMIT 1000"
          GenQuery(seed, sql,
            (s, d) => load(s, d)
              .select(col("pk").as("k0"), upper(col("cs")).as("c0"))
              .orderBy(dirCol(col("c0")), col("k0").asc_nulls_first)
              .limit(1000),
            mode = s"coll:upper:$t")
        }
    }
  }

  /** v31 dedicated mode: DECIMAL at the TYPED BOUNDARIES — v27 only
    * aggregates/projects decimal values; its r13 trailing-zero rendering
    * bug proved typed-boundary surfaces are where engines diverge, so
    * this mode pushes DECIMAL into the three surfaces v27 never draws:
    * GROUP BY keys, JOIN keys, and comparison predicates. Same typed
    * derived view as v27 (every double column CAST to its [[decSpec]]
    * target inside the FROM fragments, ONE shared SQL text), same
    * rendered-surface rule (no declared output column is DECIMAL-typed —
    * keys and aggregates surface as scale-preserving strings; all
    * rendered scales here are ≤ 6, so Java BigDecimal never goes
    * scientific). Three sub-shapes:
    *   0 decimal GROUP BY key: group on a DECIMAL(p,s) column — decimal
    *     DISTINCT-equality in the hash aggregate — key rendered STRING,
    *     with count(*) and a pinned-scale sum;
    *   1 decimal JOIN keys: both sides of every FK→PK edge CAST to
    *     DECIMAL(18, s) with s drawn INDEPENDENTLY per side from
    *     {0, 2, 4} — cross-scale decimal equality exercises each
    *     engine's comparison coercion on values that are exact integers
    *     underneath (widening only, never rounds);
    *   2 decimal comparison predicates: WHERE over the decimal view with
    *     literals generated AT THE COLUMN'S decSpec SCALE
    *     (BigDecimal.setScale of the corpus pool value — plain decimal
    *     literals parse as DECIMAL in both dialects, so the comparison
    *     is decimal-vs-decimal and exact by construction, closing the
    *     ADVICE-r13 double-literal coercion fragility), plus
    *     column-vs-column compares across scales and scale-pinned
    *     IN-lists / BETWEEN.
    */
  private def decimalBoundaryQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val pool = (chains :+ eventsChain)
      .filter(c => c.tables.flatMap(catalog).exists(cc => decSpec.contains(cc.name)))
    val joinPool = pool.filter(_.joins.nonEmpty)
    val shape = rnd.nextInt(3)
    val chain =
      if (shape == 1) joinPool(rnd.nextInt(joinPool.length))
      else pool(rnd.nextInt(pool.length))
    val joinKinds0 = chain.joins.map(_ => if (rnd.nextDouble() < 0.25) "LEFT" else "INNER")
    val cols = chain.tables.flatMap(catalog)
    val decCols = cols.filter(c => decSpec.contains(c.name))
    // ADVICE r14: a three-valued WHERE over a column on the NULL-extended
    // side of a LEFT join silently reduces LEFT to INNER, so such draws
    // stopped testing the NULL-extension they appeared to. Mirror
    // docembQuery's rule: predicates draw only from columns of tables NOT
    // NULL-extended by any LEFT (column names are globally unique, so the
    // owner is the table whose catalog carries the column); when that
    // leaves no decimal column to predicate on, the join kinds fall back
    // to all-INNER rather than emitting a silently-reduced LEFT.
    val firstLeft = joinKinds0.indexOf("LEFT")
    val nullExtendedTables: Set[String] =
      if (firstLeft < 0) Set.empty else chain.tables.drop(firstLeft + 1).toSet
    val colOwner: Map[String, String] =
      chain.tables.flatMap(t => catalog(t).map(_.name -> t)).toMap
    val predPool0 = decCols.filterNot(c => nullExtendedTables(colOwner(c.name)))
    val (joinKinds, predPool) =
      if (predPool0.nonEmpty) (joinKinds0, predPool0)
      else (joinKinds0.map(_ => "INNER"), decCols)
    val groupables = cols.filter(_.groupable)
    val uk = headOrderCols(chain.tables.head)

    // Scale-pinned decimal literal from the column's corpus pool: the dLit
    // text re-scaled to the column's decSpec scale. Plain decimal literals
    // are DECIMAL-typed in BOTH dialects; lit(BigDecimal) carries the same
    // (precision, scale) on the DF side.
    def decLit(c: FCol): (String, Column) = {
      val s = decSpec(c.name)._2
      val l = c.lits(rnd.nextInt(c.lits.length))
      val bd = new java.math.BigDecimal(l.sql).setScale(s, java.math.RoundingMode.UNNECESSARY)
      (bd.toPlainString, lit(bd))
    }
    def decPred(): P = {
      val c = predPool(rnd.nextInt(predPool.length))
      rnd.nextInt(6) match {
        case 0 if predPool.length > 1 => // column vs column, possibly cross-scale
          val others = predPool.filterNot(_.name == c.name)
          val o = others(rnd.nextInt(others.length))
          val op = Seq("<", "<=", ">", ">=")(rnd.nextInt(4))
          val cc = op match {
            case "<"  => col(c.name) < col(o.name)
            case "<=" => col(c.name) <= col(o.name)
            case ">"  => col(c.name) > col(o.name)
            case _    => col(c.name) >= col(o.name)
          }
          P(s"${c.name} $op ${o.name}", cc)
        case 1 => // IN-list at pinned scale
          val k = 2 + rnd.nextInt(2)
          val picked = rnd.shuffle(c.lits.toVector).take(k).map { l =>
            val bd = new java.math.BigDecimal(l.sql)
              .setScale(decSpec(c.name)._2, java.math.RoundingMode.UNNECESSARY)
            (bd.toPlainString, lit(bd))
          }
          P(s"${c.name} IN (${picked.map(_._1).mkString(", ")})",
            col(c.name).isin(picked.map(_._2): _*))
        case 2 => // BETWEEN at pinned scale (lits are declared value-ordered)
          val s = decSpec(c.name)._2
          val i = rnd.nextInt(c.lits.length - 1)
          val j = i + 1 + rnd.nextInt(c.lits.length - i - 1)
          val lo = new java.math.BigDecimal(c.lits(i).sql).setScale(s, java.math.RoundingMode.UNNECESSARY)
          val hi = new java.math.BigDecimal(c.lits(j).sql).setScale(s, java.math.RoundingMode.UNNECESSARY)
          P(s"${c.name} BETWEEN ${lo.toPlainString} AND ${hi.toPlainString}",
            col(c.name).between(lit(lo), lit(hi)))
        case _ => // comparison against a scale-pinned literal
          val (lSql, lCol) = decLit(c)
          val op = Seq("<", "<=", ">", ">=")(rnd.nextInt(4))
          val cc = op match {
            case "<"  => col(c.name) < lCol
            case "<=" => col(c.name) <= lCol
            case ">"  => col(c.name) > lCol
            case _    => col(c.name) >= lCol
          }
          P(s"${c.name} $op $lSql", cc)
      }
    }

    // Per-table derived decimal JOIN keys (shape 1): column names are
    // globally unique in the corpus, so the owning table is the one whose
    // catalog carries the column.
    val dkScales: Map[String, Int] =
      if (shape != 1) Map.empty
      else chain.joins.flatMap { case (lk, rk) =>
        Seq(lk -> Seq(0, 2, 4)(rnd.nextInt(3)), rk -> Seq(0, 2, 4)(rnd.nextInt(3)))
      }.toMap
    def frag(t: String): String = {
      val colSqls = catalog(t).map { c =>
        decSpec.get(c.name) match {
          case Some((p, s)) => s"CAST(${c.name} AS DECIMAL($p, $s)) AS ${c.name}"
          case None         => c.name
        }
      }
      val dkSqls = catalog(t).collect {
        case c if dkScales.contains(c.name) =>
          s"CAST(${c.name} AS DECIMAL(18, ${dkScales(c.name)})) AS ${c.name}_dk"
      }
      s"(SELECT ${(colSqls ++ dkSqls).mkString(", ")} FROM $t) $t"
    }
    def loadDec(s: SparkSession, d: String, t: String): DataFrame = {
      val base = catalog(t).map { c =>
        decSpec.get(c.name) match {
          case Some((p, s2)) => col(c.name).cast(s"decimal($p, $s2)").as(c.name)
          case None          => col(c.name)
        }
      }
      val dks = catalog(t).collect {
        case c if dkScales.contains(c.name) =>
          col(c.name).cast(s"decimal(18, ${dkScales(c.name)})").as(s"${c.name}_dk")
      }
      loadFuzzTable(s, d, t).select(base ++ dks: _*)
    }
    val preds = shape match {
      case 2 => Vector.fill(1 + rnd.nextInt(2))(decPred())
      case _ => Vector.fill(rnd.nextInt(2))(decPred())
    }
    def joinTail(sb: StringBuilder): Unit = {
      sb ++= s" FROM ${frag(chain.tables.head)}"
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        val kw = if (joinKinds(i) == "LEFT") "LEFT JOIN" else "JOIN"
        val on =
          if (shape == 1) s"(${lk}_dk = ${rk}_dk)" else s"($lk = $rk)"
        sb ++= s" $kw ${frag(chain.tables(i + 1))} ON $on"
      }
      if (preds.nonEmpty) sb ++= " WHERE " + preds.map(_.sql).mkString(" AND ")
    }
    def joined(s: SparkSession, d: String): DataFrame = {
      val dfs = chain.tables.map(tb => loadDec(s, d, tb))
      var j = dfs.head
      chain.joins.zipWithIndex.foreach { case ((lk, rk), i) =>
        val cond =
          if (shape == 1) col(s"${lk}_dk") === col(s"${rk}_dk")
          else col(lk) === col(rk)
        j = j.join(dfs(i + 1), cond,
          if (joinKinds(i) == "LEFT") "left" else "inner")
      }
      preds.foreach(p => j = j.where(p.col))
      j
    }

    shape match {
      case 0 => // DECIMAL GROUP BY key, rendered as a scale-preserving string
        val k = decCols(rnd.nextInt(decCols.length))
        val d2 = decCols(rnd.nextInt(decCols.length))
        val s2 = decSpec(d2.name)._2
        val items = Seq(
          Item("k0", s"CAST(${k.name} AS STRING)", col(k.name).cast("string")),
          Item("n", "count(*)", count(lit(1))),
          Item("s0", s"CAST(CAST(sum(${d2.name}) AS DECIMAL(38, $s2)) AS STRING)",
            sum(col(d2.name)).cast(s"decimal(38, $s2)").cast("string")))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        joinTail(sb)
        sb ++= s" GROUP BY ${k.name} ORDER BY k0 ASC NULLS FIRST LIMIT 1000"
        val build = (s: SparkSession, d: String) =>
          joined(s, d)
            .groupBy(col(k.name))
            .agg(items(1).col.as("n"), items(2).col.as("s0"))
            .select(col(k.name).cast("string").as("k0"), col("n"), col("s0"))
            .orderBy(col("k0").asc_nulls_first)
            .limit(1000)
        GenQuery(seed, sb.result(), build,
          mode = s"decb:group:${chain.tables.head}")

      case 1 => // DECIMAL JOIN keys (per-side independent scales)
        val g = groupables(rnd.nextInt(groupables.length))
        val ic = cols.filter(_.kind == 'i')
        val sc = ic(rnd.nextInt(ic.length))
        val dm = decCols(rnd.nextInt(decCols.length))
        val items = Seq(
          Item("k0", g.name, col(g.name)),
          Item("n", "count(*)", count(lit(1))),
          Item("s0", s"CAST(sum(${sc.name}) AS BIGINT)", sum(col(sc.name))),
          Item("m0", s"CAST(min(${dm.name}) AS STRING)",
            min(col(dm.name)).cast("string")))
        val sb = new StringBuilder("SELECT ")
        sb ++= items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        joinTail(sb)
        sb ++= s" GROUP BY ${g.name} ORDER BY k0 ASC NULLS FIRST"
        val build = (s: SparkSession, d: String) =>
          joined(s, d)
            .groupBy(col(g.name))
            .agg(items(1).col.as("n"), items(2).col.as("s0"),
              items(3).col.as("m0"))
            .select(col(g.name).as("k0"), col("n"), col("s0"), col("m0"))
            .orderBy(col("k0").asc_nulls_first)
        GenQuery(seed, sb.result(), build,
          mode = s"decb:joinkey:${chain.tables.head}")

      case _ => // DECIMAL comparison predicates over the typed view
        val proj = rnd.shuffle(decCols.toVector).take(1 + rnd.nextInt(2))
        val keyItems = uk.zipWithIndex.map { case (kc, i) =>
          Item(s"k$i", kc, col(kc))
        }
        val valItems = proj.zipWithIndex.map { case (c, i) =>
          Item(s"c$i", s"CAST(${c.name} AS STRING)", col(c.name).cast("string"))
        }
        val all = keyItems ++ valItems
        val sb = new StringBuilder("SELECT ")
        sb ++= all.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        joinTail(sb)
        sb ++= " ORDER BY " + all.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
        sb ++= " LIMIT 1000"
        val build = (s: SparkSession, d: String) =>
          joined(s, d)
            .select(all.map(i => i.col.as(i.alias)): _*)
            .orderBy(all.map(i => col(i.alias).asc_nulls_first): _*)
            .limit(1000)
        GenQuery(seed, sb.result(), build,
          mode = s"decb:pred:${chain.tables.head}")
    }
  }

  /** v28 dedicated mode: NULL semantics in SET OPERATIONS — the one
    * relational surface where SQL compares NULLs as EQUAL. Joins,
    * predicates and [NOT] IN are three-valued (v17-v19, v24: NULL matches
    * nothing), but INTERSECT / EXCEPT / UNION and their ALL forms use
    * DISTINCT-equality: a (NULL, x) row present in both branches IS in the
    * intersect, EXCEPT removes NULL rows matched by a NULL row, UNION
    * dedups them to one. No older set-op mode (v2/v8/v12) ever feeds a
    * NULL into a branch — base-table columns are never NULL — so this
    * composes v17's nullable derived view with the set-op surface. Branch
    * predicates draw from NON-victim columns only: a three-valued WHERE
    * over the victim would filter the NULL rows out before the set op
    * could see them. Three sub-shapes:
    *   0 meet: two differently-filtered projections (victim column + 0-1
    *     non-victim) of ONE nullable view under a drawn op ∈ {INTERSECT,
    *     INTERSECT ALL, EXCEPT, EXCEPT ALL, UNION} — NULL rows meet
    *     across branches under distinct-equality;
    *   1 null-branch: the victim projection INTERSECT / EXCEPT / UNION a
    *     literal one-row `SELECT CAST(NULL AS T)` branch — membership of
    *     the NULL value itself (EXCEPT deletes exactly the NULL rows;
    *     INTERSECT keeps exactly one NULL row iff any exists; UNION
    *     contributes it). Both sides CAST to one shared type so the
    *     coerced output type is pinned;
    *   2 dedup-count: count(*) vs count(victim) over (A UNION B) — the
    *     contrast proves the NULL rows collapsed to ONE output row under
    *     UNION's distinct-equality while count(victim) skips it.
    */
  private def setopNullQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val (tov, chain, victims) = drawNullOverride(rnd)
    val t = chain.tables.head
    val cols = catalog(t)
    val victimNames = victims.map(_.name).toSet
    val nonVictim = cols.filterNot(c => victimNames(c.name))
    val v0 = victims.head
    def sharedType(c: FCol): String = c.kind match {
      case 'i' => "BIGINT"
      case 'd' => "DOUBLE"
      case 's' => "STRING" // DuckDB aliases STRING to VARCHAR
      case _   => "TIMESTAMP"
    }
    val predA = genPred(rnd, nonVictim, version)
    val predB = genPred(rnd, nonVictim, version)

    rnd.nextInt(3) match {
      case 0 => // NULL rows meeting across two branches of one view
        val extra: Option[FCol] =
          if (rnd.nextBoolean()) Some(nonVictim(rnd.nextInt(nonVictim.length)))
          else None
        val projCols = v0 +: extra.toSeq
        val items = projCols.zipWithIndex.map { case (c, i) =>
          Item(s"c$i", c.name, col(c.name))
        }
        val op = Vector("INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL",
          "UNION")(rnd.nextInt(5))
        val sel = items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")
        val sql = s"SELECT $sel FROM ${tov.fromDuck} WHERE ${predA.sql} $op " +
          s"SELECT $sel FROM ${tov.fromDuck} WHERE ${predB.sql} ORDER BY " +
          items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")
        val build = (s: SparkSession, d: String) => {
          def branch(p: P) = tov.load(s, d).where(p.col)
            .select(items.map(i => i.col.as(i.alias)): _*)
          val a = branch(predA); val b = branch(predB)
          val u = op match {
            case "INTERSECT"     => a.intersect(b)
            case "INTERSECT ALL" => a.intersectAll(b)
            case "EXCEPT"        => a.except(b)
            case "EXCEPT ALL"    => a.exceptAll(b)
            case _               => a.union(b).distinct()
          }
          u.orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
        }
        GenQuery(seed, sql, build,
          mode = s"nsetop:meet:${op.toLowerCase.replace(" ", "")}:$t")

      case 1 => // the NULL value itself as a literal set-op branch
        val ty = sharedType(v0)
        val op = Vector("INTERSECT", "EXCEPT", "UNION")(rnd.nextInt(3))
        val sql = s"SELECT CAST(${v0.name} AS $ty) AS c0 FROM ${tov.fromDuck} " +
          s"WHERE ${predA.sql} $op SELECT CAST(NULL AS $ty) AS c0 " +
          "ORDER BY c0 ASC NULLS FIRST"
        val build = (s: SparkSession, d: String) => {
          val a = tov.load(s, d).where(predA.col)
            .select(col(v0.name).cast(ty.toLowerCase).as("c0"))
          val b = s.range(1).select(lit(null).cast(ty.toLowerCase).as("c0"))
          val u = op match {
            case "INTERSECT" => a.intersect(b)
            case "EXCEPT"    => a.except(b)
            case _           => a.union(b).distinct()
          }
          u.orderBy(col("c0").asc_nulls_first)
        }
        GenQuery(seed, sql, build,
          mode = s"nsetop:nullbranch:${op.toLowerCase}:$t")

      case _ => // count contrast over UNION-dedup of the NULL rows
        val extra = nonVictim(rnd.nextInt(nonVictim.length))
        val sel = s"${v0.name} AS c0, ${extra.name} AS c1"
        val sql = "SELECT count(*) AS n, count(c0) AS nn FROM " +
          s"(SELECT $sel FROM ${tov.fromDuck} WHERE ${predA.sql} UNION " +
          s"SELECT $sel FROM ${tov.fromDuck} WHERE ${predB.sql}) u"
        val build = (s: SparkSession, d: String) => {
          def branch(p: P) = tov.load(s, d).where(p.col)
            .select(col(v0.name).as("c0"), col(extra.name).as("c1"))
          branch(predA).union(branch(predB)).distinct()
            .agg(count(lit(1)).as("n"), count(col("c0")).as("nn"))
        }
        GenQuery(seed, sql, build, mode = s"nsetop:dedupcount:$t")
    }
  }

  /** v29 dedicated mode: LATERAL correlated derived tables — the FROM
    * clause's correlation surface (v5/v14 cover WHERE/projection
    * subqueries; no older mode correlates a whole derived TABLE). The
    * star shape is per-group TOP-K: `dim, LATERAL (SELECT … FROM fact
    * WHERE fk = pk ORDER BY v …, u LIMIT k)` — the engines must agree on
    * correlated-LIMIT semantics, and the DF side renders the window
    * decorrelation Spark itself would produce (row_number over
    * PARTITION BY fk ≤ k, then the equi join). The u tiebreak is the
    * fact's verified-unique key, making each partition's top-k
    * value-deterministic despite ties in v. Three sub-shapes:
    *   0 topk (comma/CROSS lateral): dims with no qualifying facts drop;
    *   1 agg: correlated AGGREGATE lateral — always exactly one row per
    *     dim (count 0 / NULL extremes on empty), so the comma join never
    *     drops a dim; DF side is the LEFT-join-on-per-key-aggregate with
    *     COALESCE(n, 0), the q17-style decorrelation;
    *   2 leftk: LEFT JOIN LATERAL (top-k) ON true — dims with zero
    *     qualifying facts survive NULL-extended (the events⋈customer
    *     edge genuinely has such dims; fact-side predicates create them
    *     on every edge).
    * Correlation needs no aliases: corpus column names are
    * table-prefixed, so the unqualified dim pk inside the lateral body
    * resolves to the outer row in both engines. Integer sums CAST BIGINT
    * as everywhere.
    */
  private def lateralQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val (factT, fk, dimT, pk) = njoinEdges(rnd.nextInt(njoinEdges.length))
    val factCols = catalog(factT)
    val dimCols = catalog(dimT)
    val factUk = uniqueKeys(factT).head
    val dimPayload = dimCols.filter(c => c.name != pk)
    val p0 = dimPayload(rnd.nextInt(dimPayload.length))
    val factPred: Option[P] =
      if (rnd.nextBoolean()) Some(genPred(rnd, factCols.filterNot(_.name == fk), version))
      else None
    val dimPred: Option[P] =
      if (rnd.nextInt(3) == 0) Some(genPred(rnd, dimCols, version)) else None
    val k = 1 + rnd.nextInt(3)
    val vPool = factCols.filter(c => c.name != fk && c.name != factUk)
    val v = vPool(rnd.nextInt(vPool.length))
    val desc = rnd.nextBoolean()
    val dir = if (desc) "DESC" else "ASC"

    def lateralBody(extraSel: String): String = {
      val w = (s"$fk = $pk" +: factPred.map(_.sql).toSeq).mkString(" AND ")
      s"(SELECT $extraSel FROM $factT WHERE $w"
    }
    def topkDf(s: SparkSession, d: String): DataFrame = {
      var f = loadFuzzTable(s, d, factT)
      factPred.foreach(p => f = f.where(p.col))
      val ord = if (desc) col(v.name).desc else col(v.name).asc
      val w = Window.partitionBy(col(fk)).orderBy(ord, col(factUk).asc)
      f.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k)
    }
    def dimDf(s: SparkSession, d: String): DataFrame = {
      var dd = loadFuzzTable(s, d, dimT)
      dimPred.foreach(p => dd = dd.where(p.col))
      dd
    }
    def orderAll(items: Seq[Item], df: DataFrame): DataFrame =
      df.select(items.map(i => i.col.as(i.alias)): _*)
        .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
    def sqlOrder(items: Seq[Item]): String =
      " ORDER BY " + items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")

    rnd.nextInt(3) match {
      case 0 => // inner (comma) lateral top-k
        val items = Seq(
          Item("k0", pk, col(pk)), Item("p0", p0.name, col(p0.name)),
          Item("v0", v.name, col(v.name)), Item("u0", factUk, col(factUk)))
        val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
          s" FROM $dimT, LATERAL ${lateralBody(s"${v.name}, $factUk")}" +
          s" ORDER BY ${v.name} $dir, $factUk ASC LIMIT $k) l" +
          dimPred.map(p => s" WHERE ${p.sql}").getOrElse("") +
          sqlOrder(items)
        val build = (s: SparkSession, d: String) =>
          orderAll(items, dimDf(s, d).join(topkDf(s, d), col(pk) === col(fk)))
        GenQuery(seed, sql, build, mode = s"lateral:topk:$factT:$dimT")

      case 1 => // correlated aggregate lateral (always one row per dim)
        val intPool = factCols.filter(c => c.kind == 'i' && c.name != fk)
        val sc = intPool(rnd.nextInt(intPool.length))
        val mm = if (rnd.nextBoolean()) "min" else "max"
        val mc = vPool(rnd.nextInt(vPool.length))
        val items = Seq(
          Item("k0", pk, col(pk)), Item("p0", p0.name, col(p0.name)),
          Item("n", "n", col("n")), Item("s", "s", col("s")),
          Item("m", "m", col("m")))
        val sql = s"SELECT $pk AS k0, ${p0.name} AS p0, l.n AS n, l.s AS s, l.m AS m" +
          s" FROM $dimT, LATERAL ${lateralBody(
            s"count(*) AS n, CAST(sum(${sc.name}) AS BIGINT) AS s, $mm(${mc.name}) AS m")}) l" +
          dimPred.map(p => s" WHERE ${p.sql}").getOrElse("") +
          sqlOrder(items)
        val build = (s: SparkSession, d: String) => {
          var f = loadFuzzTable(s, d, factT)
          factPred.foreach(p => f = f.where(p.col))
          val agg = f.groupBy(col(fk)).agg(
            count(lit(1)).as("_n"), sum(col(sc.name)).as("s"),
            (if (mm == "min") min(col(mc.name)) else max(col(mc.name))).as("m"))
          val j = dimDf(s, d).join(agg, col(pk) === col(fk), "left")
            .withColumn("n", coalesce(col("_n"), lit(0L)))
          orderAll(items, j)
        }
        GenQuery(seed, sql, build, mode = s"lateral:agg:$factT:$dimT")

      case _ => // LEFT JOIN LATERAL top-k ON true (empty groups survive)
        val items = Seq(
          Item("k0", pk, col(pk)), Item("p0", p0.name, col(p0.name)),
          Item("v0", v.name, col(v.name)), Item("u0", factUk, col(factUk)))
        val sql = s"SELECT $pk AS k0, ${p0.name} AS p0, l.v0 AS v0, l.u0 AS u0" +
          s" FROM $dimT LEFT JOIN LATERAL ${lateralBody(
            s"${v.name} AS v0, $factUk AS u0")}" +
          s" ORDER BY ${v.name} $dir, $factUk ASC LIMIT $k) l ON true" +
          dimPred.map(p => s" WHERE ${p.sql}").getOrElse("") +
          sqlOrder(items)
        val build = (s: SparkSession, d: String) => {
          val t = topkDf(s, d)
            .select(col(fk), col(v.name).as("v0"), col(factUk).as("u0"))
          orderAll(items.map(i =>
            if (i.alias == "v0" || i.alias == "u0") Item(i.alias, i.alias, col(i.alias))
            else i),
            dimDf(s, d).join(t, col(pk) === col(fk), "left"))
        }
        GenQuery(seed, sql, build, mode = s"lateral:leftk:$factT:$dimT")
    }
  }

  /** v30 dedicated mode: subqueries as projected VALUES — every older
    * quantifier mode (v5/v18/v19) asks IN/EXISTS in WHERE, where NULL and
    * FALSE are indistinguishable (both drop the row). Projected into the
    * SELECT list the difference becomes DATA: `fk IN (subquery)` is a
    * THREE-VALUED boolean output (FALSE when the list is empty regardless
    * of fk; NULL when fk is NULL against a non-empty list; TRUE on match;
    * NULL on no-match against a NULL-bearing list; FALSE otherwise), and
    * `fk NOT IN (…)` is its three-valued negation (NULL stays NULL). The
    * fact side is the v18 NULL-injected view, and 1-in-3 inflag draws
    * also NULL-poison the dim projection, so ALL five truth-table rows
    * genuinely occur. The DF rendering is the explicit three-valued
    * decomposition (LEFT join on distinct non-NULL keys + two broadcast
    * scalars: list-empty and list-has-NULL) — cross-checked against both
    * engines' native IN-projection evaluation. Three sub-shapes:
    *   0 inflag: (fk IN sub) AS f beside (fk NOT IN sub) AS g;
    *   1 existsflag: correlated EXISTS / NOT EXISTS as projected booleans
    *     — TWO-valued even for NULL fk (a NULL key never correlates);
    *   2 caseagg: the EXISTS flag inside a CASE classifier ('null' /
    *     'hit' / 'miss') used as a GROUP BY key, with the count(*) vs
    *     count(fk) contrast per class.
    */
  private def projSubqQuery(seed: Int, rnd: Random, version: Int): GenQuery = {
    val (tov, _, edge) = drawJoinNullOverride(rnd)
    val (factT, fk, dimT, pk) = edge
    val factUk = uniqueKeys(factT).head
    val factPred: Option[P] =
      if (rnd.nextBoolean())
        Some(genPred(rnd, catalog(factT).filterNot(_.name == fk), version))
      else None
    val dimPred: Option[P] =
      if (rnd.nextBoolean()) Some(genPred(rnd, catalog(dimT), version)) else None
    val dimWhere = dimPred.map(p => s" WHERE ${p.sql}").getOrElse("")
    val factWhere = factPred.map(p => s" WHERE ${p.sql}").getOrElse("")

    def factDf(s: SparkSession, d: String): DataFrame = {
      var f = tov.load(s, d)
      factPred.foreach(p => f = f.where(p.col))
      f
    }
    def dimDf(s: SparkSession, d: String): DataFrame = {
      val d0 = loadFuzzTable(s, d, dimT)
      dimPred.map(p => d0.where(p.col)).getOrElse(d0)
    }
    /** LEFT-join the distinct qualifying dim keys; `_pkx IS NOT NULL` is
      * the matched flag (a NULL fk never matches — equality join). */
    def withMatch(s: SparkSession, d: String, keys: DataFrame): DataFrame =
      factDf(s, d).join(keys, col(fk) === col("_pkx"), "left")
    def orderOut(items: Seq[Item], df: DataFrame): DataFrame =
      df.select(items.map(i => i.col.as(i.alias)): _*)
        .orderBy(items.map(i => col(i.alias).asc_nulls_first): _*)
    def sqlOrder(items: Seq[Item]): String =
      " ORDER BY " + items.map(i => s"${i.alias} ASC NULLS FIRST").mkString(", ")

    rnd.nextInt(3) match {
      case 0 =>
        // COALESCE(fk [NOT] IN sub, FALSE) AS f/g — the normalized form,
        // because the engines GENUINELY DISAGREE on the raw three-valued
        // projection: the SQL standard (and DuckDB) yields NULL for a
        // NULL fk against a non-empty list and for a no-match against a
        // NULL-bearing list, while Spark 4.1.2 plans a projected
        // InSubquery as an ExistenceJoin and returns FALSE in every NULL
        // case (found by this grammar's first probe — the DF-side
        // standard three-valued decomposition diverged from spark.sql on
        // exactly those rows). COALESCE(…, FALSE) collapses both engines
        // onto the same two-valued surface; the DF rendering below is
        // that collapsed truth table (g is TRUE iff the list is empty,
        // or fk is non-NULL, unmatched, against a NULL-free list).
        val poison = rnd.nextInt(3) == 0
        val m2 = 5 + rnd.nextInt(5); val r2 = rnd.nextInt(m2)
        val subExpr =
          if (poison) s"CASE WHEN ($pk % $m2) = $r2 THEN NULL ELSE $pk END"
          else pk
        val sub = s"(SELECT $subExpr FROM $dimT$dimWhere)"
        val items = Seq(
          Item("k0", factUk, col(factUk)), Item("fk0", fk, col(fk)),
          Item("f", s"COALESCE(($fk IN $sub), FALSE)", col("f")),
          Item("g", s"COALESCE(($fk NOT IN $sub), FALSE)", col("g")))
        val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
          s" FROM ${tov.fromDuck}$factWhere" + sqlOrder(items)
        val build = (s: SparkSession, d: String) => {
          val listCol =
            if (poison) when((col(pk) % m2) === r2, lit(null)).otherwise(col(pk))
            else col(pk)
          val subDf = dimDf(s, d).select(listCol.as("_pkx"))
          val stats = subDf.agg(count(lit(1)).as("_cnt"),
            max(when(col("_pkx").isNull, 1).otherwise(0)).as("_hn"))
          val keys = subDf.where(col("_pkx").isNotNull).distinct()
          val j = withMatch(s, d, keys).crossJoin(broadcast(stats))
            .withColumn("f", col("_pkx").isNotNull)
            .withColumn("g",
              when(col("_cnt") === 0, lit(true))
                .when(col(fk).isNull, lit(false))
                .when(col("_pkx").isNotNull, lit(false))
                .when(col("_hn") === 1, lit(false))
                .otherwise(lit(true)))
          orderOut(items, j)
        }
        GenQuery(seed, sql, build,
          mode = s"psubq:inflag${if (poison) ":poison" else ""}:$factT")

      case 1 => // correlated EXISTS / NOT EXISTS as projected booleans
        val andDim = dimPred.map(p => s" AND ${p.sql}").getOrElse("")
        val ex = s"EXISTS (SELECT 1 FROM $dimT WHERE $pk = $fk$andDim)"
        val items = Seq(
          Item("k0", factUk, col(factUk)), Item("fk0", fk, col(fk)),
          Item("e", ex, col("e")), Item("ne", s"NOT $ex", col("ne")))
        val sql = s"SELECT ${items.map(i => s"${i.sql} AS ${i.alias}").mkString(", ")}" +
          s" FROM ${tov.fromDuck}$factWhere" + sqlOrder(items)
        val build = (s: SparkSession, d: String) => {
          val keys = dimDf(s, d).select(col(pk).as("_pkx")).distinct()
          val j = withMatch(s, d, keys)
            .withColumn("e", col("_pkx").isNotNull)
            .withColumn("ne", col("_pkx").isNull)
          orderOut(items, j)
        }
        GenQuery(seed, sql, build, mode = s"psubq:exists:$factT")

      case _ => // EXISTS inside a CASE classifier used as the group key
        val andDim = dimPred.map(p => s" AND ${p.sql}").getOrElse("")
        val caseSql = s"CASE WHEN $fk IS NULL THEN 'null' WHEN EXISTS " +
          s"(SELECT 1 FROM $dimT WHERE $pk = $fk$andDim) THEN 'hit' " +
          "ELSE 'miss' END"
        val sql = s"SELECT $caseSql AS k0, count(*) AS n, count($fk) AS nf" +
          s" FROM ${tov.fromDuck}$factWhere GROUP BY $caseSql" +
          " ORDER BY k0 ASC NULLS FIRST"
        val build = (s: SparkSession, d: String) => {
          val keys = dimDf(s, d).select(col(pk).as("_pkx")).distinct()
          withMatch(s, d, keys)
            .withColumn("k0",
              when(col(fk).isNull, lit("null"))
                .when(col("_pkx").isNotNull, lit("hit"))
                .otherwise(lit("miss")))
            .groupBy(col("k0"))
            .agg(count(lit(1)).as("n"), count(col(fk)).as("nf"))
            .orderBy(col("k0").asc_nulls_first)
        }
        GenQuery(seed, sql, build, mode = s"psubq:caseagg:$factT")
    }
  }
}
