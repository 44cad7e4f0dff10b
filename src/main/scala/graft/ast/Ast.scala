package graft.ast

/** Unified AST for the graft SQL engine.
  *
  * Merges the two dialects of the reference (kduy/Flink-DSL) into one tree:
  *   - the FSQL streaming dialect (CREATE SCHEMA / CREATE STREAM / windowed
  *     SELECT) — reference `fsql/Ast.scala`
  *   - the flinkdsl/sqltyped batch dialect (joins, group by, rollup, order
  *     by, limit/offset, set ops, insert/update/delete, subqueries) —
  *     reference `flinkdsl/ast.scala`
  *
  * Unlike the reference (which keeps a two-phase Unresolved[Option[String]] /
  * Resolved[Stream] tree, `fsql/Ast.scala:11-29`), we keep a single tree:
  * name resolution is delegated to Spark's Catalyst analyzer, which gives us
  * proper ambiguity errors for free (the reference silently bound unqualified
  * columns to the first stream — `fsql/Ast.scala:323` — a documented bug we
  * deliberately do not reproduce). Our own resolver (graft.translate) only
  * resolves *relations* (tables/streams/schemas) against the graft catalog.
  */

// ---------------------------------------------------------------------------
// Statements
// ---------------------------------------------------------------------------

sealed trait Statement

/** CREATE SCHEMA name (col type, …) [extends parent] — fsql/parser.scala:31-39 */
final case class CreateSchema(
    name: String,
    fields: Seq[FieldDef],
    parent: Option[String]) extends Statement

/** CREATE STREAM name (fields)|schemaName [source …] — fsql/parser.scala:47-51 */
final case class CreateStream(
    name: String,
    schema: SchemaRef,
    source: Option[StreamSource]) extends Statement

/** CREATE TABLE name AS query — batch CTAS (beyond-reference DDL
  * completeness; CREATE STREAM … AS (q) covers the derived-stream form).
  * The registered relation stays a lazy logical plan: downstream queries
  * compose with it and Catalyst prunes/pushes through it. */
final case class CreateTableAs(name: String, query: QueryExpr) extends Statement

sealed trait SchemaRef
final case class NamedSchema(name: String) extends SchemaRef
final case class InlineSchema(fields: Seq[FieldDef]) extends SchemaRef

final case class FieldDef(name: String, dataType: String, nullable: Boolean = true)

/** Stream sources — fsql/Ast.scala:77-87 */
sealed trait StreamSource
final case class HostSource(host: String, port: Int) extends StreamSource
final case class FileSource(path: String) extends StreamSource
final case class DerivedSource(query: QueryExpr) extends StreamSource

/** INSERT INTO target[window] (cols)? (VALUES …| SELECT …) —
  * fsql/parser.scala:273-277 (stream form), flinkdsl/parser.scala:44-51. */
final case class Insert(
    table: String,
    window: Option[WindowSpec],
    columns: Option[Seq[String]],
    input: InsertInput) extends Statement

sealed trait InsertInput
final case class InsertValues(rows: Seq[Seq[Expr]]) extends InsertInput
final case class InsertSelect(query: QueryExpr) extends InsertInput

/** UPDATE — parsed for parity (flinkdsl/parser.scala:55-59); execution is
  * rejected on immutable sources (SURVEY §7.4 risk 5). */
final case class Update(
    tables: Seq[TableRef],
    set: Seq[(ColRef, Expr)],
    where: Option[Expr],
    orderBy: Seq[SortKey],
    limit: Option[Limit]) extends Statement

/** DELETE FROM — flinkdsl/parser.scala:63-66; same execution policy as Update. */
final case class Delete(tables: Seq[TableRef], where: Option[Expr]) extends Statement

/** EXPLAIN <query> — beyond-reference utility: returns the Catalyst plan. */
final case class Explain(query: QueryExpr, analyze: Boolean = false) extends Statement

/** MERGE INTO target USING source ON cond WHEN [NOT] MATCHED … — upsert
  * (beyond-reference extension; the reference has no MERGE). Executes
  * copy-on-write like UPDATE/DELETE: the catalog registration is replaced
  * with a derived plan. Actions apply in declaration order (first matching
  * clause wins, per SQL:2003); a target row matched by more than one
  * source row is a cardinality violation and raises an error. */
final case class Merge(
    target: TableRef,
    source: Relation,
    on: Expr,
    actions: Seq[MergeAction]) extends Statement

/** SHOW TABLES / SHOW STREAMS / DESCRIBE rel / DROP STREAM|SCHEMA name —
  * session introspection + lifecycle (beyond-reference utilities; the
  * reference's SimpleCatalog stub had no surface at all). */
final case class ShowRelations(streamsOnly: Boolean) extends Statement
final case class Describe(relation: String) extends Statement
/** `DESCRIBE (SELECT …)` — output schema of a query, plan-only (no jobs). */
final case class DescribeQuery(query: QueryExpr) extends Statement
/** `table` records which keyword was parsed (execution is identical —
  * the catalog holds one relation namespace); pretty-printing keeps it. */
final case class DropRelation(name: String, ifExists: Boolean,
                              table: Boolean = false) extends Statement
final case class DropSchema(name: String, ifExists: Boolean) extends Statement
/** `CREATE MODEL <name> KIND '<kind>' AT '<path>'` — register a trained
  * model artifact (an IVF index layout, a BPE merge list, …) as a NAMED
  * catalog entry. The registration records (kind, path, content hash)
  * and rides the DDL sidecar, so `ann_topk`/`bpe_tokenize` can reference
  * models by name across sessions. */
final case class CreateModel(name: String, kind: String,
                             path: String) extends Statement
final case class DropModel(name: String, ifExists: Boolean) extends Statement
final case class ShowModels() extends Statement

sealed trait MergeAction { def cond: Option[Expr] }
final case class MergeUpdate(cond: Option[Expr], set: Seq[(ColRef, Expr)]) extends MergeAction
final case class MergeDelete(cond: Option[Expr]) extends MergeAction
final case class MergeInsert(cond: Option[Expr], columns: Option[Seq[String]],
                             values: Seq[Expr]) extends MergeAction

// ---------------------------------------------------------------------------
// Queries
// ---------------------------------------------------------------------------

sealed trait QueryExpr extends Statement

/** WITH name AS (query), … body — common table expressions (beyond-reference
  * extension). CTEs are scoped to the statement and may reference earlier
  * CTEs in the same list. Translation inlines each use (same policy as
  * Spark SQL's default CTE inlining — Catalyst may still reuse the subplan
  * via exchange/subquery reuse).
  *
  * `recursive`: WITH RECURSIVE — a self-referencing CTE must be
  * `anchor UNION [ALL] step`; it evaluates as a driver-coordinated
  * fixpoint loop (Spark has no fixpoint operator): each iteration binds
  * the CTE name to the previous delta, UNION dedups against everything
  * seen (cycle-safe), UNION ALL stops when a step yields no rows. */
final case class With(ctes: Seq[(String, QueryExpr)], body: QueryExpr,
                      recursive: Boolean = false) extends QueryExpr

final case class Select(
    distinct: Boolean,
    projection: Seq[Projection],
    from: Option[Relation],                // None => `dual` (flinkdsl/typer.scala_:355)
    where: Option[Expr],
    groupBy: Option[GroupBy],
    orderBy: Seq[SortKey],
    limit: Option[Limit],
    // QUALIFY <pred>: filter on analytic/window results after projection
    // (Snowflake/DuckDB semantics: runs after window functions, before
    // DISTINCT/ORDER BY). Beyond-reference extension.
    qualify: Option[Expr] = None,
    // DISTINCT ON (k, …) — Postgres/DuckDB: keep ONE row per key tuple,
    // chosen by the query's ORDER BY (first row per key). Evaluated after
    // QUALIFY, before ORDER BY/LIMIT. Empty = plain DISTINCT semantics.
    distinctOn: Seq[Expr] = Nil,
    // `WINDOW w AS (…)` specs: name → (PARTITION BY, ORDER BY, frame).
    // Kept on the node so clauses attached AFTER the SELECT parses (the
    // trailing ORDER BY, owned by the enclosing query parser) can still
    // expand `OVER w` refs; always consumed at parse time.
    namedWindows: Seq[(String, (Seq[Expr], Seq[SortKey], Option[WindowFrame]))] = Nil)
  extends QueryExpr

/** UNION/EXCEPT/INTERSECT [ALL] — flinkdsl/parser.scala:35-40. Unlike the
  * reference we keep (and honor) the ALL flag. `byName` is the DuckDB
  * `UNION [ALL] BY NAME` extension: align columns by name (union of both
  * schemas, absent columns NULL) instead of by position. */
final case class SetOp(
    left: QueryExpr,
    op: SetOpKind,
    all: Boolean,
    right: QueryExpr,
    orderBy: Seq[SortKey],
    limit: Option[Limit],
    byName: Boolean = false) extends QueryExpr

sealed trait SetOpKind
case object Union extends SetOpKind
case object Except extends SetOpKind
case object Intersect extends SetOpKind

final case class Projection(expr: Expr, alias: Option[String]) {
  /** Default output name, mirroring fsql/Ast.scala:107-109. */
  def outputName: String = alias.getOrElse(Projection.defaultName(expr))
}
object Projection {
  def defaultName(e: Expr): String = e match {
    case ColRef(_, n)      => n
    case Lit(_)            => "<constant>"
    case _: CaseWhen       => "case"
    case FuncCall(n, _, _) => n
    case w: WindowFn       => w.fn.name
    case _: Input          => "?"
    case _                 => "expr"
  }
}

/** `cube` (WITH CUBE — all key combinations, not just prefixes) and
  * `sets` (GROUP BY GROUPING SETS ((a,b),(a),())) are beyond-reference
  * extensions; the reference grammar has only WITH ROLLUP
  * (flinkdsl/parser.scala:258-262). When `sets` is present, `exprs` holds
  * the distinct union of all set members (the grouping columns). */
final case class GroupBy(exprs: Seq[Expr], rollup: Boolean, having: Option[Expr],
                         cube: Boolean = false,
                         sets: Option[Seq[Seq[Expr]]] = None,
                         // GROUP BY ALL (DuckDB-style): keys = every
                         // projection with no aggregate; resolved at
                         // translation time
                         all: Boolean = false)

/** `nullsFirst`: None = engine default (Spark: NULLS FIRST on ASC, NULLS
  * LAST on DESC); explicit `NULLS FIRST`/`LAST` overrides (beyond-reference
  * extension — DuckDB defaults differ, so cross-engine queries want it
  * explicit). */
final case class SortKey(expr: Expr, ascending: Boolean,
                         nullsFirst: Option[Boolean] = None)

/** LIMIT n [OFFSET m] — both `?`-parameterizable (flinkdsl/parser.scala:266). */
/** LIMIT/OFFSET tail. `n = None` = no row cap (ANSI `OFFSET n ROWS` with
  * no FETCH clause). `withTies` = ANSI/Postgres `FETCH FIRST n ROWS WITH
  * TIES`: peers (by the ORDER BY keys) of the n-th row are included. */
final case class Limit(n: Option[Expr], offset: Option[Expr],
                       withTies: Boolean = false)
object Limit {
  def apply(n: Expr, offset: Option[Expr]): Limit = Limit(Some(n), offset)
}

// ---------------------------------------------------------------------------
// Relations (FROM clause)
// ---------------------------------------------------------------------------

sealed trait Relation

/** Named table/stream, optional window spec (streaming dialect) + alias. */
final case class TableRef(
    name: String,
    alias: Option[String],
    window: Option[WindowSpec]) extends Relation {
  def refName: String = alias.getOrElse(name)
}

/** Derived table `(select …) as name` — fsql/Ast.scala:100-103. */
final case class DerivedRel(
    query: QueryExpr,
    alias: String,
    window: Option[WindowSpec]) extends Relation

/** `[CROSS|LEFT] JOIN LATERAL (select …) AS name [ON pred]` — a derived
  * table that may reference columns of relations to its left (top-N-per-
  * group, per-row lookups). Lowers to `Dataset.lateralJoin` with
  * `.outer()`-marked references; Catalyst decorrelates (DomainJoin), so
  * ORDER BY/LIMIT inside apply PER OUTER ROW. Beyond-reference extension. */
final case class LateralRel(query: QueryExpr, alias: String) extends Relation

/** Table function in FROM: `range(a, b [, step])` (end-exclusive) and
  * `generate_series(a, b [, step])` (end-inclusive) — DuckDB-compatible
  * numeric series sources, lowering to `spark.range` (a parallel,
  * partition-splittable Range node — not a literal list). */
final case class TableFnRel(name: String, args: Seq[Expr],
                            alias: Option[String]) extends Relation {
  def refName: String = alias.getOrElse(name)
}

/** `(values (…), (…)) as t(c1, c2)` — inline literal relation (ANSI
  * VALUES list; beyond-reference extension). Column names default to
  * col1..colN when the alias carries no column list. */
final case class ValuesRel(rows: Seq[Seq[Expr]], alias: String,
                           cols: Option[Seq[String]]) extends Relation

/** `rel sample (N percent) [seed K]` — Bernoulli row sampling
  * (beyond-reference extension; training-data pipelines subsample
  * constantly). Seeded for reproducibility; per-partition independent, so
  * it scales with no shuffle. */
final case class SampleRel(rel: Relation, percent: Double,
                           seed: Option[Long]) extends Relation

/** `rel PIVOT (agg FOR col IN (v [AS name], …))` — Spark-SQL-style pivot
  * (beyond-reference extension; wide feature matrices). Groups implicitly
  * on every column not named in the aggregate or the pivot column, one
  * output column per IN value. Values must be literals (the explicit
  * value list is what keeps the plan static — no driver-side distinct
  * scan to discover columns). */
final case class PivotRel(rel: Relation, agg: FuncCall, pivotCol: ColRef,
                          values: Seq[(Expr, Option[String])]) extends Relation

/** `rel UNPIVOT (valCol FOR nameCol IN (c1, c2, …))` — wide → long
  * (Spark `Dataset.unpivot`; a narrow per-row expansion, no shuffle). */
final case class UnpivotRel(rel: Relation, valCol: String, nameCol: String,
                            cols: Seq[String]) extends Relation

final case class JoinRel(
    left: Relation,
    right: Relation,
    kind: JoinKind,
    condition: Option[JoinCondition]) extends Relation

sealed trait JoinKind
case object InnerJoin extends JoinKind
case object LeftJoin extends JoinKind
case object RightJoin extends JoinKind
case object FullJoin extends JoinKind
case object CrossJoin extends JoinKind
/** `ASOF [LEFT] JOIN … ON keys = … AND l.t >= r.t` — for each left row,
  * the single latest right row at-or-before its time on the same keys
  * (DuckDB-compatible surface; beyond-reference extension). LEFT keeps
  * unmatched left rows with NULL payload; plain ASOF drops them. Lowers
  * to operators.AsOf.join — one keyed shuffle, no range-join blowup. */
final case class AsofJoin(leftOuter: Boolean) extends JoinKind
/** `[LEFT] SEMI JOIN` / `[LEFT] ANTI JOIN` — DuckDB/Spark-SQL explicit
  * filtering joins (beyond-reference extension): keep left rows with (semi)
  * or without (anti) a match; right columns never project. Same plan the
  * WHERE [NOT] EXISTS rewrite produces, surfaced as first-class syntax. */
case object SemiJoin extends JoinKind
case object AntiJoin extends JoinKind

sealed trait JoinCondition
final case class On(predicate: Expr) extends JoinCondition
final case class Using(columns: Seq[String]) extends JoinCondition
/** `NATURAL JOIN` — equi-join on all same-named columns, resolved at
  * translation time against both sides' schemas (error when none). */
case object Natural extends JoinCondition

// ---------------------------------------------------------------------------
// Streaming windows — fsql/Ast.scala:132-136
// ---------------------------------------------------------------------------

/** `[size N (unit)? (on col)? (every M (unit)? (on col)?)? (partitioned on col)?]`
  * or `[session N unit (on col)? (partitioned on col)?]` — session (gap-based)
  * windows are a beyond-reference addition (SURVEY §2.9 notes them as a
  * deliberate extension Spark supports natively). */
final case class WindowSpec(
    size: Policy,
    every: Option[Policy],
    partition: Option[ColRef],
    session: Boolean = false,
    watermark: Option[Policy] = None)

/** PolicyBased(value, timeUnit, onField) — fsql/Ast.scala:136.
  * timeUnit None => count-based window (the custom stateful op, SURVEY W2). */
final case class Policy(value: Long, timeUnit: Option[String], onField: Option[ColRef])

// ---------------------------------------------------------------------------
// Expressions (scalar + predicate unified, Spark-style)
// ---------------------------------------------------------------------------

sealed trait Expr

final case class ColRef(qualifier: Option[String], name: String) extends Expr {
  def sqlName: String = qualifier.fold(name)(q => s"$q.$name")
}
final case class Star(qualifier: Option[String]) extends Expr

/** `* EXCLUDE (a, b) REPLACE (expr AS name, …)` — DuckDB star modifiers
  * (beyond-reference extension). EXCLUDE drops named columns from the
  * expansion; REPLACE substitutes an expression for a column while keeping
  * its position and name. Wide training tables make both ergonomically
  * essential (`SELECT * EXCLUDE (raw_bytes)` over a 200-column frame). */
final case class StarMod(qualifier: Option[String], exclude: Seq[String],
                         replace: Seq[(Expr, String)]) extends Expr

/** Literal: Long, Double, String, Boolean or null (fsql/parser.scala:361-371;
  * integer literals → Long, decimal → Double, flinkdsl/parser.scala:163). */
final case class Lit(value: Any) extends Expr

final case class Arith(op: String, left: Expr, right: Expr) extends Expr
final case class Neg(child: Expr) extends Expr
final case class BitNot(child: Expr) extends Expr

/** Generic function call; `distinct` covers count(distinct x) which the
  * reference parses-and-drops (flinkdsl/parser.scala:210) but we implement. */
final case class FuncCall(name: String, args: Seq[Expr], distinct: Boolean = false) extends Expr

/** Searched CASE (`case when p then v …`) or, with `subject` set, simple
  * CASE (`case x when v1 then r1 …` — branch conditions are equality
  * comparisons against the subject). */
final case class CaseWhen(branches: Seq[(Expr, Expr)], otherwise: Option[Expr],
                          subject: Option[Expr] = None) extends Expr

/** Explicit `ROWS/RANGE BETWEEN lo AND hi` window frame. Bounds use
  * Spark's convention: Long.MinValue = UNBOUNDED PRECEDING, 0 = CURRENT
  * ROW, Long.MaxValue = UNBOUNDED FOLLOWING, negative = N PRECEDING,
  * positive = N FOLLOWING. */
/** `intervalUs = true` marks a RANGE frame whose bounds came from
  * day-time INTERVAL literals, encoded in epoch microseconds (the
  * translator then orders the frame on unix_micros of the single
  * timestamp sort key — a monotonic bijection, so peers and frame
  * membership are identical to native timestamp RANGE). */
final case class WindowFrame(
    rows: Boolean, lo: Long, hi: Long, intervalUs: Boolean = false)

/** `fn(args) OVER (PARTITION BY … ORDER BY … [frame])` — analytic/window
  * function. Beyond-reference extension (SURVEY §2.7 notes the reference
  * has no OVER clause anywhere): ranking (row_number/rank/dense_rank/
  * ntile), offset (lag/lead), and any aggregate over a partition frame.
  * Without an explicit frame the SQL defaults apply (RANGE UNBOUNDED
  * PRECEDING..CURRENT ROW with ORDER BY, whole partition without) —
  * identical in Spark and DuckDB. */
final case class WindowFn(
    fn: FuncCall,
    partitionBy: Seq[Expr],
    orderBy: Seq[SortKey],
    frame: Option[WindowFrame] = None,
    // `fn(x) IGNORE NULLS OVER (…)` — skip NULLs in offset/value window
    // functions (lag/lead/first_value/last_value/nth_value/any_value)
    ignoreNulls: Boolean = false,
    // `fn() OVER w` — reference to a named window from the WINDOW clause;
    // resolved (expanded) at parse time, never survives into translation
    ref: Option[String] = None) extends Expr

/** `INTERVAL n unit` literal (beyond-reference extension) — timestamp
  * arithmetic for time-series/windowing pipelines. Units second..year;
  * lowers to Spark make_dt_interval / make_ym_interval. */
final case class IntervalLit(value: Long, unit: String) extends Expr

/** `?` positional parameter — fsql/Ast.scala:164. */
final case class Input() extends Expr

/** `x -> body` / `(x, y) -> body` — lambda argument to a higher-order
  * array function (transform/filter/forall/array_exists/aggregate/
  * zip_with). Params shadow outer columns inside the body. Only valid
  * as a direct function argument. */
final case class Lambda(params: Seq[String], body: Expr) extends Expr

/** CAST(e AS type) — beyond-reference extension (the reference has no cast
  * syntax; its typer coerces implicitly). Type names are the DDL type
  * vocabulary (long/int/double/string/boolean/timestamp/array<…>).
  * `safe`: TRY_CAST — invalid input yields NULL instead of an error
  * (essential under ANSI mode, where plain CAST fails the job). */
final case class Cast(e: Expr, dataType: String, safe: Boolean = false) extends Expr

final case class ScalarSubquery(query: QueryExpr) extends Expr

// --- predicates -----------------------------------------------------------

final case class Cmp(op: String, left: Expr, right: Expr) extends Expr
final case class And(left: Expr, right: Expr) extends Expr
final case class Or(left: Expr, right: Expr) extends Expr
final case class Not(child: Expr) extends Expr
final case class Between(e: Expr, lo: Expr, hi: Expr, negated: Boolean) extends Expr
/** `[NOT] [I]LIKE pattern [ESCAPE ch]` — `ci` = ILIKE (case-insensitive,
  * Postgres/DuckDB), `escape` = custom escape character. */
final case class Like(e: Expr, pattern: Expr, negated: Boolean,
                      ci: Boolean = false,
                      escape: Option[Expr] = None) extends Expr
final case class IsNull(e: Expr, negated: Boolean) extends Expr
final case class InList(e: Expr, list: Seq[Expr], negated: Boolean) extends Expr
final case class InSubquery(e: Expr, query: QueryExpr, negated: Boolean) extends Expr
final case class Exists(query: QueryExpr, negated: Boolean) extends Expr
/** `e op ANY/SOME/ALL (subquery)` — quantified comparison (ANSI; beyond the
  * reference's F5/F6 subquery predicates). Lowers to semi/anti joins as a
  * WHERE conjunct, like IN/EXISTS. `all=false` covers ANY and SOME. */
final case class QuantifiedCmp(op: String, e: Expr, query: QueryExpr,
                               all: Boolean) extends Expr
/** `a IS [NOT] DISTINCT FROM b` — null-safe comparison (Spark `<=>`). */
final case class DistinctFrom(left: Expr, right: Expr, negated: Boolean) extends Expr

object Expr {
  /** Walk an expression tree (children-first not needed; pre-order). */
  def fold[A](e: Expr, z: A)(f: (A, Expr) => A): A = {
    val a = f(z, e)
    children(e).foldLeft(a)((acc, c) => fold(c, acc)(f))
  }

  def children(e: Expr): Seq[Expr] = e match {
    case Arith(_, l, r)       => Seq(l, r)
    case Neg(c)               => Seq(c)
    case BitNot(c)            => Seq(c)
    case FuncCall(_, as, _)   => as
    case CaseWhen(bs, o, subj) => subj.toSeq ++ bs.flatMap(b => Seq(b._1, b._2)) ++ o.toSeq
    // NOTE: children are the fn's ARGS, not the fn node itself —
    // `sum(x) over (…)` is per-row analytic, not a grouping aggregate, so
    // hasAggregate must not see the inner FuncCall.
    case w: WindowFn => w.fn.args ++ w.partitionBy ++ w.orderBy.map(_.expr)
    case StarMod(_, _, repl)  => repl.map(_._1)
    case Lambda(_, b)         => Seq(b)
    case Cmp(_, l, r)         => Seq(l, r)
    case And(l, r)            => Seq(l, r)
    case Or(l, r)             => Seq(l, r)
    case Not(c)               => Seq(c)
    case Between(a, b, c, _)  => Seq(a, b, c)
    case Like(a, b, _, _, esc) => Seq(a, b) ++ esc
    case IsNull(a, _)         => Seq(a)
    case InList(a, l, _)      => a +: l
    case InSubquery(a, _, _)  => Seq(a)
    case QuantifiedCmp(_, a, _, _) => Seq(a)
    case DistinctFrom(l, r, _) => Seq(l, r)
    case c: Cast              => Seq(c.e)
    case _                    => Nil
  }

  /** Does this expression contain an aggregate function call? */
  def hasAggregate(e: Expr, isAgg: String => Boolean): Boolean =
    fold(e, false) {
      case (acc, FuncCall(n, _, _)) => acc || isAgg(n.toLowerCase)
      case (acc, _)                 => acc
    }

  /** Bottom-up rewrite: children first, then `f` on the rebuilt node (nodes
    * `f` doesn't cover pass through unchanged). Subquery BODIES are NOT
    * entered — they have their own name scope — but outer-scope positions
    * (e.g. the tested expression of `x IN (subquery)`) are. */
  def transform(e: Expr)(f: PartialFunction[Expr, Expr]): Expr = {
    def go(x: Expr): Expr = {
      val rebuilt = x match {
        case Arith(op, l, r)       => Arith(op, go(l), go(r))
        case Neg(c)                => Neg(go(c))
        case BitNot(c)             => BitNot(go(c))
        case FuncCall(n, as, d)    => FuncCall(n, as.map(go), d)
        case w: WindowFn =>
          val fn2 = go(w.fn) match {
            case fc: FuncCall => fc
            case other => throw new IllegalArgumentException(
              s"cannot rewrite a window function call into ${other.getClass.getSimpleName}")
          }
          w.copy(fn = fn2, partitionBy = w.partitionBy.map(go),
            orderBy = w.orderBy.map(k => k.copy(expr = go(k.expr))))
        case sm @ StarMod(_, _, repl) =>
          sm.copy(replace = repl.map { case (e, n) => (go(e), n) })
        case l: Lambda             => l.copy(body = go(l.body))
        case CaseWhen(bs, o, subj) =>
          CaseWhen(bs.map { case (c, v) => (go(c), go(v)) }, o.map(go), subj.map(go))
        case Cmp(op, l, r)         => Cmp(op, go(l), go(r))
        case And(l, r)             => And(go(l), go(r))
        case Or(l, r)              => Or(go(l), go(r))
        case Not(c)                => Not(go(c))
        case Between(a, lo, hi, n) => Between(go(a), go(lo), go(hi), n)
        case Like(a, p, n, ci, esc) => Like(go(a), go(p), n, ci, esc.map(go))
        case IsNull(a, n)          => IsNull(go(a), n)
        case InList(a, l, n)       => InList(go(a), l.map(go), n)
        case InSubquery(a, q, n)   => InSubquery(go(a), q, n) // scrutinee is outer scope
        case QuantifiedCmp(op, a, q, all) => QuantifiedCmp(op, go(a), q, all)
        case DistinctFrom(l, r, n) => DistinctFrom(go(l), go(r), n)
        case c: Cast               => c.copy(e = go(c.e))
        case other                 => other
      }
      f.applyOrElse(rebuilt, identity[Expr])
    }
    go(e)
  }
}
