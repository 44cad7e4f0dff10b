package graft

import graft.ast._

/** Result-cardinality classification of a statement — the reference's
  * `TypedStatement.numOfResults` (flinkdsl/typer.scala_:17,19-21), inferred
  * from the unique-constraint metadata its typer collected at
  * flinkdsl/typer.scala_:180-203 (SchemaCrawler primary key + unique
  * indexes per table). The classification rules are the sqltyped lineage
  * the reference descends from:
  *
  *  - DML (INSERT/UPDATE/DELETE/…) executes once → [[Cardinality.One]]
  *    (flinkdsl/jdbc.scala_:15: `if (isQuery) Many else One`).
  *  - a global aggregate (no GROUP BY, every projection aggregated)
  *    returns exactly one row → [[Cardinality.One]].
  *  - a SELECT bounded by `LIMIT 0/1`, or whose WHERE equalities cover
  *    every column of a unique key (primary key or unique index) of its
  *    single source table → [[Cardinality.ZeroOrOne]].
  *  - anything else → [[Cardinality.Many]].
  *
  * Consumed by `GraftSession.one[T]` / `GraftSession.optional[T]`, the
  * typed single-row API next to `sqlAs[T]`.
  */
sealed trait Cardinality
object Cardinality {
  case object ZeroOrOne extends Cardinality
  case object One       extends Cardinality
  case object Many      extends Cardinality

  private def lower(s: String) = s.toLowerCase(java.util.Locale.ROOT)

  private def conjuncts(e: Expr): Seq[Expr] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Functions known to be PURE scalar functions (same value for the same
    * arguments, and per-QUERY-constant for the zero-arg temporal ones).
    * The dialect's function registry passes unknown names through to
    * Spark's whole builtin library, which contains per-row-varying
    * functions (rand, uuid, spark_partition_id, input_file_name, …) — a
    * deny-list can never be complete against a passthrough surface, so
    * the classifier ALLOW-lists: any function outside this set makes the
    * term non-constant, which errs toward Many (a safe rejection from
    * one()/optional(), never a wrong ZeroOrOne). */
  private val pureFns = Set(
    "abs", "round", "floor", "ceil", "ceiling", "sign", "mod", "pow",
    "power", "sqrt", "exp", "ln", "log", "log2", "log10", "greatest",
    "least", "coalesce", "nullif", "ifnull", "nvl", "concat", "upper",
    "lower", "trim", "ltrim", "rtrim", "substring", "substr", "length",
    "char_length", "replace", "reverse", "lpad", "rpad", "cast", "try_cast",
    "current_date", "current_timestamp", "now", "date_trunc", "date_add",
    "date_sub", "to_date", "to_timestamp", "year", "month", "day", "hour",
    "minute", "second")

  /** A term whose value is fixed per execution: an expression over
    * literals, bound `?` params, and known-pure functions only — no
    * column refs, no subqueries (covers `-5`, `'a' || 'b'`, `? + 1`, …). */
  private def constantTerm(e: Expr): Boolean =
    Expr.fold(e, true) {
      case (_, _: ColRef)           => false
      case (acc, _: Lit | _: Input) => acc
      case (acc, FuncCall(n, _, _)) => acc && pureFns(lower(n))
      case (acc, x) =>
        acc && !x.isInstanceOf[ScalarSubquery] && !x.isInstanceOf[InSubquery] &&
          !x.isInstanceOf[Exists] && !x.isInstanceOf[QuantifiedCmp] &&
          !x.isInstanceOf[WindowFn]
    }

  /** Generator functions multiply rows in projection position (the
    * registry lowers unnest → explode, etc.) — a FROM-less SELECT with
    * one is NOT one row. */
  private val generatorFns = Set("unnest", "explode", "explode_outer",
    "posexplode", "posexplode_outer", "inline", "inline_outer", "stack",
    "generate_series", "sequence_table", "range")

  private def hasGenerator(s: Select): Boolean =
    s.projection.exists(p => Expr.fold(p.expr, false) {
      case (acc, FuncCall(n, _, _)) => acc || generatorFns(lower(n))
      case (acc, _)                 => acc
    })

  /** Classify `stmt`. `keysOf` maps a (catalog) table name to its unique
    * keys — each a non-empty column list, any of which being fully covered
    * by WHERE equalities bounds the SELECT to at most one row. */
  def of(stmt: Statement, keysOf: String => Seq[Seq[String]]): Cardinality =
    stmt match {
      case s: Select    => ofSelect(s, keysOf)
      case With(ctes, body, _) =>
        // a CTE body classifies like its SELECT — except that CTE names
        // SHADOW catalog tables, so their declared keys must not apply
        val shadow = ctes.map(_._1.toLowerCase(java.util.Locale.ROOT)).toSet
        of(body, n => if (shadow(n)) Nil else keysOf(n))
      case _: QueryExpr => Many // set ops: no single-key bound
      case _            => One  // DML executes exactly once
    }

  private def ofSelect(s: Select, keysOf: String => Seq[Seq[String]]): Cardinality = {
    def isAggExpr(e: Expr) =
      Expr.hasAggregate(e, graft.functions.Registry.isAggregate)
    // LIMIT 0/1 bounds any SELECT — but WITH TIES keeps every peer of the
    // boundary row, so it does NOT bound the result
    if (s.limit.exists(l => !l.withTies &&
        l.n.exists { case Lit(n: Long) => n <= 1; case _ => false }))
      return ZeroOrOne
    // a projection-position generator multiplies every surviving row
    if (hasGenerator(s)) return Many
    // global aggregate: exactly one row regardless of WHERE — unless an
    // OFFSET can skip it (`select count(*) from t offset 1` returns zero
    // rows; ADVICE r6)
    if (s.groupBy.isEmpty && s.qualify.isEmpty && !s.distinct &&
        s.projection.nonEmpty && s.projection.exists(p => isAggExpr(p.expr)) &&
        s.projection.forall(p => isAggExpr(p.expr) || constantTerm(p.expr)))
      return if (s.limit.exists(_.offset.nonEmpty)) ZeroOrOne else One
    if (s.groupBy.nonEmpty) return Many
    s.from match {
      // FROM-less SELECT = one row over `dual` — unless a generator
      // multiplies it (→ Many), or WHERE/QUALIFY/OFFSET can drop it (→
      // ZeroOrOne)
      case None =>
        if (hasGenerator(s)) Many
        else if (s.where.isEmpty && s.qualify.isEmpty &&
                 s.limit.forall(_.offset.isEmpty)) One
        else ZeroOrOne
      case Some(t: TableRef) if t.window.isEmpty =>
        val ref = lower(t.refName)
        val eqCols = s.where.map(conjuncts).getOrElse(Nil).collect {
          case Cmp("=", ColRef(q, c), rhs)
              if constantTerm(rhs) && q.forall(lower(_) == ref) => lower(c)
          case Cmp("=", lhs, ColRef(q, c))
              if constantTerm(lhs) && q.forall(lower(_) == ref) => lower(c)
        }.toSet
        val keys = keysOf(lower(t.name))
        if (keys.exists(k => k.nonEmpty && k.forall(c => eqCols(lower(c)))))
          ZeroOrOne
        else Many
      case _ => Many
    }
  }
}
