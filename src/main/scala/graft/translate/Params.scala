package graft.translate

import graft.ast._

/** Positional `?` parameter binding (reference P8: `Input()` terms collected
  * in syntactic order, `flinkdsl/typer.scala_:33-158`). We rewrite the AST,
  * replacing each `Input()` with a literal, visiting clauses in the query's
  * textual order — projection, FROM (incl. subqueries), WHERE, GROUP
  * BY/HAVING, ORDER BY, LIMIT/OFFSET — so arg positions match the SQL text.
  */
object Params {

  def bind(stmt: Statement, args: Seq[Any]): Statement = {
    val b = new Binder(args)
    val out = b.statement(stmt)
    require(b.used == args.length,
      s"statement has ${b.used} ? parameter(s) but ${args.length} arg(s) given")
    out
  }

  private final class Binder(args: Seq[Any]) {
    var used = 0

    private def next(): Any = {
      require(used < args.length, s"missing argument for ? parameter #${used + 1}")
      val v = args(used); used += 1; v
    }

    def statement(s: Statement): Statement = s match {
      case q: QueryExpr => query(q)
      case Insert(t, w, cs, in) => Insert(t, w, cs, in match {
        case InsertValues(rows) => InsertValues(rows.map(_.map(expr)))
        case InsertSelect(q)    => InsertSelect(query(q))
      })
      case Update(ts, set, w, ob, lim) =>
        Update(ts, set.map { case (c, e) => (c, expr(e)) }, w.map(expr),
          ob.map(k => k.copy(expr = expr(k.expr))), lim.map(limit))
      case Delete(ts, w) => Delete(ts, w.map(expr))
      case Merge(t, src, on, actions) =>
        Merge(t, relation(src), expr(on), actions.map {
          case MergeUpdate(c, set) =>
            MergeUpdate(c.map(expr), set.map { case (cr, e) => (cr, expr(e)) })
          case MergeDelete(c)         => MergeDelete(c.map(expr))
          case MergeInsert(c, cs, vs) => MergeInsert(c.map(expr), cs, vs.map(expr))
        })
      case CreateStream(n, sch, src) => CreateStream(n, sch, src.map {
        case DerivedSource(q) => DerivedSource(query(q))
        case other            => other
      })
      // plan-only wrappers still carry bindable ? parameters in their query
      case Explain(q, an)   => Explain(query(q), an)
      case DescribeQuery(q) => DescribeQuery(query(q))
      case other => other
    }

    def query(q: QueryExpr): QueryExpr = q match {
      case s: Select => select(s)
      case With(ctes, body, rec) =>
        // textual order: CTE bodies first, then the main query
        With(ctes.map { case (n, cq) => (n, query(cq)) }, query(body), rec)
      case SetOp(l, op, all, r, ob, lim, byName) =>
        SetOp(query(l), op, all, query(r),
          ob.map(k => k.copy(expr = expr(k.expr))), lim.map(limit), byName)
    }

    private def select(s: Select): Select = s.copy(
      // DISTINCT ON keys precede the projection in the SQL text, so they
      // must consume ? arguments first (named args evaluate in call order)
      distinctOn = s.distinctOn.map(expr),
      projection = s.projection.map(p => p.copy(expr = expr(p.expr))),
      from = s.from.map(relation),
      where = s.where.map(expr),
      // .copy, not positional construction: new GroupBy fields (e.g. cube)
      // must survive binding untouched
      groupBy = s.groupBy.map(g => g.copy(exprs = g.exprs.map(expr),
        having = g.having.map(expr),
        sets = g.sets.map(_.map(_.map(expr))))),
      qualify = s.qualify.map(expr),
      orderBy = s.orderBy.map(k => k.copy(expr = expr(k.expr))),
      limit = s.limit.map(limit))

    private def limit(l: Limit): Limit =
      Limit(l.n.map(expr), l.offset.map(expr), l.withTies)

    private def relation(r: Relation): Relation = r match {
      case t: TableRef => t
      case SampleRel(b, p, s)   => SampleRel(relation(b), p, s)
      case PivotRel(b, agg, c, vs) =>
        PivotRel(relation(b), expr(agg).asInstanceOf[FuncCall], c,
          vs.map { case (v, a) => (expr(v), a) })
      case UnpivotRel(b, v, n, cs) => UnpivotRel(relation(b), v, n, cs)
      case ValuesRel(rows, a, cs) => ValuesRel(rows.map(_.map(expr)), a, cs)
      case DerivedRel(q, a, w)  => DerivedRel(query(q), a, w)
      case LateralRel(q, a)     => LateralRel(query(q), a)
      case TableFnRel(n, as, a) => TableFnRel(n, as.map(expr), a)
      case JoinRel(l, rr, k, c) => JoinRel(relation(l), relation(rr), k, c.map {
        case On(p)  => On(expr(p))
        case other  => other // USING / NATURAL carry no expressions
      })
    }

    def expr(e: Expr): Expr = e match {
      case Input()               => Lit(next())
      case Arith(op, l, r)       => Arith(op, expr(l), expr(r))
      case Neg(c)                => Neg(expr(c))
      case BitNot(c)             => BitNot(expr(c))
      case FuncCall(n, as, d)    => FuncCall(n, as.map(expr), d)
      case w: WindowFn =>
        w.copy(fn = expr(w.fn).asInstanceOf[FuncCall], partitionBy = w.partitionBy.map(expr),
          orderBy = w.orderBy.map(k => k.copy(expr = expr(k.expr))))
      case CaseWhen(bs, o, subj) =>
        // textual order: subject first, then branches, then ELSE
        val s2 = subj.map(expr)
        CaseWhen(bs.map { case (c, v) => (expr(c), expr(v)) }, o.map(expr), s2)
      case ScalarSubquery(q)     => ScalarSubquery(query(q))
      case Cmp(op, l, r)         => Cmp(op, expr(l), expr(r))
      case And(l, r)             => And(expr(l), expr(r))
      case Or(l, r)              => Or(expr(l), expr(r))
      case Not(c)                => Not(expr(c))
      case Between(x, lo, hi, n) => Between(expr(x), expr(lo), expr(hi), n)
      case c: Cast               => c.copy(e = expr(c.e))
      case l: Lambda             => l.copy(body = expr(l.body))
      case Like(x, p, n, ci, esc) => Like(expr(x), expr(p), n, ci, esc.map(expr))
      case IsNull(x, n)          => IsNull(expr(x), n)
      case InList(x, l, n)       => InList(expr(x), l.map(expr), n)
      case InSubquery(x, q, n)   => InSubquery(expr(x), query(q), n)
      case Exists(q, n)          => Exists(query(q), n)
      case QuantifiedCmp(op, x, q, all) => QuantifiedCmp(op, expr(x), query(q), all)
      case DistinctFrom(l, r, n) => DistinctFrom(expr(l), expr(r), n)
      case other                 => other
    }
  }
}
