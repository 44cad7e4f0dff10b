package graft.ast

/** SQL pretty-printer for the unified AST: `parse(print(parse(s)))` must
  * equal `parse(s)` (round-trip property, SURVEY §5 strategy item 4 — the
  * reference kept expected ASTs only as comments, fsql/parser.scala:401).
  * Output is fully parenthesized where precedence matters, so the printer
  * never has to reason about the grammar's precedence table.
  */
object Pretty {

  def print(s: Statement): String = s match {
    case q: QueryExpr => query(q)
    case CreateSchema(n, fs, parent) =>
      s"create schema $n (${fs.map(fieldDef).mkString(", ")})" +
        parent.fold("")(p => s" extends $p")
    case CreateStream(n, schema, source) =>
      val sch = schema match {
        case NamedSchema(sn)    => s" $sn"
        case InlineSchema(fs)   => s" (${fs.map(fieldDef).mkString(", ")})"
      }
      val src = source match {
        case None                      => ""
        case Some(HostSource(h, p))    => s" source host('$h', $p)"
        case Some(FileSource(p))       => s" source file('$p')"
        case Some(DerivedSource(q))    => s" as (${query(q)})"
      }
      s"create stream $n$sch$src"
    case Insert(t, w, cols, input) =>
      val ws = w.fold("")(windowSpec)
      val cs = cols.fold("")(c => s" (${c.mkString(", ")})")
      val in = input match {
        case InsertValues(rows) =>
          " values " + rows.map(r => s"(${r.map(expr).mkString(", ")})").mkString(", ")
        case InsertSelect(q) => " " + query(q)
      }
      s"insert into $t$ws$cs$in"
    case Update(ts, set, where, orderBy, limit) =>
      s"update ${ts.map(rel).mkString(", ")} set " +
        set.map { case (c, e) => s"${c.sqlName} = ${expr(e)}" }.mkString(", ") +
        where.fold("")(w => s" where ${expr(w)}") +
        order(orderBy) + lim(limit)
    case Delete(ts, where) =>
      s"delete from ${ts.map(rel).mkString(", ")}" +
        where.fold("")(w => s" where ${expr(w)}")
    case CreateTableAs(n, q) => s"create table $n as ${query(q)}"
    case Explain(q, an) =>
      s"explain ${if (an) "analyze " else ""}${query(q)}"
    case ShowRelations(streamsOnly) => if (streamsOnly) "show streams" else "show tables"
    case Describe(r)                => s"describe $r"
    case DescribeQuery(q)           => s"describe (${query(q)})"
    case DropRelation(n, ie, tbl)   =>
      s"drop ${if (tbl) "table" else "stream"}${if (ie) " if exists" else ""} $n"
    case DropSchema(n, ie)          => s"drop schema${if (ie) " if exists" else ""} $n"
    case CreateModel(n, k, p)       => s"create model $n kind '$k' at '$p'"
    case DropModel(n, ie)           => s"drop model${if (ie) " if exists" else ""} $n"
    case ShowModels()               => "show models"
    case Merge(t, src, on, actions) =>
      val acts = actions.map {
        case MergeUpdate(c, set) =>
          s"when matched${c.fold("")(x => s" and ${expr(x)}")} then update set " +
            set.map { case (cr, e) => s"${cr.sqlName} = ${expr(e)}" }.mkString(", ")
        case MergeDelete(c) =>
          s"when matched${c.fold("")(x => s" and ${expr(x)}")} then delete"
        case MergeInsert(c, cols, vs) =>
          s"when not matched${c.fold("")(x => s" and ${expr(x)}")} then insert" +
            cols.fold("")(cs => s" (${cs.mkString(", ")})") +
            s" values (${vs.map(expr).mkString(", ")})"
      }.mkString(" ")
      s"merge into ${rel(t)} using ${rel(src)} on ${expr(on)} $acts"
  }

  def query(q: QueryExpr): String = q match {
    case With(ctes, body, rec) =>
      val cs = ctes.map { case (n, cq) => s"$n as (${query(cq)})" }.mkString(", ")
      s"with ${if (rec) "recursive " else ""}$cs ${query(body)}"
    case Select(distinct, proj, from, where, groupBy, orderBy, limit, qualify, distinctOn, _) =>
      val d =
        if (distinctOn.nonEmpty) s"distinct on (${distinctOn.map(expr).mkString(", ")}) "
        else if (distinct) "distinct "
        else ""
      val p = proj.map(pr => pr.alias.fold(expr(pr.expr))(a => s"${expr(pr.expr)} as $a"))
        .mkString(", ")
      val f = from.fold("")(r => s" from ${rel(r)}")
      val w = where.fold("")(e => s" where ${expr(e)}")
      val g = groupBy.fold("") { gb =>
        if (gb.all)
          " group by all" + gb.having.fold("")(h => s" having ${expr(h)}")
        else gb.sets match {
          case Some(ss) =>
            val sets = ss.map(s => s"(${s.map(expr).mkString(", ")})").mkString(", ")
            s" group by grouping sets ($sets)" +
              gb.having.fold("")(h => s" having ${expr(h)}")
          case None =>
            s" group by ${gb.exprs.map(expr).mkString(", ")}" +
              (if (gb.rollup) " with rollup" else if (gb.cube) " with cube" else "") +
              gb.having.fold("")(h => s" having ${expr(h)}")
        }
      }
      val ql = qualify.fold("")(e => s" qualify ${expr(e)}")
      s"select $d$p$f$w$g$ql${order(orderBy)}${lim(limit)}"
    case SetOp(l, op, all, r, orderBy, limit, byName) =>
      val o = op match {
        case Union => "union"; case Except => "except"; case Intersect => "intersect"
      }
      val a = (if (all) " all" else "") + (if (byName) " by name" else "")
      // operands that are themselves set ops or carry ORDER BY/LIMIT must be
      // parenthesized or the flat form re-parses left-associated / fails
      def operand(x: QueryExpr): String = x match {
        case _: SetOp => s"(${query(x)})"
        case sel: Select if sel.orderBy.nonEmpty || sel.limit.nonEmpty => s"(${query(x)})"
        case _ => query(x)
      }
      s"${operand(l)} $o$a ${operand(r)}${order(orderBy)}${lim(limit)}"
  }

  private def sortKey(k: SortKey): String =
    expr(k.expr) + (if (k.ascending) "" else " desc") +
      k.nullsFirst.fold("")(f => if (f) " nulls first" else " nulls last")

  private def order(keys: Seq[SortKey]): String =
    if (keys.isEmpty) "" else " order by " + keys.map(sortKey).mkString(", ")

  private def lim(l: Option[Limit]): String =
    l.fold("") { x =>
      if (x.withTies)
        x.offset.fold("")(o => s" offset ${expr(o)} rows") +
          x.n.fold("")(n => s" fetch first ${expr(n)} rows with ties")
      else
        x.n.fold("")(n => s" limit ${expr(n)}") +
          x.offset.fold("")(o => s" offset ${expr(o)}")
    }

  def rel(r: Relation): String = r match {
    case SampleRel(base, pct, seed) =>
      val p = if (pct == pct.floor) pct.toLong.toString else pct.toString
      s"${rel(base)} sample ($p percent)${seed.fold("")(s => s" seed $s")}"
    case PivotRel(base, agg, c, vs) =>
      val values = vs.map { case (v, a) =>
        expr(v) + a.fold("")(n => s" as $n") }.mkString(", ")
      s"${rel(base)} pivot (${expr(agg)} for ${expr(c)} in ($values))"
    case UnpivotRel(base, v, n, cs) =>
      s"${rel(base)} unpivot ($v for $n in (${cs.mkString(", ")}))"
    case ValuesRel(rows, alias, cols) =>
      val rs = rows.map(r => r.map(expr).mkString("(", ", ", ")")).mkString(", ")
      s"(values $rs) as $alias${cols.fold("")(_.mkString("(", ", ", ")"))}"
    case TableRef(n, alias, w) =>
      s"$n${w.fold("")(windowSpec)}${alias.fold("")(a => s" as $a")}"
    case DerivedRel(q, alias, w) =>
      s"(${query(q)})${w.fold("")(windowSpec)} as $alias"
    case LateralRel(q, alias) =>
      s"lateral (${query(q)}) as $alias"
    case TableFnRel(n, args, alias) =>
      s"$n(${args.map(expr).mkString(", ")})${alias.fold("")(a => s" as $a")}"
    case JoinRel(l, rr, kind, cond) =>
      val k = kind match {
        case InnerJoin => "join"
        case LeftJoin  => "left join"
        case RightJoin => "right join"
        case FullJoin  => "full outer join"
        case CrossJoin => "cross join"
        case SemiJoin  => "semi join"
        case AntiJoin  => "anti join"
        case AsofJoin(lo) => if (lo) "asof left join" else "asof join"
      }
      val c = cond match {
        case None             => ""
        case Some(On(p))      => s" on ${expr(p)}"
        case Some(Using(cs))  => s" using (${cs.mkString(", ")})"
        case Some(Natural)    => ""
      }
      val nat = if (cond.contains(Natural)) "natural " else ""
      s"${rel(l)} $nat$k ${rel(rr)}$c"
  }

  def windowSpec(w: WindowSpec): String = {
    val kind = if (w.session) "session" else "size"
    s" [$kind ${policy(w.size)}" +
      w.every.fold("")(e => s" every ${policy(e)}") +
      w.watermark.fold("")(m => s" watermark ${policy(m)}") +
      w.partition.fold("")(p => s" partitioned on ${p.sqlName}") + "]"
  }

  private def policy(p: Policy): String =
    s"${p.value}" + p.timeUnit.fold("")(u => s" $u") +
      p.onField.fold("")(f => s" on ${f.sqlName}")

  private def fieldDef(f: FieldDef): String = s"${f.name} ${f.dataType}"

  def expr(e: Expr): String = e match {
    case ColRef(q, n)  => q.fold(n)(x => s"$x.$n")
    case Star(None)    => "*"
    case Star(Some(q)) => s"$q.*"
    case StarMod(q, ex, re) =>
      q.fold("*")(x => s"$x.*") +
        (if (ex.nonEmpty) s" exclude (${ex.mkString(", ")})" else "") +
        (if (re.nonEmpty)
          s" replace (${re.map { case (e, n) => s"${expr(e)} as $n" }.mkString(", ")})"
        else "")
    case IntervalLit(v, u)    => s"interval $v $u"
    case Lit(null)            => "null"
    case Lit(s: String)       => "'" + s.replace("'", "''") + "'"
    case Lit(b: Boolean)      => b.toString
    case Lit(v)               => v.toString
    case Arith(op, l, r)      => s"(${expr(l)} $op ${expr(r)})"
    case Neg(c)               => s"(- ${expr(c)})"
    case BitNot(c)            => s"(~ ${expr(c)})"
    case FuncCall(n, args, d) =>
      val dd = if (d) "distinct " else ""
      s"$n($dd${args.map(expr).mkString(", ")})"
    case CaseWhen(bs, o, subj) =>
      "case " + subj.fold("")(x => s"${expr(x)} ") +
        bs.map { case (c, v) => s"when ${expr(c)} then ${expr(v)}" }.mkString(" ") +
        o.fold("")(x => s" else ${expr(x)}") + " end"
    case WindowFn(f, pb, ob, fr, ign, ref) =>
      def bound(n: Long): String = n match {
        case Long.MinValue     => "unbounded preceding"
        case Long.MaxValue     => "unbounded following"
        case 0                 => "current row"
        case x if x < 0        => s"${-x} preceding"
        case x                 => s"$x following"
      }
      // interval frames re-print µs offsets as the largest evenly-dividing
      // day-time unit, so parse ∘ print = id
      def ibound(n: Long): String = n match {
        case Long.MinValue | Long.MaxValue | 0 => bound(n)
        case x =>
          val a = math.abs(x)
          val (v, u) =
            if (a % 86400000000L == 0) (a / 86400000000L, "day")
            else if (a % 3600000000L == 0) (a / 3600000000L, "hour")
            else if (a % 60000000L == 0) (a / 60000000L, "minute")
            else (a / 1000000L, "second")
          s"interval $v $u ${if (x < 0) "preceding" else "following"}"
      }
      val parts = Seq(
        if (pb.nonEmpty) s"partition by ${pb.map(expr).mkString(", ")}" else "",
        if (ob.nonEmpty) "order by " + ob.map(sortKey).mkString(", ") else "",
        fr.fold("")(w =>
          if (w.intervalUs)
            s"range between ${ibound(w.lo)} and ${ibound(w.hi)}"
          else
            s"${if (w.rows) "rows" else "range"} between ${bound(w.lo)} and ${bound(w.hi)}")
      ).filter(_.nonEmpty)
      val spec = ref.getOrElse(s"(${parts.mkString(" ")})")
      s"${expr(f)}${if (ign) " ignore nulls" else ""} over $spec"
    case Input()              => "?"
    case Lambda(ps, b) =>
      val head = if (ps.length == 1) ps.head else ps.mkString("(", ", ", ")")
      s"$head -> ${expr(b)}"
    case Cast(e, t, safe)     => s"${if (safe) "try_cast" else "cast"}(${expr(e)} as $t)"
    case ScalarSubquery(q)    => s"(${query(q)})"
    case Cmp(op, l, r)        => s"(${expr(l)} $op ${expr(r)})"
    case And(l, r)            => s"(${expr(l)} and ${expr(r)})"
    case Or(l, r)             => s"(${expr(l)} or ${expr(r)})"
    case Not(c)               => s"(not ${expr(c)})"
    case Between(a, lo, hi, neg) =>
      s"(${expr(a)} ${if (neg) "not " else ""}between ${expr(lo)} and ${expr(hi)})"
    case Like(a, p, neg, ci, esc) =>
      s"(${expr(a)} ${if (neg) "not " else ""}${if (ci) "ilike" else "like"} ${expr(p)}" +
        esc.fold("")(e => s" escape ${expr(e)}") + ")"
    case IsNull(a, neg)       => s"(${expr(a)} is ${if (neg) "not " else ""}null)"
    case InList(a, l, neg)    =>
      s"(${expr(a)} ${if (neg) "not " else ""}in (${l.map(expr).mkString(", ")}))"
    case InSubquery(a, q, neg) =>
      s"(${expr(a)} ${if (neg) "not " else ""}in (${query(q)}))"
    case Exists(q, neg)       =>
      s"(${if (neg) "not " else ""}exists (${query(q)}))"
    case QuantifiedCmp(op, a, q, all) =>
      s"(${expr(a)} $op ${if (all) "all" else "any"} (${query(q)}))"
    case DistinctFrom(l, r, neg) =>
      s"(${expr(l)} is ${if (neg) "not " else ""}distinct from ${expr(r)})"
  }
}
