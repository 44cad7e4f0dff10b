package graft.parser

import graft.ast._
import scala.util.parsing.combinator.{PackratParsers, RegexParsers}

/** Parser for the unified graft SQL dialect.
  *
  * Grammar coverage = the union of the reference's two dialects:
  *   - FSQL streaming (reference `fsql/parser.scala`): CREATE SCHEMA with
  *     `extends`, CREATE STREAM with host/file/derived sources, SELECT with
  *     `[size … every … partitioned on …]` window specs, cross/left joins,
  *     where/group-by/having, INSERT INTO stream[window].
  *   - flinkdsl batch (reference `flinkdsl/parser.scala`): full SELECT with
  *     all five join kinds, USING-lists, subqueries, IN/EXISTS/BETWEEN/LIKE,
  *     ORDER BY/LIMIT/OFFSET, UNION/EXCEPT/INTERSECT [ALL], rollup, `?`
  *     params, INSERT/UPDATE/DELETE, FOR UPDATE (parsed, no-op).
  *
  * Design differences from the reference (deliberate, see SURVEY §7.4):
  *   - identifiers do NOT allow `-` (the reference's lexer did at
  *     fsql/parser.scala:338, which collides with arithmetic);
  *   - `DISTINCT` (projection + inside aggregate args) is kept in the AST
  *     and honored, not parsed-and-dropped;
  *   - the set-operation `ALL` flag is kept and honored.
  */
object SqlParser extends RegexParsers with PackratParsers {

  override protected val whiteSpace =
    """(\s|--[^\n]*\n?|/\*(?s:.*?)\*/)+""".r

  // ----- lexical -----------------------------------------------------------

  /** Reserved words — only those that would make the grammar ambiguous as
    * identifiers. Context keywords (schema/stream/extends/source/size/every/
    * partitioned) stay usable as table/column names: the reference's own
    * test corpus queries a table literally named `stream`
    * (test/parserTest.scala:53). */
  private val keywords: Set[String] = Set(
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "offset", "as", "and", "or", "not", "in", "exists", "between", "like",
    "is", "null", "true", "false", "case", "when", "then", "else", "end",
    "join", "inner", "left", "right", "full", "outer", "cross", "on",
    "using", "union", "except", "intersect", "all", "distinct", "create",
    "insert", "into", "values", "update", "set", "delete", "asc", "desc",
    "collate", "for", "rollup", "with", "qualify", "sample", "pivot",
    "unpivot", "asof", "semi", "anti", "natural", "lateral",
    // ANSI reserves WINDOW and FETCH; as table aliases they would swallow
    // the WINDOW clause / a no-ORDER-BY FETCH tail (opt(alias) is
    // possessive — no backtracking past it)
    "window", "fetch")

  private def kw(w: String): Parser[String] =
    (s"""(?i)\\Q$w\\E\\b""").r ^^ (_.toLowerCase(java.util.Locale.ROOT))

  private def kws(ws: String*): Parser[String] = ws.map(kw).reduce(_ | _)

  lazy val ident: Parser[String] =
    // back-quoted form admits reserved words and special characters
    ("`" ~> """[^`]+""".r <~ "`") |
    """[a-zA-Z_][a-zA-Z0-9_]*""".r.filter(s => !keywords(s.toLowerCase(java.util.Locale.ROOT)))
      .withFailureMessage("identifier expected")

  /** `t.c` or bare `c` (optionally back-quoted parts). */
  lazy val colRef: PackratParser[ColRef] =
    opt(ident <~ ".") ~ ident ^^ { case q ~ n => ColRef(q, n) }

  lazy val stringLit: Parser[String] =
    """'([^']|'')*'""".r ^^ (s => s.substring(1, s.length - 1).replace("''", "'"))

  /** Integer literal → Long, decimal → Double (fsql/parser.scala:122). */
  lazy val numericLit: Parser[Lit] =
    """\d+\.\d+([eE][-+]?\d+)?|\d+[eE][-+]?\d+""".r ^^ (s => Lit(s.toDouble)) |
    """\d+""".r ^^ (s => Lit(s.toLong))

  // ----- entry points ------------------------------------------------------

  def parse(sql: String): Either[String, Statement] =
    try parseAll(phrase(stmt), sql) match {
      case Success(s, _) => Right(s)
      case NoSuccess(msg, next) =>
        Left(s"parse error at line ${next.pos.line}, col ${next.pos.column}: $msg")
      case other => Left(s"parse error: $other")
    } catch {
      // semantic actions may reject (e.g. ORDER BY on a subquery that already
      // has one) — keep the Either contract instead of leaking exceptions
      case e: IllegalArgumentException => Left(s"parse error: ${e.getMessage}")
    }

  def parseQuery(sql: String): Either[String, QueryExpr] =
    parse(sql) match {
      case Right(q: QueryExpr) => Right(q)
      case Right(other)        => Left(s"expected a query, got: ${other.getClass.getSimpleName}")
      case Left(e)             => Left(e)
    }

  lazy val stmt: PackratParser[Statement] =
    createSchemaStmt | createStreamStmt | createTableStmt | createModelStmt |
    insertStmt | updateStmt |
    deleteStmt | mergeStmt | explainStmt | showStmt | describeStmt |
    dropStmt | query

  lazy val showStmt: PackratParser[Statement] =
    kw("show") ~> (kw("streams") ^^^ ShowRelations(streamsOnly = true) |
                   kw("tables") ^^^ ShowRelations(streamsOnly = false) |
                   kw("models") ^^^ ShowModels())

  lazy val describeStmt: PackratParser[Statement] =
    (kw("describe") | kw("desc")) ~> "(" ~> query <~ ")" ^^ DescribeQuery.apply |
    (kw("describe") | kw("desc")) ~> ident ^^ Describe.apply

  lazy val dropStmt: PackratParser[Statement] =
    kw("drop") ~> (kw("stream") | kw("table")) ~
      opt(kw("if") ~> kw("exists")) ~ ident ^^ {
        case kind ~ ie ~ n => DropRelation(n, ie.isDefined, table = kind == "table")
      } |
    kw("drop") ~> kw("schema") ~> opt(kw("if") ~> kw("exists")) ~ ident ^^ {
      case ie ~ n => DropSchema(n, ie.isDefined)
    } |
    kw("drop") ~> kw("model") ~> opt(kw("if") ~> kw("exists")) ~ ident ^^ {
      case ie ~ n => DropModel(n, ie.isDefined)
    }

  lazy val explainStmt: PackratParser[Statement] =
    kw("explain") ~> kw("analyze") ~> query ^^ (q => Explain(q, analyze = true)) |
    kw("explain") ~> query ^^ (q => Explain(q))

  // ----- queries -----------------------------------------------------------

  /** [WITH ctes] set-op query — the WITH list scopes over the whole query
    * (including its trailing ORDER BY/LIMIT). */
  lazy val query: PackratParser[QueryExpr] =
    opt(kw("with") ~> opt(kw("recursive")) ~ rep1sep(cteDef, ",")) ~ setQuery ^^ {
      case None ~ q              => q
      case Some(rec ~ ctes) ~ q  => With(ctes, q, recursive = rec.isDefined)
    }

  lazy val cteDef: PackratParser[(String, QueryExpr)] =
    ident ~ (kw("as") ~> "(" ~> query <~ ")") ^^ { case n ~ q => (n, q) }

  /** intersectOperand ((UNION|EXCEPT) [ALL] intersectOperand)* [order][limit]
    * — trailing ORDER BY/LIMIT bind to the whole set operation, per SQL (and
    * flinkdsl/ast.scala:163-167's SetStatement carrying its own orderBy).
    * ANSI precedence (shared by DuckDB and Spark SQL, caught by the
    * differential fuzz): INTERSECT binds TIGHTER than UNION/EXCEPT, so
    * `a except b intersect c` = `a except (b intersect c)`; within each
    * level operators associate left. */
  lazy val setQuery: PackratParser[QueryExpr] = {
    val op: Parser[(SetOpKind, Boolean, Boolean)] =
      (kw("union") ^^^ Union | kw("except") ^^^ Except) ~ opt(kw("all")) ~
        opt(kw("by") ~ kw("name")) ^^ {
        case k ~ a ~ bn =>
          // BY NAME (DuckDB extension): only UNION aligns by name
          if (bn.isDefined && k != Union)
            throw new IllegalArgumentException(
              "BY NAME is only supported on UNION [ALL]")
          (k, a.isDefined, bn.isDefined)
      }
    intersectQuery ~ rep(op ~ intersectQuery) ~ opt(orderByClause) ~ opt(limitClause) <~
      opt(kw("for") ~ kw("update")) ^^ {
      case first ~ Nil ~ ob ~ lim => attachTail(first, ob.getOrElse(Nil), lim)
      case first ~ rest ~ ob ~ lim =>
        val chained = rest.foldLeft(first) {
          case (l, (k, all, byName) ~ r) => SetOp(l, k, all, r, Nil, None, byName)
        }
        attachTail(chained, ob.getOrElse(Nil), lim)
    }
  }

  /** The INTERSECT precedence level: queryOperand (INTERSECT [ALL]
    * queryOperand)*, left-associative. */
  lazy val intersectQuery: PackratParser[QueryExpr] = {
    val iop: Parser[Boolean] =
      kw("intersect") ~> opt(kw("all")) ~ opt(kw("by") ~ kw("name")) ^^ {
        case a ~ bn =>
          if (bn.isDefined)
            throw new IllegalArgumentException(
              "BY NAME is only supported on UNION [ALL]")
          a.isDefined
      }
    queryOperand ~ rep(iop ~ queryOperand) ^^ {
      case first ~ rest =>
        rest.foldLeft(first) {
          case (l, all ~ r) => SetOp(l, Intersect, all, r, Nil, None, byName = false)
        }
    }
  }

  lazy val queryOperand: PackratParser[QueryExpr] =
    selectStmt ^^ (s => s: QueryExpr) | "(" ~> query <~ ")"

  /** Expand the ORDER BY ALL sentinel into ordinals 1..N over the query's
    * projection (left operand for set ops) — ordinals then resolve on
    * every translation path like any user-written `ORDER BY 1, 2`. */
  private def expandOrderAll(q: QueryExpr, ob: Seq[SortKey]): Seq[SortKey] = ob match {
    case Seq(SortKey(Star(None), asc, nf)) =>
      def width(x: QueryExpr): Option[Int] = x match {
        case s: Select if !s.projection.exists(p =>
            p.expr.isInstanceOf[Star] || p.expr.isInstanceOf[StarMod]) =>
          Some(s.projection.length)
        case s: SetOp => width(s.left)
        case w: With  => width(w.body)
        case _        => None
      }
      width(q) match {
        case Some(n) => (1 to n).map(i => SortKey(Lit(i.toLong), asc, nf))
        case None => throw new IllegalArgumentException(
          "ORDER BY ALL requires an explicit projection (not SELECT *)")
      }
    case other => other
  }

  private def attachTail(q: QueryExpr, ob0: Seq[SortKey], lim: Option[Limit]): QueryExpr = {
    val ob = expandOrderAll(q, ob0)
    (q, ob, lim) match {
      case (_, Nil, None)                       => q
      case (s: Select, _, _) if s.orderBy.isEmpty && s.limit.isEmpty =>
        s.copy(orderBy = expandNamedWindowsInSort(s, ob), limit = lim)
      case (s: SetOp, _, _) if s.orderBy.isEmpty && s.limit.isEmpty =>
        s.copy(orderBy = ob, limit = lim)
      case _ =>
        // `(select … order by … limit …) order by …` — wrap via a pass-through
        // set op is not available; reject clearly instead of mis-binding.
        throw new IllegalArgumentException(
          "ORDER BY/LIMIT applied to a subquery that already has them")
    }
  }

  /** A single SELECT without trailing ORDER BY/LIMIT (owned by `query`).
    * `DISTINCT ON (k, …)` (Postgres/DuckDB) keeps the first row per key
    * tuple in ORDER BY order. A trailing `WINDOW w AS (…), …` clause
    * names window specs; `OVER w` references expand here at parse time. */
  lazy val selectStmt: PackratParser[Select] =
    kw("select") ~> opt(kw("distinct") ~> opt(kw("on") ~> "(" ~> rep1sep(expr, ",") <~ ")")) ~
      rep1sep(projection, ",") ~
      opt(kw("from") ~> fromRelations) ~
      opt(kw("where") ~> predicate) ~
      opt(groupByClause) ~
      opt(kw("qualify") ~> predicate) ~
      opt(kw("window") ~> rep1sep(
        ident ~ (kw("as") ~> "(" ~> overBody <~ ")") ^^ { case n ~ w => (n, w) }, ",")) ^^ {
        case d ~ proj ~ from ~ where ~ gb ~ qual ~ wins =>
          val s = Select(d.isDefined, proj, from, where, gb, Nil, None, qual,
            distinctOn = d.flatten.getOrElse(Nil))
          expandNamedWindows(s, wins.getOrElse(Nil))
      }

  /** Expand `OVER w` references against the WINDOW clause. Unresolved
    * refs are left in place — NOT an error here: semantic actions run on
    * parse paths that later backtrack (e.g. `window` briefly mis-parsed
    * as a table alias), so throwing would abort a parse that the correct
    * path completes. The translator reports leftover refs clearly. */
  private def expandNamedWindows(
      s: Select, wins: Seq[(String, (Seq[Expr], Seq[SortKey], Option[WindowFrame]))]): Select = {
    val byName = wins.map { case (n, w) => n.toLowerCase(java.util.Locale.ROOT) -> w }.toMap
    if (wins.size != byName.size)
      throw new IllegalArgumentException("WINDOW clause: duplicate window name")
    def fix(e: Expr): Expr = Expr.transform(e) {
      case w @ WindowFn(_, _, _, _, _, Some(name))
          if byName.contains(name.toLowerCase(java.util.Locale.ROOT)) =>
        val (pb, ob, fr) = byName(name.toLowerCase(java.util.Locale.ROOT))
        w.copy(partitionBy = pb, orderBy = ob, frame = fr, ref = None)
    }
    s.copy(projection = s.projection.map(p => p.copy(expr = fix(p.expr))),
      qualify = s.qualify.map(fix),
      distinctOn = s.distinctOn.map(fix),
      groupBy = s.groupBy.map(g => g.copy(having = g.having.map(fix))),
      // the trailing ORDER BY is attached by the enclosing query parser
      // (attachTail) — keep the specs on the node so it can expand too
      namedWindows = wins)
  }

  /** Expand `OVER w` refs in sort keys attached after the SELECT parsed. */
  private def expandNamedWindowsInSort(s: Select, ob: Seq[SortKey]): Seq[SortKey] =
    if (s.namedWindows.isEmpty) ob
    else {
      val byName = s.namedWindows.map { case (n, w) =>
        n.toLowerCase(java.util.Locale.ROOT) -> w
      }.toMap
      ob.map(k => k.copy(expr = Expr.transform(k.expr) {
        case w @ WindowFn(_, _, _, _, _, Some(name))
            if byName.contains(name.toLowerCase(java.util.Locale.ROOT)) =>
          val (pb, o, fr) = byName(name.toLowerCase(java.util.Locale.ROOT))
          w.copy(partitionBy = pb, orderBy = o, frame = fr, ref = None)
      }))
    }

  /** DuckDB star modifiers: `* EXCLUDE (a, b) REPLACE (e AS c, …)` —
    * contextual keywords (EXCLUDE/REPLACE stay usable as identifiers). */
  private lazy val starMods: PackratParser[(Seq[String], Seq[(Expr, String)])] = {
    val exclude: Parser[Seq[String]] =
      kw("exclude") ~> ("(" ~> rep1sep(ident, ",") <~ ")" | ident ^^ (Seq(_)))
    val replace: Parser[Seq[(Expr, String)]] =
      kw("replace") ~> "(" ~> rep1sep(expr ~ (kw("as") ~> ident) ^^ {
        case e ~ n => (e, n)
      }, ",") <~ ")"
    opt(exclude) ~ opt(replace) ^^ { case ex ~ re => (ex.getOrElse(Nil), re.getOrElse(Nil)) }
  }

  private def starExpr(q: Option[String], mods: (Seq[String], Seq[(Expr, String)])): Expr =
    if (mods._1.isEmpty && mods._2.isEmpty) Star(q) else StarMod(q, mods._1, mods._2)

  lazy val projection: PackratParser[Projection] =
    (ident <~ "." <~ "*") ~ starMods ^^ { case q ~ m => Projection(starExpr(Some(q), m), None) } |
    "*" ~> starMods ^^ (m => Projection(starExpr(None, m), None)) |
    // full predicate grammar: boolean projections (`a > 2 AS flag`,
    // `EXISTS (…) AS has_match`) are ordinary columns
    predicate ~ opt(opt(kw("as")) ~> ident) ^^ { case e ~ a => Projection(e, a) }

  // ----- FROM / joins ------------------------------------------------------

  /** Comma-separated list folds to cross joins (flinkdsl/parser.scala:31). */
  lazy val fromRelations: PackratParser[Relation] =
    rep1sep(relation, ",") ^^ (_.reduceLeft((l, r) => JoinRel(l, r, CrossJoin, None)))

  lazy val relation: PackratParser[Relation] =
    primaryRelation ~ rep(joinPart) ^^ {
      case base ~ joins => joins.foldLeft(base) { case (l, f) => f(l) }
    }

  private type JoinPart = Relation => Relation

  lazy val joinPart: PackratParser[JoinPart] = {
    val kind: Parser[JoinKind] =
      kw("asof") ~> opt(kw("left")) <~ kw("join") ^^ (l => AsofJoin(l.isDefined)) |
      kw("cross") ~ kw("join") ^^^ CrossJoin |
      kw("inner") ~ kw("join") ^^^ InnerJoin |
      // `[LEFT] SEMI/ANTI JOIN` (DuckDB + Spark SQL spellings)
      opt(kw("left")) ~ kw("semi") ~ kw("join") ^^^ SemiJoin |
      opt(kw("left")) ~ kw("anti") ~ kw("join") ^^^ AntiJoin |
      kw("left") ~ opt(kw("outer")) ~ kw("join") ^^^ LeftJoin |
      kw("right") ~ opt(kw("outer")) ~ kw("join") ^^^ RightJoin |
      kw("full") ~ opt(kw("outer")) ~ kw("join") ^^^ FullJoin |
      kw("join") ^^^ InnerJoin
    val cond: Parser[JoinCondition] =
      kw("on") ~> predicate ^^ On.apply |
      kw("using") ~> ("(" ~> rep1sep(ident, ",") <~ ")") ^^ Using.apply |
      kw("using") ~> ident ^^ (c => Using(Seq(c)))
    // NATURAL [INNER|LEFT [OUTER]] JOIN — condition is implied (all
    // same-named columns); an explicit ON/USING is a contradiction
    kw("natural") ~> (kw("inner") ~ kw("join") ^^^ InnerJoin |
                      kw("left") ~ opt(kw("outer")) ~ kw("join") ^^^ LeftJoin |
                      kw("join") ^^^ InnerJoin) ~ primaryRelation ^^ {
      case k ~ r => (l: Relation) => JoinRel(l, r, k, Some(Natural))
    } |
    kind ~ primaryRelation ~ opt(cond) ^^ {
      case k ~ r ~ c => (l: Relation) => JoinRel(l, r, k, c)
    }
  }

  lazy val primaryRelation: PackratParser[Relation] = {
    val base: PackratParser[Relation] =
      kw("lateral") ~> ("(" ~> query <~ ")") ~ (opt(kw("as")) ~> ident) ^^ {
        case q ~ a => LateralRel(q, a)
      } |
      // table functions in FROM: built-in series sources (range /
      // generate_series) plus any session-registered relation-valued
      // function (`fn(rel [, lit…])` — resolution in the translator)
      ident ~ ("(" ~> rep1sep(expr, ",") <~ ")") ~ opt(opt(kw("as")) ~> ident) ^^ {
          case n ~ as ~ a => TableFnRel(n.toLowerCase(java.util.Locale.ROOT), as, a)
        } |
      ("(" ~> kw("values") ~> rep1sep("(" ~> rep1sep(expr, ",") <~ ")", ",") <~ ")") ~
        (opt(kw("as")) ~> ident) ~ opt("(" ~> rep1sep(ident, ",") <~ ")") ^^ {
          case rows ~ a ~ cs => ValuesRel(rows, a, cs)
        } |
      ("(" ~> query <~ ")") ~ opt(kw("as")) ~ ident ~ opt(windowSpec) ^^ {
        case q ~ _ ~ a ~ w => DerivedRel(q, a, w)
      } |
      ident ~ opt(windowSpec) ~ opt(opt(kw("as")) ~> ident) ^^ {
        case n ~ w ~ a => TableRef(n, a, w)
      }
    val sample: PackratParser[(Double, Option[Long])] =
      kw("sample") ~> "(" ~> numericLit ~ (kw("percent") <~ ")") ~
        opt(kw("seed") ~> """\d+""".r) ^^ {
          case Lit(v) ~ _ ~ s =>
            val pct = v match { case l: Long => l.toDouble; case d: Double => d }
            (pct, s.map(_.toLong))
        }
    // `PIVOT (agg FOR col IN (v [as name], …))` — explicit literal values
    val pivotVal: Parser[(Expr, Option[String])] =
      expr ~ opt(opt(kw("as")) ~> ident) ^^ { case v ~ a => (v, a) }
    val pivot: PackratParser[Relation => Relation] =
      kw("pivot") ~> "(" ~> funcCall ~ (kw("for") ~> colRef) ~
        (kw("in") ~> "(" ~> rep1sep(pivotVal, ",") <~ ")") <~ ")" ^^ {
          case (f: FuncCall) ~ c ~ vs => (r: Relation) => PivotRel(r, f, c, vs)
          case other ~ _ ~ _ => throw new IllegalArgumentException(
            s"PIVOT requires an aggregate call, got $other")
        }
    // `UNPIVOT (valCol FOR nameCol IN (c1, c2, …))` — wide → long
    val unpivot: PackratParser[Relation => Relation] =
      kw("unpivot") ~> "(" ~> ident ~ (kw("for") ~> ident) ~
        (kw("in") ~> "(" ~> rep1sep(ident, ",") <~ ")") <~ ")" ^^ {
          case v ~ n ~ cs => (r: Relation) => UnpivotRel(r, v, n, cs)
        }
    base ~ opt(sample) ~ opt(pivot | unpivot) ^^ {
      case r ~ s ~ p =>
        val sampled = s.fold(r) { case (pct, sd) => SampleRel(r, pct, sd) }
        p.fold(sampled)(f => f(sampled))
    }
  }

  // ----- streaming window spec (fsql/parser.scala:163-176) -----------------

  lazy val timeUnit: Parser[String] =
    kws("microsec", "milisec", "millisec", "sec", "min", "h", "d")

  /** `N [unit] [on col]` — PolicyBased(value, timeUnit, onField). */
  lazy val policy: PackratParser[Policy] =
    """\d+""".r ~ opt(timeUnit) ~ opt(kw("on") ~> colRef) ^^ {
      case v ~ u ~ f => Policy(v.toLong, u, f)
    }

  lazy val windowSpec: PackratParser[WindowSpec] =
    "[" ~> ((kw("size") ^^^ false) | (kw("session") ^^^ true)) ~ policy ~
      opt(kw("every") ~> policy) ~
      opt(kw("watermark") ~> policy) ~
      opt(kw("partitioned") ~> kw("on") ~> colRef) <~ "]" ^^ {
        case sess ~ s ~ e ~ wm ~ p => WindowSpec(s, e, p, session = sess, watermark = wm)
      }

  // ----- clauses -----------------------------------------------------------

  lazy val groupByClause: PackratParser[GroupBy] = {
    // one grouping set: `(a, b)`, `(a)` or `()` (the grand total)
    val gset: Parser[Seq[Expr]] = "(" ~> repsep(expr, ",") <~ ")"
    kw("group") ~> kw("by") ~> kw("all") ~> opt(kw("having") ~> predicate) ^^ (h =>
      GroupBy(Nil, rollup = false, h, all = true)) |
    kw("group") ~> kw("by") ~> kw("grouping") ~> kw("sets") ~>
      ("(" ~> rep1sep(gset, ",") <~ ")") ~ opt(kw("having") ~> predicate) ^^ {
        case ss ~ h =>
          GroupBy(ss.flatten.distinct, rollup = false, h, sets = Some(ss))
      } |
    // ANSI function-style ROLLUP(a, b) / CUBE(a, b) — same semantics as
    // the MySQL-style `a, b WITH ROLLUP/CUBE` trailer below
    kw("group") ~> kw("by") ~> kw("rollup") ~> ("(" ~> rep1sep(expr, ",") <~ ")") ~
      opt(kw("having") ~> predicate) ^^ {
        case es ~ h => GroupBy(es, rollup = true, h)
      } |
    kw("group") ~> kw("by") ~> kw("cube") ~> ("(" ~> rep1sep(expr, ",") <~ ")") ~
      opt(kw("having") ~> predicate) ^^ {
        case es ~ h => GroupBy(es, rollup = false, h, cube = true)
      } |
    kw("group") ~> kw("by") ~> rep1sep(expr, ",") ~
      opt(kw("with") ~> (kw("rollup") | kw("cube"))) ~ opt(kw("having") ~> predicate) ^^ {
        case es ~ r ~ h =>
          GroupBy(es, r.contains("rollup"), h, cube = r.contains("cube"))
      } |
    // ANSI: HAVING without GROUP BY filters the implicit global aggregate
    kw("having") ~> predicate ^^ (h => GroupBy(Nil, rollup = false, Some(h)))
  }

  /** `ORDER BY ALL [ASC|DESC]` (DuckDB ergonomics) parses to a Star
    * sentinel; [[attachTail]] expands it to ordinals over the projection. */
  lazy val orderByClause: PackratParser[Seq[SortKey]] =
    kw("order") ~> kw("by") ~> kw("all") ~> opt(kws("asc", "desc")) ~
      opt(kw("nulls") ~> kws("first", "last")) ^^ {
        case d ~ nf => Seq(SortKey(Star(None), !d.contains("desc"), nf.map(_ == "first")))
      } |
    kw("order") ~> kw("by") ~> rep1sep(sortKey, ",")

  lazy val sortKey: PackratParser[SortKey] =
    expr ~ opt(kw("collate") ~> ident) ~ opt(kws("asc", "desc")) ~
      opt(kw("nulls") ~> kws("first", "last")) ^^ {
        case e ~ _ ~ d ~ nf =>
          SortKey(e, !d.contains("desc"), nf.map(_ == "first"))
      }

  /** `LIMIT n [OFFSET o]` plus the ANSI spelling `OFFSET n ROW[S]
    * [FETCH {FIRST|NEXT} m ROW[S] ONLY]` (either part standalone). */
  lazy val limitClause: PackratParser[Limit] = {
    val num: Parser[Expr] = numericLit ^^ (l => l: Expr) | "?" ^^^ Input()
    val rows = kws("row", "rows")
    // (count, withTies): ONLY closes the fetch; WITH TIES keeps peers of
    // the boundary row (translated to a rank filter over the ORDER BY)
    val fetch: Parser[(Expr, Boolean)] =
      kw("fetch") ~> kws("first", "next") ~> num ~
        (opt(rows) ~> (kw("only") ^^^ false | kw("with") ~ kw("ties") ^^^ true)) ^^ {
        case n ~ t => (n, t)
      }
    kw("limit") ~> num ~ opt(kw("offset") ~> num) ^^ {
      case n ~ o => Limit(Some(n), o)
    } |
    (kw("offset") ~> num <~ opt(rows)) ~ opt(fetch) ^^ {
      case o ~ f => Limit(f.map(_._1), Some(o), f.exists(_._2))
    } |
    fetch ^^ { case (n, t) => Limit(Some(n), None, t) }
  }

  // ----- predicates --------------------------------------------------------

  lazy val predicate: PackratParser[Expr] = orExpr

  lazy val orExpr: PackratParser[Expr] =
    andExpr ~ rep(kw("or") ~> andExpr) ^^ { case h ~ t => t.foldLeft(h)(Or.apply) }

  lazy val andExpr: PackratParser[Expr] =
    notExpr ~ rep(kw("and") ~> notExpr) ^^ { case h ~ t => t.foldLeft(h)(And.apply) }

  lazy val notExpr: PackratParser[Expr] =
    kw("not") ~> notExpr ^^ Not.apply | comparison

  lazy val comparison: PackratParser[Expr] = {
    val cmpOp: Parser[String] = "<>" ^^^ "!=" | "!=" | "<=" | ">=" | "=" | "<" | ">"
    val suffix: PackratParser[Expr => Expr] =
      // quantified comparison must try before the plain one: `> all (…)`
      // would otherwise parse `(…)` as a scalar subquery term
      cmpOp ~ kws("all", "any", "some") ~ ("(" ~> query <~ ")") ^^ {
        case op ~ quant ~ q => (l: Expr) => QuantifiedCmp(op, l, q, quant == "all")
      } |
      cmpOp ~ expr ^^ { case op ~ r => (l: Expr) => Cmp(op, l, r) } |
      kw("is") ~> opt(kw("not")) ~ (kw("distinct") ~> kw("from") ~> expr) ^^ {
        case n ~ r => (l: Expr) => DistinctFrom(l, r, n.isDefined)
      } |
      kw("is") ~> opt(kw("not")) <~ kw("null") ^^ (n => (l: Expr) => IsNull(l, n.isDefined)) |
      opt(kw("not")) ~ (kw("between") ~> expr) ~ (kw("and") ~> expr) ^^ {
        case n ~ lo ~ hi => (l: Expr) => Between(l, lo, hi, n.isDefined)
      } |
      opt(kw("not")) ~ (kw("like") ~> expr) ~ opt(kw("escape") ~> expr) ^^ {
        case n ~ p ~ esc => (l: Expr) => Like(l, p, n.isDefined, escape = esc)
      } |
      // ILIKE: case-insensitive LIKE (Postgres/DuckDB)
      opt(kw("not")) ~ (kw("ilike") ~> expr) ~ opt(kw("escape") ~> expr) ^^ {
        case n ~ p ~ esc =>
          (l: Expr) => Like(l, p, n.isDefined, ci = true, escape = esc)
      } |
      // `e SIMILAR TO regex` — ANSI whole-string regex match; desugars to
      // rlike with the pattern anchored (`^(?:pat)$`), since rlike is a
      // partial match. Works for dynamic patterns via string concat.
      opt(kw("not")) ~ (kw("similar") ~> kw("to") ~> expr) ^^ {
        case n ~ p => (l: Expr) =>
          val anchored = Arith("||", Arith("||", Lit("^(?:"), p), Lit(")$"))
          val m = FuncCall("rlike", Seq(l, anchored))
          if (n.isDefined) Not(m) else m
      } |
      opt(kw("not")) ~ (kw("in") ~> "(" ~> query <~ ")") ^^ {
        case n ~ q => (l: Expr) => InSubquery(l, q, n.isDefined)
      } |
      opt(kw("not")) ~ (kw("in") ~> "(" ~> rep1sep(expr, ",") <~ ")") ^^ {
        case n ~ es => (l: Expr) => InList(l, es, n.isDefined)
      }
    opt(kw("not")) ~ (kw("exists") ~> "(" ~> query <~ ")") ^^ {
      case n ~ q => Exists(q, n.isDefined)
    } |
    expr ~ opt(suffix) ^^ { case e ~ s => s.fold(e)(f => f(e)) }
  }

  // ----- scalar expressions ------------------------------------------------

  /** `||` is string concatenation (ANSI), binding looser than arithmetic
    * and bitwise ops. (A single `|` stays bitwise-or: its rep item only
    * commits when an operand follows, so `a || b` falls through here.) */
  lazy val expr: PackratParser[Expr] =
    bitOrExpr ~ rep("||" ~> bitOrExpr) ^^ {
      case h ~ t => t.foldLeft(h)((l, r) => Arith("||", l, r))
    }

  lazy val bitOrExpr: PackratParser[Expr] =
    bitAndExpr ~ rep(("|" | "^") ~ bitAndExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (l, op ~ r) => Arith(op, l, r) }
    }

  lazy val bitAndExpr: PackratParser[Expr] =
    shiftExpr ~ rep("&" ~> shiftExpr) ^^ {
      case h ~ t => t.foldLeft(h)((l, r) => Arith("&", l, r))
    }

  lazy val shiftExpr: PackratParser[Expr] =
    addExpr ~ rep(("<<" | ">>") ~ addExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (l, op ~ r) => Arith(op, l, r) }
    }

  lazy val addExpr: PackratParser[Expr] =
    mulExpr ~ rep(("+" | "-") ~ mulExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (l, op ~ r) => Arith(op, l, r) }
    }

  lazy val mulExpr: PackratParser[Expr] =
    unaryExpr ~ rep(("*" | "/" | "%") ~ unaryExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (l, op ~ r) => Arith(op, l, r) }
    }

  lazy val unaryExpr: PackratParser[Expr] =
    "-" ~> unaryExpr ^^ Neg.apply |
    "~" ~> unaryExpr ^^ BitNot.apply |
    postfixExpr

  /** Subscript `e[i]` → element_at (1-based, matching DuckDB list indexing;
    * also works for map keys) and `e::type` Postgres/DuckDB cast shorthand.
    * Both bind tighter than unary operators. Integer literal indexes cast
    * to INT — element_at requires it, and our numeric literals parse as
    * Long. */
  lazy val postfixExpr: PackratParser[Expr] = {
    def toIntIdx(e: Expr): Expr = e match {
      case Lit(v: Long) => Cast(Lit(v), "int"); case other => other
    }
    val sub: Parser[Expr => Expr] = "[" ~> expr <~ "]" ^^ { i => (b: Expr) =>
      FuncCall("element_at", Seq(b, toIntIdx(i)))
    }
    // DuckDB-style 1-based END-INCLUSIVE list slicing `e[i:j]` (either
    // bound optional) → Spark slice(e, i, j-i+1); open ends use 1 / the
    // array size (slice truncates an over-long length, like DuckDB)
    val slc: Parser[Expr => Expr] =
      "[" ~> opt(expr) ~ (":" ~> opt(expr)) <~ "]" ^^ { case lo ~ hi => (b: Expr) =>
        val loE = toIntIdx(lo.getOrElse(Lit(1L)))
        val lenE = (lo, hi) match {
          case (_, Some(h)) =>
            Arith("+", Arith("-", toIntIdx(h), loE), Cast(Lit(1L), "int"))
          case (Some(_), None) => FuncCall("size", Seq(b))
          case (None, None)    => FuncCall("size", Seq(b))
        }
        FuncCall("slice", Seq(b, loE, lenE))
      }
    val cast: Parser[Expr => Expr] =
      "::" ~> dataTypeName ^^ { t => (b: Expr) => Cast(b, t) }
    // struct field access on a non-identifier base (function results,
    // subscripts — `named_struct('a', 1).a`, `arr[1].f`); plain `t.c`
    // parses as a qualified ColRef in `atom` before this applies
    val field: Parser[Expr => Expr] =
      "." ~> ident ^^ { f => (b: Expr) => FuncCall("__get_field", Seq(b, Lit(f))) }
    // slc first: `[i]` fails slc at the missing ':' and backtracks to sub
    atom ~ rep(slc | sub | cast | field) ^^ { case a ~ fs => fs.foldLeft(a)((b, f) => f(b)) }
  }

  lazy val atom: PackratParser[Expr] =
    caseExpr |
    castExpr |
    extractExpr |
    ansiFnSyntax |
    funcCall |
    literal |
    // `[e1, e2, …]` — DuckDB-style list literal → array(...)
    "[" ~> repsep(expr, ",") <~ "]" ^^ (es => FuncCall("array", es)) |
    "?" ^^^ Input() |
    colRef |
    "(" ~> query <~ ")" ^^ ScalarSubquery.apply |
    "(" ~> predicate <~ ")"

  /** Interval units accept singular and plural ANSI names. */
  lazy val intervalUnit: Parser[String] =
    kws("seconds", "second", "minutes", "minute", "hours", "hour",
        "days", "day", "months", "month", "years", "year") ^^ (_.stripSuffix("s"))

  lazy val literal: PackratParser[Expr] =
    kw("interval") ~> """\d+""".r ~ intervalUnit ^^ { case n ~ u => IntervalLit(n.toLong, u) } |
    // typed literals desugar to CAST — round-trips via Pretty's cast form
    kw("timestamp") ~> stringLit ^^ (s => Cast(Lit(s), "timestamp")) |
    kw("date") ~> stringLit ^^ (s => Cast(Lit(s), "date")) |
    numericLit |
    stringLit ^^ (s => Lit(s)) |
    kw("true") ^^^ Lit(true) |
    kw("false") ^^^ Lit(false) |
    kw("null") ^^^ Lit(null)

  /** `fn(args) [FILTER (WHERE p)] [OVER (…)]`. FILTER desugars at parse
    * time to the ANSI-equivalent conditional argument — `count(*) FILTER
    * (WHERE p)` → `count(case when p then 1 end)`, `agg(x) FILTER (WHERE
    * p)` → `agg(case when p then x end)` — exact semantics because
    * aggregates skip NULLs. */
  lazy val funcCall: PackratParser[Expr] =
    // `left`/`right` are reserved (join types) but are also ANSI string
    // functions; a following "(" disambiguates — joins never parse here
    ((ident | kw("left") | kw("right")) <~ "(") ~
      (opt(kw("distinct")) ~ repsep(funcArg, ",") ~
        opt(kw("order") ~> kw("by") ~> sortKey) <~ ")") ~
      opt(kws("ignore", "respect") <~ kw("nulls")) ~
      opt(kw("within") ~> kw("group") ~> "(" ~> kw("order") ~> kw("by") ~> sortKey <~ ")") ~
      opt(kw("filter") ~> "(" ~> kw("where") ~> predicate <~ ")") ~ opt(overClause) ^^ {
      case n ~ (d ~ as0 ~ aggOrd) ~ nulls ~ within ~ flt ~ over =>
        val lower00 = n.toLowerCase(java.util.Locale.ROOT)
        // `agg(x ORDER BY k)` — DuckDB-style inline ordered aggregate
        // (same desugar targets as WITHIN GROUP)
        val (lower0, as) = aggOrd match {
          case None => (lower00, as0)
          case Some(k) =>
            if (within.isDefined)
              throw new IllegalArgumentException(
                "use either agg(... ORDER BY ...) or WITHIN GROUP, not both")
            if (k.nullsFirst.isDefined)
              throw new IllegalArgumentException(
                "ordered aggregates do not support NULLS FIRST/LAST")
            if (as0.isEmpty)
              throw new IllegalArgumentException(s"$lower00 expects a value argument")
            if (d.isDefined)
              throw new IllegalArgumentException(
                s"$lower00(DISTINCT ... ORDER BY ...) is not supported — " +
                  "deduplicate in a subquery first")
            lower00 match {
              case "string_agg" | "listagg" | "group_concat" =>
                val sep = as0.lift(1).getOrElse(Lit(","))
                ("__string_agg_ord", Seq(as0.head, sep, k.expr, Lit(k.ascending)))
              case "array_agg" | "collect_list" =>
                ("__array_agg_ord", Seq(as0.head, k.expr, Lit(k.ascending)))
              case other => throw new IllegalArgumentException(
                s"agg(... ORDER BY ...) is supported for array_agg/collect_list/" +
                  s"string_agg/listagg, not $other")
            }
        }
        // WITHIN GROUP (ORDER BY k) — ordered-set aggregates, desugared at
        // parse time (ANSI surface; DuckDB-compatible):
        //   percentile_cont(p) within group (order by k)      → percentile(k, p)
        //   percentile_cont(p) within group (order by k desc) → percentile(k, 1-p)
        //   string_agg/listagg(x[, sep]) within group (order by k [desc])
        //     → internal order-aware aggregate (deterministic concat)
        val (lower, as2) = within match {
          case None => (lower0, as)
          case Some(k) =>
            if (k.nullsFirst.isDefined)
              throw new IllegalArgumentException(
                "WITHIN GROUP (ORDER BY … NULLS FIRST/LAST) is not supported")
            lower0 match {
              case "percentile_cont" => as match {
                case Seq(Lit(p)) =>
                  val pd = p match {
                    case d: Double => d
                    case l: Long   => l.toDouble
                    case _ => throw new IllegalArgumentException(
                      "percentile_cont expects a numeric literal fraction")
                  }
                  ("percentile", Seq(k.expr, Lit(if (k.ascending) pd else 1.0 - pd)))
                case _ => throw new IllegalArgumentException(
                  "percentile_cont expects one literal fraction argument")
              }
              case "string_agg" | "listagg" =>
                val sep = as.lift(1).getOrElse(Lit(","))
                as.headOption match {
                  case Some(v) =>
                    ("__string_agg_ord", Seq(v, sep, k.expr, Lit(k.ascending)))
                  case None => throw new IllegalArgumentException(
                    s"$lower0 expects a value argument")
                }
              case other => throw new IllegalArgumentException(
                s"WITHIN GROUP is supported for percentile_cont/string_agg/listagg, not $other")
            }
        }
        val args = flt match {
          case None => as2
          case Some(p) =>
            // the CASE desugar is only exact for NULL-skipping aggregates;
            // first/last/any_value keep NULLs and would silently mis-answer
            if (Set("first", "last", "first_value", "last_value", "any_value")(lower))
              throw new IllegalArgumentException(
                s"FILTER (WHERE …) is not supported for $lower (not NULL-skipping)")
            as2 match {
              case Seq() | Seq(Star(None)) => Seq(CaseWhen(Seq((p, Lit(1L))), None, None))
              case Seq(one)                => Seq(CaseWhen(Seq((p, one)), None, None))
              case _ => throw new IllegalArgumentException(
                "FILTER (WHERE …) is supported for zero- and one-argument aggregates")
            }
        }
        val ignoreN = nulls.contains("ignore")
        val f = FuncCall(lower, args, d.isDefined)
        over match {
          case Some(Left((pb, ob, fr))) => WindowFn(f, pb, ob, fr, ignoreNulls = ignoreN)
          case Some(Right(name)) =>
            WindowFn(f, Nil, Nil, None, ignoreNulls = ignoreN, ref = Some(name))
          case None =>
            if (ignoreN) throw new IllegalArgumentException(
              "IGNORE NULLS requires an OVER clause (window functions only)")
            f
        }
    }

  /** `EXTRACT(field FROM e)` — desugars to the named field function
    * (year/month/day/hour/minute/second …), resolved via the Registry. */
  lazy val extractExpr: PackratParser[Expr] =
    (("(?i)\\Qextract\\E\\b".r ~ "(") ~> ident) ~ (kw("from") ~> predicate) <~ ")" ^^ {
      case field ~ e => FuncCall(field.toLowerCase(java.util.Locale.ROOT), Seq(e))
    }

  /** `ROWS|RANGE BETWEEN bound AND bound` — explicit window frame; bounds
    * encode as Spark offsets (MinValue/MaxValue = unbounded, 0 = current). */
  lazy val frameSpec: PackratParser[WindowFrame] = {
    // (offset, cameFromInterval): interval bounds are fixed-width day-time
    // units converted to epoch µs (months/years are variable-width and
    // rejected up front — no silent 30-day approximations)
    val usPerUnit = Map(
      "second" -> 1000000L, "minute" -> 60000000L,
      "hour" -> 3600000000L, "day" -> 86400000000L)
    val bound: Parser[(Long, Boolean)] =
      kw("unbounded") ~> (kw("preceding") ^^^ ((Long.MinValue, false)) |
                          kw("following") ^^^ ((Long.MaxValue, false))) |
      kw("current") ~> kw("row") ^^^ ((0L, false)) |
      kw("interval") ~> """\d+""".r ~ intervalUnit ~
        (kw("preceding") ^^^ -1L | kw("following") ^^^ 1L) ^^ {
        case n ~ u ~ sign =>
          val us = usPerUnit.getOrElse(u, throw new IllegalArgumentException(
            s"RANGE INTERVAL frame: unit $u is variable-width; use second/minute/hour/day"))
          (n.toLong * us * sign, true)
      } |
      """\d+""".r ~ (kw("preceding") ^^^ -1L | kw("following") ^^^ 1L) ^^ {
        case n ~ sign => (n.toLong * sign, false)
      }
    ((kw("rows") ^^^ true) | (kw("range") ^^^ false)) ~
      (kw("between") ~> bound) ~ (kw("and") ~> bound) ^^ {
        case r ~ ((lo, loI)) ~ ((hi, hiI)) =>
          if ((loI || hiI) && r)
            throw new IllegalArgumentException(
              "INTERVAL frame bounds require RANGE, not ROWS")
          WindowFrame(r, lo, hi, intervalUs = loI || hiI)
      }
  }

  /** The body of a window specification: `PARTITION BY e, … ORDER BY k, …
    * [frame]` (shared by OVER (…) and the named WINDOW clause). */
  lazy val overBody: PackratParser[(Seq[Expr], Seq[SortKey], Option[WindowFrame])] =
    opt(kw("partition") ~> kw("by") ~> rep1sep(expr, ",")) ~
      // plain sort keys only: ORDER BY ALL is a projection-ordinal
      // shorthand; inside a window spec there is no projection to expand
      // against, so the sentinel must not flow through here
      opt(kw("order") ~> kw("by") ~> rep1sep(sortKey, ",")) ~
      opt(frameSpec) ^^ {
        case pb ~ ob ~ fr => (pb.getOrElse(Nil), ob.getOrElse(Nil), fr)
      }

  /** `OVER (…)` inline spec, or `OVER w` naming a WINDOW-clause entry
    * (Right = the name, expanded by [[expandNamedWindows]]). */
  lazy val overClause: PackratParser[Either[(Seq[Expr], Seq[SortKey], Option[WindowFrame]), String]] =
    kw("over") ~> ("(" ~> overBody <~ ")") ^^ (Left(_)) |
    kw("over") ~> ident ^^ (Right(_))

  /** `x -> body` / `(x, y) -> body` — lambda arguments to higher-order
    * array functions. Tried before `predicate`, which would otherwise
    * consume the parameter name and stop at `->`. */
  lazy val lambdaArg: PackratParser[Expr] =
    ("(" ~> rep1sep(ident, ",") <~ ")" | ident ^^ (Seq(_))) ~ ("->" ~> predicate) ^^ {
      case ps ~ b => Lambda(ps, b)
    }

  lazy val funcArg: PackratParser[Expr] =
    "*" ^^^ Star(None) | lambdaArg | predicate

  /** CAST / TRY_CAST (e AS type) — type vocabulary shared with DDL field
    * definitions; TRY_CAST yields NULL on invalid input instead of erroring. */
  lazy val castExpr: PackratParser[Expr] =
    (("(?i)\\Qtry_cast\\E\\b".r ~ "(") ~> predicate) ~ (kw("as") ~> dataTypeName) <~ ")" ^^ {
      case e ~ t => Cast(e, t, safe = true)
    } |
    (("(?i)\\Qcast\\E\\b".r ~ "(") ~> predicate) ~ (kw("as") ~> dataTypeName) <~ ")" ^^ {
      case e ~ t => Cast(e, t)
    }

  /** ANSI keyword-argument function spellings, desugared at parse time:
    * `TRIM([BOTH|LEADING|TRAILING] [chars] FROM s)`, `POSITION(sub IN s)`,
    * `SUBSTRING(s FROM i [FOR n])`. The plain call forms (`trim(s)`,
    * `substring(s, i, n)`) still parse through [[funcCall]]. */
  lazy val ansiFnSyntax: PackratParser[Expr] = {
    val trimKw = "(?i)\\Qtrim\\E\\b".r ~ "("
    (trimKw ~> opt(kws("both", "leading", "trailing")) ~ opt(expr) ~
      (kw("from") ~> expr) <~ ")") ^^ { case mode ~ chars ~ src =>
        val fn = mode.getOrElse("both") match {
          case "leading"  => "ltrim"
          case "trailing" => "rtrim"
          case _          => "trim"
        }
        chars match {
          case Some(c) => FuncCall(s"__${fn}_chars", Seq(src, c))
          case None    => FuncCall(fn, Seq(src))
        }
      } |
    ("(?i)\\Qposition\\E\\b".r ~ "(") ~> expr ~ (kw("in") ~> expr) <~ ")" ^^ {
      case sub ~ str => FuncCall("instr", Seq(str, sub))
    } |
    ("(?i)\\Qsubstring\\E\\b".r ~ "(") ~> expr ~ (kw("from") ~> expr) ~
      opt(kw("for") ~> expr) <~ ")" ^^ { case s ~ i ~ n =>
        FuncCall("substring",
          Seq(s, i, n.getOrElse(Cast(Lit(2147483647L), "int"))))
      }
  }

  /** Searched (`case when p then v`) or simple (`case x when v then r`)
    * CASE — `when` is reserved, so the subject parse cannot swallow it. */
  lazy val caseExpr: PackratParser[Expr] =
    kw("case") ~> opt(expr) ~ rep1(whenBranch) ~ opt(kw("else") ~> expr) <~ kw("end") ^^ {
      case subj ~ bs ~ e => CaseWhen(bs, e, subj)
    }

  lazy val whenBranch: PackratParser[(Expr, Expr)] =
    (kw("when") ~> predicate) ~ (kw("then") ~> expr) ^^ { case c ~ v => (c, v) }

  // ----- DDL ---------------------------------------------------------------

  lazy val dataTypeName: Parser[String] =
    """(?i)array\s*<\s*[a-zA-Z]+\s*>""".r ^^ (_.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s", "")) |
    """[a-zA-Z]+""".r ^^ (_.toLowerCase(java.util.Locale.ROOT))

  lazy val fieldDef: PackratParser[FieldDef] =
    ident ~ dataTypeName ~ opt(kw("not") ~ kw("null")) ^^ {
      case n ~ t ~ nn => FieldDef(n, t, nullable = nn.isEmpty)
    }

  lazy val createSchemaStmt: PackratParser[Statement] =
    kw("create") ~> kw("schema") ~> ident ~
      ("(" ~> rep1sep(fieldDef, ",") <~ ")") ~ opt(kw("extends") ~> ident) ^^ {
        case n ~ fs ~ p => CreateSchema(n, fs, p)
      }

  lazy val createStreamStmt: PackratParser[Statement] =
    kw("create") ~> kw("stream") ~> ident ~ schemaRef ~ opt(streamSource) ^^ {
      case n ~ s ~ src => CreateStream(n, s, src)
    }

  lazy val createTableStmt: PackratParser[Statement] =
    kw("create") ~> kw("table") ~> ident ~ (kw("as") ~> query) ^^ {
      case n ~ q => CreateTableAs(n, q)
    }

  lazy val createModelStmt: PackratParser[Statement] =
    kw("create") ~> kw("model") ~> ident ~ (kw("kind") ~> stringLit) ~
      (kw("at") ~> stringLit) ^^ {
        case n ~ k ~ p => CreateModel(n, k, p)
      }

  lazy val schemaRef: PackratParser[SchemaRef] =
    "(" ~> rep1sep(fieldDef, ",") <~ ")" ^^ InlineSchema.apply |
    ident ^^ NamedSchema.apply

  lazy val streamSource: PackratParser[StreamSource] =
    kw("source") ~> kw("host") ~> "(" ~> stringLit ~ ("," ~> """\d+""".r) <~ ")" ^^ {
      case h ~ p => HostSource(h, p.toInt)
    } |
    kw("source") ~> kw("file") ~> "(" ~> stringLit <~ ")" ^^ FileSource.apply |
    kw("as") ~> "(" ~> query <~ ")" ^^ DerivedSource.apply

  // ----- DML ---------------------------------------------------------------

  lazy val insertStmt: PackratParser[Statement] =
    kw("insert") ~> kw("into") ~> ident ~ opt(windowSpec) ~
      opt("(" ~> rep1sep(ident, ",") <~ ")") ~ insertInput ^^ {
        case t ~ w ~ cs ~ in => Insert(t, w, cs, in)
      }

  lazy val insertInput: PackratParser[InsertInput] =
    kw("values") ~> rep1sep("(" ~> rep1sep(expr, ",") <~ ")", ",") ^^ InsertValues.apply |
    query ^^ InsertSelect.apply

  lazy val updateStmt: PackratParser[Statement] =
    kw("update") ~> rep1sep(tableOnlyRef, ",") ~
      (kw("set") ~> rep1sep((colRef <~ "=") ~ expr ^^ { case c ~ e => (c, e) }, ",")) ~
      opt(kw("where") ~> predicate) ~ opt(orderByClause) ~ opt(limitClause) ^^ {
        case ts ~ sets ~ w ~ ob ~ lim => Update(ts, sets, w, ob.getOrElse(Nil), lim)
      }

  lazy val deleteStmt: PackratParser[Statement] =
    kw("delete") ~> kw("from") ~> rep1sep(tableOnlyRef, ",") ~
      opt(kw("where") ~> predicate) ^^ { case ts ~ w => Delete(ts, w) }

  lazy val tableOnlyRef: PackratParser[TableRef] =
    ident ~ opt(opt(kw("as")) ~> ident) ^^ { case n ~ a => TableRef(n, a, None) }

  /** MERGE INTO t [AS a] USING src ON pred (WHEN [NOT] MATCHED [AND c] THEN …)+ */
  lazy val mergeStmt: PackratParser[Statement] =
    kw("merge") ~> kw("into") ~> tableOnlyRef ~ (kw("using") ~> primaryRelation) ~
      (kw("on") ~> predicate) ~ rep1(mergeAction) ^^ {
        case t ~ src ~ cond ~ as => Merge(t, src, cond, as)
      }

  lazy val mergeAction: PackratParser[MergeAction] = {
    val setClause = (colRef <~ "=") ~ expr ^^ { case c ~ e => (c, e) }
    val matched =
      (kw("when") ~> kw("matched") ~> opt(kw("and") ~> predicate) <~ kw("then")) ~
        ((kw("update") ~> kw("set") ~> rep1sep(setClause, ",")) ^^ (s =>
          (c: Option[Expr]) => MergeUpdate(c, s)) |
         kw("delete") ^^^ ((c: Option[Expr]) => MergeDelete(c))) ^^ {
          case c ~ f => f(c)
        }
    val notMatched =
      (kw("when") ~> kw("not") ~> kw("matched") ~> opt(kw("and") ~> predicate) <~
        kw("then") <~ kw("insert")) ~
        opt("(" ~> rep1sep(ident, ",") <~ ")") ~
        (kw("values") ~> "(" ~> rep1sep(expr, ",") <~ ")") ^^ {
          case c ~ cols ~ vs => MergeInsert(c, cols, vs)
        }
    matched | notMatched
  }
}
