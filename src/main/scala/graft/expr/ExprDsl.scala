package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.util.parsing.combinator.{PackratParsers, RegexParsers}

/** Fluent column-expression DSL — the second API surface of the reference
  * (`ExpressionParser.scala:30-204`, a copy of Flink's Table API expression
  * parser). Same constructs, but each grammar rule produces a Spark
  * `Column` directly, so `parse("amount.sum as total")` ≡
  * `sum($"amount").as("total")`.
  *
  * Surface (ExpressionParser.scala:74-183): suffixes `.isNull .isNotNull
  * .abs .sum .min .max .count .avg .as(f) .substring(a[,b])`, unary `! - ~`,
  * bitwise `& | ^`, products `* / %`, terms `+ -`, comparisons
  * `=== = !== > >= < <=`, logic `&& ||`, trailing `as` alias, field
  * references, string/numeric/boolean literals.
  */
object ExprDsl extends RegexParsers with PackratParsers {

  def parse(text: String): Column =
    parseAll(phrase(alias), text) match {
      case Success(c, _) => c
      case NoSuccess(msg, next) =>
        throw new IllegalArgumentException(
          s"expression parse error at col ${next.pos.column}: $msg")
      case other => throw new IllegalArgumentException(s"expression parse error: $other")
    }

  def parseList(text: String): Seq[Column] =
    parseAll(phrase(rep1sep(alias, ",")), text) match {
      case Success(cs, _) => cs
      case NoSuccess(msg, next) =>
        throw new IllegalArgumentException(
          s"expression parse error at col ${next.pos.column}: $msg")
      case other => throw new IllegalArgumentException(s"expression parse error: $other")
    }

  private val keywords = Set("as", "true", "false", "null")

  private lazy val ident: Parser[String] =
    """[a-zA-Z_][a-zA-Z0-9_]*""".r.filter(s => !keywords(s.toLowerCase(java.util.Locale.ROOT)))

  private lazy val fieldRef: PackratParser[Column] = ident ^^ (col(_))

  private lazy val literal: PackratParser[Column] =
    """\d+\.\d+""".r ^^ (s => lit(s.toDouble)) |
    """\d+[Ll]?""".r ^^ (s => lit(s.stripSuffix("L").stripSuffix("l").toLong)) |
    """'([^']|'')*'""".r ^^ (s => lit(s.substring(1, s.length - 1).replace("''", "'"))) |
    """"([^"]|"")*"""".r ^^ (s => lit(s.substring(1, s.length - 1).replace("\"\"", "\""))) |
    "(?i)true\\b".r ^^^ lit(true) |
    "(?i)false\\b".r ^^^ lit(false) |
    "(?i)null\\b".r ^^^ lit(null)

  private lazy val atom: PackratParser[Column] =
    literal | fieldRef | "(" ~> alias <~ ")"

  /** Suffix chain: `a.sum`, `name.substring(1, 3)`, `x.abs.isNull`, `a.as(b)`. */
  private lazy val suffixed: PackratParser[Column] = {
    val suffix: PackratParser[Column => Column] =
      "." ~> "(?i)isnull\\b".r ^^^ ((c: Column) => c.isNull) |
      "." ~> "(?i)isnotnull\\b".r ^^^ ((c: Column) => c.isNotNull) |
      "." ~> "(?i)abs\\b".r ^^^ ((c: Column) => abs(c)) |
      "." ~> "(?i)sum\\b".r ^^^ ((c: Column) => sum(c)) |
      "." ~> "(?i)min\\b".r ^^^ ((c: Column) => min(c)) |
      "." ~> "(?i)max\\b".r ^^^ ((c: Column) => max(c)) |
      "." ~> "(?i)count\\b".r ^^^ ((c: Column) => count(c)) |
      "." ~> "(?i)avg\\b".r ^^^ ((c: Column) => avg(c)) |
      "." ~> "(?i)cast\\b".r ~> "(" ~> ident <~ ")" ^^ (t => (c: Column) => c.cast(t)) |
      "." ~> "(?i)substring\\b".r ~> ("(" ~> alias ~ opt("," ~> alias) <~ ")") ^^ {
        // Flink Table API substring(from[, to]) is 1-based from..to inclusive
        case from ~ Some(to) => (c: Column) => c.substr(from, to - from + lit(1))
        case from ~ None     => (c: Column) => c.substr(from, lit(Int.MaxValue))
      } |
      "." ~> "(?i)as\\b".r ~> "(" ~> ident <~ ")" ^^ (n => (c: Column) => c.as(n)) |
      // generic method passthrough: x.f(args) → f(x, args) via Spark registry
      "." ~> ident ~ opt("(" ~> repsep(alias, ",") <~ ")") ^^ {
        case f ~ args => (c: Column) => call_function(f, c +: args.getOrElse(Nil): _*)
      }
    atom ~ rep(suffix) ^^ { case a ~ fs => fs.foldLeft(a)((c, f) => f(c)) }
  }

  private lazy val unary: PackratParser[Column] =
    "!" ~> unary ^^ (c => !c) |
    "-" ~> unary ^^ (c => -c) |
    "~" ~> unary ^^ (c => bitwise_not(c)) |
    suffixed

  private lazy val product: PackratParser[Column] =
    unary ~ rep(("*" | "/" | "%") ~ unary) ^^ { case h ~ t =>
      t.foldLeft(h) {
        case (l, "*" ~ r) => l * r
        case (l, "/" ~ r) => l / r
        case (l, _ ~ r)   => l % r
      }
    }

  private lazy val term: PackratParser[Column] =
    product ~ rep(("+" | "-") ~ product) ^^ { case h ~ t =>
      t.foldLeft(h) {
        case (l, "+" ~ r) => l + r
        case (l, _ ~ r)   => l - r
      }
    }

  private lazy val bitwise: PackratParser[Column] =
    term ~ rep(("&" <~ not("&") | "|" <~ not("|") | "^") ~ term) ^^ { case h ~ t =>
      t.foldLeft(h) {
        case (l, "&" ~ r) => l.bitwiseAND(r)
        case (l, "|" ~ r) => l.bitwiseOR(r)
        case (l, _ ~ r)   => l.bitwiseXOR(r)
      }
    }

  private lazy val comparison: PackratParser[Column] = {
    val op: Parser[String] = "===" | "!==" | "!=" | "<>" | "<=" | ">=" | "=" | "<" | ">"
    bitwise ~ opt(op ~ bitwise) ^^ {
      case l ~ None => l
      case l ~ Some("===" ~ r) => l === r
      case l ~ Some("=" ~ r)   => l === r
      case l ~ Some("!==" ~ r) => l =!= r
      case l ~ Some("!=" ~ r)  => l =!= r
      case l ~ Some("<>" ~ r)  => l =!= r
      case l ~ Some("<=" ~ r)  => l <= r
      case l ~ Some(">=" ~ r)  => l >= r
      case l ~ Some("<" ~ r)   => l < r
      case l ~ Some(_ ~ r)     => l > r
    }
  }

  private lazy val logic: PackratParser[Column] =
    comparison ~ rep(("&&" | "||") ~ comparison) ^^ { case h ~ t =>
      t.foldLeft(h) {
        case (l, "&&" ~ r) => l && r
        case (l, _ ~ r)    => l || r
      }
    }

  /** trailing `expr as name` alias (ExpressionParser.scala:177-183). */
  private lazy val alias: PackratParser[Column] =
    logic ~ opt("(?i)as\\b".r ~> ident) ^^ {
      case c ~ Some(n) => c.as(n)
      case c ~ None    => c
    }
}
