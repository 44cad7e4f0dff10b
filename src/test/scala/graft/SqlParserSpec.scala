package graft

import graft.ast._
import graft.parser.SqlParser
import org.scalatest.funsuite.AnyFunSuite

/** Parser acceptance over the reference's own test corpus (SURVEY §5 —
  * test/parserTest.scala:49-54, fsql/parser.scala:380-431,
  * flinkdsl/parser.scala:324-362), plus our dialect extensions. */
class SqlParserSpec extends AnyFunSuite {

  private def parsed(sql: String): Statement =
    SqlParser.parse(sql).fold(e => fail(s"$sql\n  -> $e"), identity)

  // --- reference corpus, verbatim ---------------------------------------

  test("corpus: windowed select with every/partitioned") {
    val s = parsed("select * from stream [size 3 min on time every 1 partitioned on time]")
    val sel = s.asInstanceOf[Select]
    val t = sel.from.get.asInstanceOf[TableRef]
    assert(t.window.get.size == Policy(3, Some("min"), Some(ColRef(None, "time"))))
    assert(t.window.get.every.contains(Policy(1, None, None)))
    assert(t.window.get.partition.contains(ColRef(None, "time")))
  }

  test("corpus: windowed left join") {
    val s = parsed("select id from stream [size 3] as s1 left join suoi [size 3] as s2 on s1.time=s2.thoigian")
    val sel = s.asInstanceOf[Select]
    val j = sel.from.get.asInstanceOf[JoinRel]
    assert(j.kind == LeftJoin)
    assert(j.left.asInstanceOf[TableRef].window.get.size == Policy(3, None, None))
    assert(j.right.asInstanceOf[TableRef].alias.contains("s2"))
  }

  test("corpus: group by having") {
    val s = parsed("select count(id) as i, 1+3 *2 as NUM from stream group by item having item > 3")
    val sel = s.asInstanceOf[Select]
    assert(sel.projection.map(_.outputName) == Seq("i", "NUM"))
    assert(sel.groupBy.get.having.isDefined)
  }

  test("corpus: where with or/parens") {
    val s = parsed("select id + 3 from stream as s where id = 2 or (speed > 3 and time = 1)")
    assert(s.asInstanceOf[Select].where.exists(_.isInstanceOf[Or]))
  }

  test("corpus: derived table") {
    val s = parsed("select id from (select p.id from oldStream as p) as q")
    assert(s.asInstanceOf[Select].from.get.isInstanceOf[DerivedRel])
  }

  test("corpus: create stream with derived source") {
    val s = parsed("create stream myStream(time long) as (select p.id from oldStream as p)")
    val cs = s.asInstanceOf[CreateStream]
    assert(cs.source.exists(_.isInstanceOf[DerivedSource]))
  }

  test("corpus: create schema extends") {
    val s = parsed("create schema name1 (a boolean) extends parents")
    assert(s == CreateSchema("name1", Seq(FieldDef("a", "boolean")), Some("parents")))
  }

  test("corpus: batch arithmetic + qualified refs") {
    parsed("select (age + p.hight) * 2 from person p where age >3 and hight <1 or weight = 2")
  }

  test("corpus: batch join on") {
    val s = parsed("select p.age, j.type from person p join job j on p.job = j.id")
    assert(s.asInstanceOf[Select].from.get.asInstanceOf[JoinRel].kind == InnerJoin)
  }

  test("corpus: create stream with host source") {
    val s = parsed("create stream s1 (a int, b string) source host('localhost', 9999)")
    assert(s.asInstanceOf[CreateStream].source.contains(HostSource("localhost", 9999)))
  }

  test("corpus: create stream with file source") {
    val s = parsed("create stream s1 personSchema source file('/tmp/x.csv')")
    assert(s.asInstanceOf[CreateStream].source.contains(FileSource("/tmp/x.csv")))
  }

  // --- batch dialect breadth --------------------------------------------

  test("set operations with all/order/limit") {
    val s = parsed("select a from t union all select a from u order by a desc limit 3 offset 1")
    val so = s.asInstanceOf[SetOp]
    assert(so.op == Union && so.all)
    assert(so.orderBy.head.ascending == false)
    assert(so.limit.contains(Limit(Lit(3L), Some(Lit(1L)))))
  }

  test("in/exists/between/like/is null") {
    parsed("select a from t where a in (1, 2, 3) and b not in (select b from u) " +
      "and exists (select 1 from v) and c between 1 and 10 and d like 'x%' and e is not null")
  }

  test("rollup and distinct aggregates") {
    val s = parsed("select a, count(distinct b) from t group by a with rollup")
    assert(s.asInstanceOf[Select].groupBy.get.rollup)
    assert(s.asInstanceOf[Select].projection(1).expr == FuncCall("count", Seq(ColRef(None, "b")), distinct = true))
  }

  test("case when") {
    parsed("select case when a > 1 then 'hi' when a > 0 then 'mid' else 'lo' end as c from t")
  }

  test("? parameters") {
    val s = parsed("select a from t where b = ? limit ?")
    assert(s.asInstanceOf[Select].where.contains(Cmp("=", ColRef(None, "b"), Input())))
  }

  test("insert variants") {
    parsed("insert into t (a, b) values (1, 'x'), (2, 'y')")
    parsed("insert into t select a, b from u where a > 0")
    parsed("insert into s [size 5] select a from u")
  }

  test("update/delete parse") {
    parsed("update t set a = 1, b = b + 1 where c > 0 order by a limit 10")
    parsed("delete from t where a = 1")
  }

  test("all five join kinds + using + comma-from") {
    parsed("select * from a join b using (x, y) left outer join c on b.i = c.i " +
      "right join d on c.j = d.j full outer join e on d.k = e.k cross join f")
    val s = parsed("select * from a, b, c where a.x = b.x")
    assert(s.asInstanceOf[Select].from.get.isInstanceOf[JoinRel])
  }

  test("comments are whitespace") {
    parsed("select a -- trailing\nfrom t /* block\ncomment */ where a > 0")
  }

  test("back-quoted identifiers admit reserved words and odd characters") {
    import graft.ast._
    val r = graft.parser.SqlParser.parse("select `select`, t.`weird col` from `from` as t")
    assert(r.isRight, r)
    val sel = r.toOption.get.asInstanceOf[Select]
    assert(sel.projection.map(_.expr) == Seq(
      ColRef(None, "select"), ColRef(Some("t"), "weird col")))
    assert(sel.from.get.asInstanceOf[TableRef].name == "from")
  }

  // --- fuzz robustness: hostile input never hangs, loops, or NPEs --------

  test("fuzz: mutated and garbage statements fail fast with a parse error") {
    val seeds = Seq(
      "select a, b from t where x = 1 group by a having n > 2 order by b limit 3",
      "select * from s [size 5 min on ts] join r on a = b",
      "with w as (select 1 as x) select x from w union all select 2",
      "insert into t (a, b) values (1, 'x')",
      // round-9 syntax: executed explain + table-fn FROM + session window
      "explain analyze select count(*) as n from t group by k",
      "select source, round(q, 6) as med from grouped_quantiles(documents, 'source', 'n_chars', 0.5) order by source",
      "select w_start, w_end, k from s [session 30 min on ts partitioned on k] group by k")
    val rng = new scala.util.Random(42)
    def mutate(s: String): String = rng.nextInt(6) match {
      case 0 => s.take(rng.nextInt(s.length))                       // truncate
      case 1 => s.updated(rng.nextInt(s.length), "()'\",;[]%".charAt(rng.nextInt(9)))
      case 2 => val i = rng.nextInt(s.length); s.take(i) + s        // duplicate prefix
      case 3 => s.replace(" ", "  ") + "))))"
      case 4 => new String(rng.shuffle(s.toList).toArray)           // scramble
      case 5 => s + " " + s.takeRight(rng.nextInt(s.length))
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    var parsedOk = 0
    for (_ <- 1 to 400; seed <- seeds) {
      val q = mutate(seed)
      // run the parse on another thread so a non-terminating backtrack
      // FAILS the test instead of hanging the suite
      val res = try Await.result(Future(SqlParser.parse(q)), 5.seconds)
      catch { case _: java.util.concurrent.TimeoutException =>
        fail(s"parser took > 5s on: $q") }
      res match {
        case Left(err) => assert(err != null && err.nonEmpty, s"empty error for: $q")
        case Right(_)  => parsedOk += 1 // a mutation may stay valid - fine
      }
    }
    // sanity: the unmutated seeds themselves still parse
    seeds.foreach(s => assert(SqlParser.parse(s).isRight, s))
  }
}
