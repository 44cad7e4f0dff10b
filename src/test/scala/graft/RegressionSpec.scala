package graft

import graft.streaming.CountWindow
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regressions for review findings: each test failed (wrong result or
  * crash) before the corresponding fix. */
class RegressionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private lazy val g = TestSpark.session

  test("avg(distinct) averages the distinct values, not all rows") {
    val got = g.sql("select avg(distinct l_linenumber) as a from lineitem")
      .collect().head.getDouble(0)
    val want = g.catalog.relation("lineitem")
      .select("l_linenumber").distinct()
      .agg(avg("l_linenumber")).collect().head.getDouble(0)
    assert(math.abs(got - want) < 1e-9)
    // and it differs from the non-distinct mean on this data
    val plain = g.sql("select avg(l_linenumber) as a from lineitem")
      .collect().head.getDouble(0)
    assert(math.abs(got - plain) > 1e-9)
  }

  test("set-op round-trip preserves nesting and inner order/limit") {
    val nested = "select n_regionkey as k from nation union (select r_regionkey as k from region except select r_regionkey as k from region where r_regionkey < 2)"
    val withLimit = "(select n_regionkey as k from nation order by k limit 5) union all select r_regionkey as k from region"
    for (sql <- Seq(nested, withLimit)) {
      val ast1 = graft.parser.SqlParser.parse(sql).toOption.get
      val printed = graft.ast.Pretty.print(ast1)
      val ast2 = graft.parser.SqlParser.parse(printed)
        .getOrElse(fail(s"printed form does not parse: $printed"))
      assert(ast2 == ast1, s"round-trip changed AST: $printed")
    }
  }

  test("IN (subquery) works when both sides share the column name") {
    val got = g.sql(
      "select n_regionkey from nation where n_regionkey in (select n_regionkey from nation where n_name like 'NATION_1%')")
    assert(got.count() > 0)
    val neg = g.sql(
      "select count(*) as n from nation where n_regionkey not in (select n_regionkey from nation where n_regionkey < 3)")
    assert(neg.collect().head.getLong(0) ==
      g.catalog.relation("nation").where(col("n_regionkey") >= 3).count())
  }

  test("select * plus computed alias can ORDER BY the alias") {
    val got = g.sql("select *, r_regionkey * 2 as dbl from region order by dbl desc")
    val vals = got.select("dbl").collect().map(_.getLong(0)).toSeq
    assert(vals == vals.sorted.reverse)
    assert(got.columns.takeRight(1).head == "dbl")
  }

  test("sqlScript: '?' inside a string literal is not an argument slot") {
    val out = g.sqlScript(
      "select count(*) as n from nation where n_name != 'who?'; " +
      "select n_regionkey from nation where n_regionkey = ?", 2)
    assert(out.collect().forall(_.getInt(0) == 2))
  }

  test("count-window keys with spaces do not collide") {
    val d = Seq(("a b", "c", 1L), ("a", "b c", 2L), ("a b", "c", 3L))
      .toDF("k1", "k2", "v")
    val out = CountWindow.assign(d, size = 2, keyCols = Seq("k1", "k2"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSet
    // ("a b","c") has 2 rows -> both w_id 0; ("a","b c") alone -> w_id 0.
    // Pre-fix all three rows shared one counter and the third row got w_id 1.
    assert(out == Set(("a b", "c", 0L), ("a", "b c", 0L)))
  }

  test("ORDER BY on an already-ordered subquery yields Left, not an exception") {
    val r = graft.parser.SqlParser.parse("(select a from t order by a limit 1) order by a")
    assert(r.isLeft)
    assert(r.left.toOption.get.contains("ORDER BY"))
  }
}
