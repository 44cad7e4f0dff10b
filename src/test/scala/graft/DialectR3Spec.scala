package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Behavioral specs for the round-3 dialect additions: DISTINCT ON, star
  * EXCLUDE/REPLACE, SEMI/ANTI/NATURAL joins, TRY_CAST, IGNORE NULLS window
  * variants, GROUPING(), WITHIN GROUP ordered-set aggregates, array
  * literals + 1-based subscripts. */
class DialectR3Spec extends AnyFunSuite {
  private def g = TestSpark.session

  test("DISTINCT ON keeps exactly one row per key in ORDER BY order") {
    val rows = g.sql(
      "select distinct on (n_regionkey) n_regionkey as k, n_name as n " +
      "from nation order by n_regionkey, n_name").collect()
    assert(rows.length == 5)
    // first name per region in ascending name order
    assert(rows.map(_.getString(1)).forall(_ != null))
    val manual = g.sql(
      "select n_regionkey as k, min2 as n from (select n_regionkey, n_name, " +
      "row_number() over (partition by n_regionkey order by n_name) as rn, " +
      "n_name as min2 from nation) as t where rn = 1 order by k").collect()
    assert(rows.toSeq == manual.toSeq)
  }

  test("DISTINCT ON with aggregation raises a clear error") {
    val e = intercept[Exception](g.sql(
      "select distinct on (n_regionkey) n_regionkey, count(*) as n " +
      "from nation group by n_regionkey").collect())
    assert(e.getMessage.contains("DISTINCT ON"))
  }

  test("star EXCLUDE drops and REPLACE substitutes in place") {
    val df = g.sql("select * exclude (n_nationkey) replace (lower(n_name) as n_name) " +
      "from nation order by n_name limit 1")
    assert(df.columns.toSeq == Seq("n_name", "n_regionkey"))
    assert(df.collect().head.getString(0) == "nation_0")
  }

  test("star modifier on unknown column errors with the schema in hand") {
    val e = intercept[Exception](g.sql("select * exclude (nope) from nation"))
    assert(e.getMessage.contains("unknown column"))
  }

  test("SEMI JOIN keeps matching left rows only, right never projects") {
    val df = g.sql(
      "select n_name from nation semi join region " +
      "on n_regionkey = r_regionkey and r_name = 'ASIA' order by n_name")
    assert(df.columns.toSeq == Seq("n_name"))
    assert(df.count() == 5)
    // equivalent to WHERE EXISTS
    val ex = g.sql(
      "select n_name from nation where exists (select 1 from region " +
      "where n_regionkey = r_regionkey and r_name = 'ASIA') order by n_name")
    assert(df.collect().toSeq == ex.collect().toSeq)
  }

  test("ANTI JOIN is the complement of SEMI JOIN") {
    val semi = g.sql("select count(*) as n from nation semi join region on n_regionkey = r_regionkey and r_name = 'ASIA'").collect().head.getLong(0)
    val anti = g.sql("select count(*) as n from nation anti join region on n_regionkey = r_regionkey and r_name = 'ASIA'").collect().head.getLong(0)
    assert(semi + anti == 25)
  }

  test("NATURAL JOIN binds all shared columns; none shared errors") {
    val n = g.sql(
      "select count(*) as n from nation natural join " +
      "(select r_regionkey as n_regionkey, r_name from region) as r")
      .collect().head.getLong(0)
    assert(n == 25)
    val e = intercept[Exception](g.sql(
      "select * from (select 1 as a) x natural join (select 2 as b) y").collect())
    assert(e.getMessage.contains("share no column"))
  }

  test("TRY_CAST yields NULL on invalid input where CAST would error") {
    val r = g.sql("select try_cast('x' as int) as a, try_cast('7' as int) as b").collect().head
    assert(r.isNullAt(0) && r.getInt(1) == 7)
  }

  test("IGNORE NULLS carries the last non-null observation forward") {
    val rows = g.sql(
      "select n_nationkey as k, last_value(case when n_nationkey % 3 = 0 then n_nationkey end) " +
      "ignore nulls over (order by n_nationkey rows between unbounded preceding and current row) as l " +
      "from nation order by k limit 5").collect()
    assert(rows.map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSeq ==
      Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L)))
  }

  test("IGNORE NULLS without OVER is a parse error") {
    val e = intercept[Exception](g.sql("select last_value(n_name) ignore nulls from nation"))
    assert(e.getMessage.contains("OVER"))
  }

  test("IGNORE NULLS on a non-offset window function errors") {
    val e = intercept[Exception](g.sql(
      "select sum(n_nationkey) ignore nulls over (order by n_nationkey) as s from nation").collect())
    assert(e.getMessage.contains("IGNORE NULLS"))
  }

  test("GROUPING() distinguishes subtotal NULLs from data NULLs") {
    val rows = g.sql(
      "select cast(grouping(n_regionkey) as int) as gf, count(*) as n " +
      "from nation group by n_regionkey with rollup order by gf, n").collect()
    assert(rows.count(_.getInt(0) == 0) == 5)
    assert(rows.filter(_.getInt(0) == 1).map(_.getLong(1)).toSeq == Seq(25L))
  }

  test("WITHIN GROUP string_agg is deterministic in the given order") {
    val r = g.sql(
      "select string_agg(r_name, '|') within group (order by r_name) as s from region")
      .collect().head.getString(0)
    assert(r == "AFRICA|AMERICA|ASIA|EUROPE|MIDDLE EAST")
    val rd = g.sql(
      "select string_agg(r_name, '|') within group (order by r_name desc) as s from region")
      .collect().head.getString(0)
    assert(rd == "MIDDLE EAST|EUROPE|ASIA|AMERICA|AFRICA")
  }

  test("WITHIN GROUP percentile_cont interpolates; DESC flips the fraction") {
    val m = g.sql(
      "select percentile_cont(0.5) within group (order by n_nationkey) as m from nation")
      .collect().head.getDouble(0)
    assert(m == 12.0)
    val q = g.sql(
      "select percentile_cont(0.25) within group (order by n_nationkey desc) as m from nation")
      .collect().head.getDouble(0)
    assert(q == 18.0) // 75th ascending
  }

  test("array literal, 1-based subscript and array functions") {
    val r = g.sql("select [10, 20, 30][2] as a, size([1, 2]) as n, " +
      "array_contains(['x', 'y'], 'y') as has").collect().head
    assert(r.getLong(0) == 20L && r.getInt(1) == 2 && r.getBoolean(2))
  }

  test("LATERAL join: inner ORDER BY/LIMIT applies per outer row") {
    val rows = g.sql(
      "select n.n_regionkey as rk, t.nk from nation n " +
      "join lateral (select n_nationkey as nk from nation n2 " +
      "where n2.n_regionkey = n.n_regionkey order by n_nationkey desc limit 1) as t on true " +
      "where n.n_nationkey < 5 order by rk").collect()
    // each of the 5 outer rows gets ITS region's max nationkey
    assert(rows.length == 5)
    rows.foreach { r =>
      val rk = r.getAs[Number](0).longValue
      assert(r.getAs[Number](1).longValue == 20 + rk) // max key per region in testdata
    }
  }

  test("LEFT JOIN LATERAL keeps unmatched outer rows with NULLs") {
    val rows = g.sql(
      "select n.n_nationkey as k, t.ck from nation n " +
      "left join lateral (select c_custkey as ck from customer c " +
      "where c.c_nationkey = n.n_nationkey and c.c_acctbal > 99999999 " +
      "order by c_custkey limit 1) as t " +
      "order by k").collect()
    assert(rows.length == 25 && rows.forall(_.isNullAt(1)))
  }

  test("CROSS JOIN LATERAL with a correlated global aggregate") {
    val rows = g.sql(
      "select n.n_nationkey as k, t.cnt from nation n " +
      "cross join lateral (select count(*) as cnt from customer c " +
      "where c.c_nationkey = n.n_nationkey) as t order by k").collect()
    val manual = g.sql(
      "select n_nationkey as k, (select count(*) from customer c " +
      "where c.c_nationkey = n.n_nationkey) as cnt from nation n order by k").collect()
    assert(rows.map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSeq ==
      manual.map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSeq)
  }

  test("EXISTS works in projection, CASE, and OR positions") {
    val flags = g.sql(
      "select n_nationkey as k, exists (select 1 from customer c " +
      "where c.c_nationkey = n.n_nationkey and c.c_acctbal > 9000) as rich " +
      "from nation n order by k").collect()
    assert(flags.length == 25)
    assert(flags.exists(_.getBoolean(1)) && flags.exists(!_.getBoolean(1)))
    val orCount = g.sql(
      "select count(*) as n from nation n where n_nationkey = 0 or exists " +
      "(select 1 from customer c where c.c_nationkey = n.n_nationkey and c.c_acctbal > 9500)")
      .collect().head.getLong(0)
    val manual = g.sql(
      "select count(*) as n from (select n_nationkey, exists (select 1 from customer c " +
      "where c.c_nationkey = n.n_nationkey and c.c_acctbal > 9500) as e from nation n) as t " +
      "where n_nationkey = 0 or e").collect().head.getLong(0)
    assert(orCount == manual)
  }

  test("non-equality correlated scalar subquery runs via the native path") {
    val rows = g.sql(
      "select r_regionkey as k, (select min(n_name) from nation n " +
      "where n.n_regionkey >= r.r_regionkey) as first_name from region r order by k").collect()
    assert(rows.length == 5 && rows.forall(!_.isNullAt(1)))
  }

  test("table functions: range is end-exclusive, generate_series inclusive") {
    val r = g.sql("select range as k from range(1, 4) order by k").collect().map(_.getLong(0))
    assert(r.toSeq == Seq(1L, 2L, 3L))
    val gs = g.sql("select generate_series as k from generate_series(1, 4) order by k")
      .collect().map(_.getLong(0))
    assert(gs.toSeq == Seq(1L, 2L, 3L, 4L))
    val down = g.sql("select generate_series as k from generate_series(5, 1, -2) order by k desc")
      .collect().map(_.getLong(0))
    assert(down.toSeq == Seq(5L, 3L, 1L))
    // joins like any relation
    val n = g.sql("select count(*) as n from nation join range(3) as r " +
      "on n_regionkey = r.range").collect().head.getLong(0)
    assert(n == 15) // regions 0,1,2 × 5 nations each
  }

  test("named WINDOW clause expands to the same plan as inline OVER") {
    val a = g.sql("select n_nationkey as k, cast(row_number() over w as long) as rn " +
      "from nation window w as (partition by n_regionkey order by n_nationkey) order by k").collect()
    val b = g.sql("select n_nationkey as k, cast(row_number() over " +
      "(partition by n_regionkey order by n_nationkey) as long) as rn " +
      "from nation order by k").collect()
    assert(a.toSeq == b.toSeq)
    val e = intercept[Exception](g.sql(
      "select row_number() over nope as rn from nation window w as (order by n_nationkey)"))
    assert(e.getMessage.contains("no such window"))
  }

  test("GROUP BY ROLLUP(a, b) matches the WITH ROLLUP trailer") {
    val a = g.sql("select n_regionkey as k, count(*) as n from nation " +
      "group by rollup(n_regionkey) order by k nulls last").collect()
    val b = g.sql("select n_regionkey as k, count(*) as n from nation " +
      "group by n_regionkey with rollup order by k nulls last").collect()
    assert(a.toSeq == b.toSeq && a.length == 6)
    val c = g.sql("select count(*) as n from region group by cube(r_regionkey, r_name)")
      .collect()
    assert(c.length == 5 + 5 + 5 + 1) // (a,b), (a), (b), ()
  }

  test("ordered aggregates keep the requested order at any parallelism") {
    val arr = g.sql("select array_join(array_agg(r_name order by r_name desc), '|') as s2 from region")
      .collect().head.getString(0)
    assert(arr == "MIDDLE EAST|EUROPE|ASIA|AMERICA|AFRICA")
    // order key different from the value: names ordered by region key
    val byKey = g.sql("select string_agg(r_name, ',' order by r_regionkey desc) as s2 from region")
      .collect().head.getString(0)
    assert(byKey == "MIDDLE EAST,EUROPE,ASIA,AMERICA,AFRICA")
    val e = intercept[Exception](g.sql("select sum(r_regionkey order by r_name) as x from region"))
    assert(e.getMessage.contains("ORDER BY"))
  }

  test("DISTINCT aggregates: real variants work, silent drops are errors") {
    // string_agg(distinct): each value once (order unspecified → compare as sets)
    val sa = g.sql("select string_agg(distinct n_regionkey, '|') as s2 from nation")
      .collect().head.getString(0).split('|').map(_.toLong).toSet
    assert(sa == Set(0L, 1L, 2L, 3L, 4L))
    val ag = g.sql("select array_agg(distinct n_regionkey) as a from nation")
      .collect().head.getSeq[Long](0).toSet
    assert(ag == Set(0L, 1L, 2L, 3L, 4L))
    // min(distinct) ≡ min — allowed
    assert(g.sql("select min(distinct n_regionkey) as m from nation")
      .collect().head.getAs[Number](0).longValue == 0L)
    // silently dropping DISTINCT would be a wrong answer — must error
    val e = intercept[Exception](g.sql(
      "select stddev(distinct n_regionkey) as s2 from nation").collect())
    assert(e.getMessage.contains("DISTINCT"))
    val e2 = intercept[Exception](g.sql(
      "select array_agg(distinct n_name order by n_name) as a from nation"))
    assert(e2.getMessage.contains("DISTINCT"))
  }

  test("SIMILAR TO anchors the whole string") {
    val r = g.sql("select count(*) as n from nation where n_name similar to 'NATION_1'")
      .collect().head.getLong(0)
    assert(r == 1) // NATION_1 only — NATION_10..19 do not match (anchored)
    val r2 = g.sql("select count(*) as n from nation where n_name similar to 'NATION_1[0-9]'")
      .collect().head.getLong(0)
    assert(r2 == 10)
    val r3 = g.sql("select count(*) as n from nation where n_name not similar to 'NATION_.*'")
      .collect().head.getLong(0)
    assert(r3 == 0)
  }

  test("COLUMNS('regex') expands per matching column, wrapper applies to each") {
    val bare = g.sql("select columns('^n_') from nation limit 1")
    assert(bare.columns.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    // partial match like DuckDB: 'regionkey' hits n_regionkey
    val part = g.sql("select columns('regionkey') from nation limit 1")
    assert(part.columns.toSeq == Seq("n_regionkey"))
    val agg = g.sql("select min(columns('^(n_nationkey|n_regionkey)$')) from nation")
    assert(agg.columns.toSeq == Seq("n_nationkey", "n_regionkey"))
    assert(agg.collect().head.getAs[Number](0).longValue == 0L)
    val e = intercept[Exception](g.sql("select columns('zzz') from nation"))
    assert(e.getMessage.contains("matched no columns"))
    val e2 = intercept[Exception](g.sql("select columns('^n_') as x from nation"))
    assert(e2.getMessage.contains("alias"))
  }

  test("lambda HOFs: transform/filter/aggregate/zip_with/forall") {
    val r = g.sql(
      "select transform([1, 2, 3], x -> x * 10) as t2, " +
      "filter([1, 2, 3, 4], x -> x % 2 = 0) as ev, " +
      "aggregate([1, 2, 3], cast(100 as long), (acc, x) -> acc + x) as agg, " +
      "zip_with([1, 2], [10, 20], (a, b) -> a + b) as z, " +
      "forall([2, 4], x -> x % 2 = 0) as allev, " +
      "array_exists([1, 3], x -> x > 2) as any2").collect().head
    assert(r.getSeq[Long](0) == Seq(10L, 20L, 30L))
    assert(r.getSeq[Long](1) == Seq(2L, 4L))
    assert(r.getLong(2) == 106L)
    assert(r.getSeq[Long](3) == Seq(11L, 22L))
    assert(r.getBoolean(4) && r.getBoolean(5))
  }

  test("lambda params shadow columns; outer columns stay visible in body") {
    val rows = g.sql(
      "select n_nationkey as k, " +
      "transform([1, 2], x -> x + n_regionkey) as shifted " +
      "from nation where n_nationkey < 2 order by k").collect()
    assert(rows(0).getSeq[Long](1) == Seq(1L, 2L))  // region 0
    assert(rows(1).getSeq[Long](1) == Seq(2L, 3L))  // region 1
    // a lambda outside a HOF argument errors clearly
    val e = intercept[Exception](g.sql("select upper(x -> x) as b from nation"))
    assert(e.getMessage.contains("lambda"))
  }

  test("round-3 edge interplay: distinct-on ordering, star-mod distinct, lambda in WHERE") {
    // DISTINCT ON picks by a NON-key ORDER BY (looser than Postgres, like DuckDB)
    val top = g.sql("select distinct on (n_regionkey) n_regionkey as k, n_name " +
      "from nation order by n_regionkey, n_name desc").collect()
    assert(top.length == 5 && top.forall(_.getString(1).nonEmpty))
    // DISTINCT composes with star modifiers (dedup after expansion)
    val d = g.sql("select distinct * exclude (n_nationkey, n_name) from nation").collect()
    assert(d.length == 5)
    // lambdas work in WHERE predicates
    val n = g.sql("select count(*) as n from nation " +
      "where forall([n_regionkey], x -> x < 3)").collect().head.getLong(0)
    assert(n == 15)
    // COLUMNS outside the SELECT list errors clearly
    val e = intercept[Exception](g.sql(
      "select n_name from nation where columns('^n_') = 1").collect())
    assert(e.getMessage.contains("SELECT list"))
  }

  test("DISTINCT ON binds ? parameters in textual order") {
    val rows = g.sql(
      "select distinct on (n_regionkey % ?) n_regionkey % ? as k, n_name from nation " +
      "order by n_regionkey % ?, n_name", 2L, 2L, 2L).collect()
    assert(rows.length == 2)
  }
}
