package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end: graft SQL → DataFrame, differentially checked against the
  * equivalent hand-built DataFrame plan (Spark itself is the oracle here;
  * the driver separately runs DuckDB as an independent oracle). */
class EngineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val g = TestSpark.session
  private lazy val li: DataFrame = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
  // events.ts is parquet TIMESTAMP(NANOS): go through the catalog, which
  // restores it to a proper timestamp column.
  private lazy val ev: DataFrame = g.catalog.relation("events")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    assert(got.columns.toSeq == want.columns.toSeq, "column names differ")
    assert(rows(got) == rows(want))
  }

  test("M0: projection + arithmetic + where") {
    val got = g.sql(
      "select l_orderkey + 3 as k from lineitem as s where l_linenumber = 2 or (l_quantity > 30 and l_discount = 0.05)")
    val want = li.filter(col("l_linenumber") === 2 ||
        (col("l_quantity") > 30 && col("l_discount") === 0.05))
      .select((col("l_orderkey") + 3).as("k"))
    assertSame(got, want)
    assert(got.count() > 0)
  }

  test("select star and qualified star") {
    assertSame(g.sql("select * from region"),
      spark.read.parquet(s"${TestSpark.sf}/region.parquet"))
    assert(g.sql("select r.* from region as r").columns.length == 2)
  }

  test("group by / having / aggregates") {
    val got = g.sql(
      "select l_returnflag as f, count(l_orderkey) as n, sum(l_quantity) as q, avg(l_discount) as d, min(l_extendedprice) as mn, max(l_extendedprice) as mx " +
      "from lineitem group by l_returnflag having count(l_orderkey) > 100")
    val want = li.groupBy(col("l_returnflag"))
      .agg(count(col("l_orderkey")).as("n"), sum(col("l_quantity")).as("q"),
        avg(col("l_discount")).as("d"), min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
      .filter(col("n") > 100)
      .select(col("l_returnflag").as("f"), col("n"), col("q"), col("d"), col("mn"), col("mx"))
    assertSame(got, want)
  }

  test("corpus group-by: non-key constant expr in projection") {
    val got = g.sql("select count(l_orderkey) as i, 1+3 *2 as num from lineitem group by l_returnflag having l_returnflag > 'A'")
    assert(got.columns.toSeq == Seq("i", "num"))
    assert(got.count() > 0)
  }

  test("join on / using / cross") {
    val cu = spark.read.parquet(s"${TestSpark.sf}/customer.parquet")
    val na = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    val got = g.sql("select c.c_name, n.n_name from customer c join nation n on c.c_nationkey = n.n_nationkey where c.c_acctbal > 9000")
    val want = cu.alias("c").join(na.alias("n"),
        col("c.c_nationkey") === col("n.n_nationkey"))
      .filter(col("c.c_acctbal") > 9000)
      .select(col("c.c_name").as("c_name"), col("n.n_name").as("n_name"))
    assertSame(got, want)

    val using = g.sql("select count(*) as n from nation a join nation b using (n_regionkey)")
    val naDf = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    val wantUsing = naDf.alias("a").join(naDf.alias("b"), Seq("n_regionkey")).count()
    assert(using.collect().head.getLong(0) == wantUsing)
    val cross = g.sql("select * from region r1 cross join region r2")
    assert(cross.count() == 25)
  }

  test("left/right/full outer joins") {
    val n = g.sql("select n.n_name, r.r_name from nation n left join region r on n.n_regionkey = r.r_regionkey")
    assert(n.count() == 25)
    val r = g.sql("select n.n_name, r.r_name from nation n right join region r on n.n_regionkey = r.r_regionkey")
    assert(r.count() >= 25)
    val f = g.sql("select n.n_name, r.r_name from nation n full outer join region r on n.n_regionkey = r.r_regionkey and r.r_regionkey < 2")
    assert(f.count() >= 25)
  }

  test("order by / limit / offset") {
    val got = g.sql("select o_orderkey, o_totalprice from orders order by o_totalprice desc, o_orderkey limit 5")
    val want = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_totalprice").limit(5)
    assert(got.collect().toSeq == want.collect().toSeq)

    val page2 = g.sql("select o_orderkey from orders order by o_orderkey limit 3 offset 3")
    val all6 = g.sql("select o_orderkey from orders order by o_orderkey limit 6")
    assert(page2.collect().toSeq == all6.collect().toSeq.drop(3))
  }

  test("order by alias and expression") {
    val got = g.sql("select l_orderkey * 2 as dbl from lineitem order by dbl limit 3")
    assert(got.collect().map(_.getLong(0)).toSeq.sorted.sameElements(got.collect().map(_.getLong(0))))
    g.sql("select l_orderkey from lineitem order by l_extendedprice desc limit 3").collect()
  }

  test("distinct") {
    val got = g.sql("select distinct l_returnflag from lineitem")
    assert(got.count() == li.select("l_returnflag").distinct().count())
  }

  test("set operations") {
    val u = g.sql("select n_regionkey from nation union select r_regionkey from region")
    assert(u.count() == 5)
    val ua = g.sql("select n_regionkey from nation union all select r_regionkey from region")
    assert(ua.count() == 30)
    val ex = g.sql("select n_regionkey from nation except select r_regionkey from region where r_regionkey < 2")
    assert(rows(ex) == Set(Seq(2), Seq(3), Seq(4)))
    val ix = g.sql("select n_regionkey from nation intersect select r_regionkey from region")
    assert(ix.count() == 5)
  }

  test("in-list, between, like, is null, not") {
    val got = g.sql("select count(*) as n from orders where o_orderstatus in ('F', 'O') and o_totalprice between 100 and 200000 and o_orderpriority like '1%' and o_custkey is not null")
    assert(got.collect().head.getLong(0) ==
      spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
        .filter(col("o_orderstatus").isin("F", "O") &&
          col("o_totalprice").between(100, 200000) &&
          col("o_orderpriority").like("1%") && col("o_custkey").isNotNull)
        .count())
  }

  test("in (subquery) and exists") {
    val inq = g.sql("select c_name from customer where c_nationkey in (select n_nationkey from nation where n_regionkey = 1)")
    val na = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    val cu = spark.read.parquet(s"${TestSpark.sf}/customer.parquet")
    val keys = na.filter(col("n_regionkey") === 1).select("n_nationkey")
    val want = cu.join(keys, cu("c_nationkey") === keys("n_nationkey"), "left_semi").select(col("c_name"))
    assertSame(inq, want)

    val ex = g.sql("select c_name from customer c where exists (select 1 from orders o where o.o_custkey = c.c_custkey and o.o_totalprice > 300000)")
    assert(ex.count() > 0)
    val nex = g.sql("select count(*) as n from customer c where not exists (select 1 from orders o where o.o_custkey = c.c_custkey)")
    val cu2 = spark.read.parquet(s"${TestSpark.sf}/customer.parquet")
    val or2 = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
    val wantNex = cu2.join(or2, cu2("c_custkey") === or2("o_custkey"), "left_anti").count()
    assert(nex.collect().head.getLong(0) == wantNex)
  }

  test("scalar subquery") {
    val got = g.sql("select o_orderkey from orders where o_totalprice > (select avg(o_totalprice) from orders) limit 5")
    assert(got.count() == 5)
  }

  test("case when / functions / division semantics") {
    val got = g.sql("select case when l_quantity > 25 then 'big' else 'small' end as sz, l_quantity / 2 as hq, abs(0 - l_tax) as t, upper(l_returnflag) as u, substring(l_linestatus, 1, 1) as s1 from lineitem limit 10")
    assert(got.schema("hq").dataType.typeName == "double") // `/` → Double, typer.scala_:243
    assert(got.count() == 10)
  }

  test("? parameters bind in text order") {
    val got = g.sql("select l_orderkey from lineitem where l_quantity > ? and l_discount < ? order by l_orderkey limit ?", 45, 0.02, 7L)
    assert(got.count() <= 7)
  }

  test("derived tables and dual") {
    val got = g.sql("select k from (select l_orderkey as k from lineitem where l_quantity > 49) as q where k > 100")
    assert(got.count() > 0)
    assert(g.sql("select 1 + 2 as three").collect().head.getLong(0) == 3)
  }

  test("rollup") {
    val got = g.sql("select l_returnflag as f, l_linestatus as s, sum(l_quantity) as q from lineitem group by l_returnflag, l_linestatus with rollup")
    val want = li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity").as("q"))
    assert(got.count() == want.count())
  }

  test("DDL: create schema (+extends) and create stream with derived source") {
    g.sql("create schema base (id long, ts timestamp)")
    g.sql("create schema extended (value double) extends base")
    assert(g.catalog.schema("extended").get.fieldNames.toSeq == Seq("id", "ts", "value"))

    g.sql("create stream hot_events (event_id long) as (select event_id from events where value > 100)")
    val n = g.sql("select count(*) as n from hot_events").collect().head.getLong(0)
    assert(n == ev.filter(col("value") > 100).count())
  }

  test("insert into values and insert-select") {
    g.sql("create stream sink (a long, b string)")
    g.sql("insert into sink (a, b) values (1, 'x'), (2, 'y')")
    g.sql("insert into sink select l_orderkey, l_returnflag from lineitem where l_orderkey < 3")
    assert(g.sql("select count(*) as n from sink").collect().head.getLong(0) >= 2)
  }

  test("update/delete execute copy-on-write on session relations") {
    g.sql("create stream mut_t (k long, v double, tag string)")
    g.sql("insert into mut_t values (1, 10.0, 'a'), (2, 20.0, 'b'), (3, 30.0, 'a'), (4, null, 'c')")
    g.sql("update mut_t set v = v * 10, tag = 'hot' where v >= 20")
    // null-predicate rows keep old values (SQL three-valued logic)
    val afterUpd = g.sql("select k, v, tag from mut_t order by k").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2))).toSeq
    assert(afterUpd == Seq(
      (1L, Some(10.0), "a"), (2L, Some(200.0), "hot"),
      (3L, Some(300.0), "hot"), (4L, None, "c")))
    g.sql("delete from mut_t where v > 250")
    assert(g.sql("select k from mut_t order by k").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 4L)) // null-predicate row 4 survives
    g.sql("delete from mut_t")
    assert(g.sql("select count(*) as n from mut_t").collect().head.getLong(0) == 0L)
    // guardrails
    intercept[Exception](g.sql("update mut_t set nope = 1"))
    intercept[Exception](g.sql("update mut_t set v = 1 order by k limit 1"))
    intercept[Exception](g.sql("update nosuch_t set v = 1"))
  }

  test("tumbling time window [size 1 d on ts]") {
    val got = g.sql("select w_start, count(*) as n from events [size 1 d on ts] group by w_start")
    val want = ev.groupBy(window(col("ts"), "1 day")).agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))
    assertSame(got, want)
  }

  test("sliding time window [size 2 d every 1 d on ts]") {
    val got = g.sql("select w_start, count(*) as n from events [size 2 d on ts every 1 d] group by w_start")
    val want = ev.groupBy(window(col("ts"), "2 days", "1 day")).agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))
    assertSame(got, want)
  }

  test("partitioned window implies per-key grouping") {
    val got = g.sql("select w_start, event_type, sum(value) as v from events [size 1 d on ts partitioned on event_type] group by event_type")
    val want = ev.groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(sum("value").as("v"))
      .select(col("window.start").as("w_start"), col("event_type"), col("v"))
    assertSame(got, want)
  }

  test("count window [size 100 on event_id]") {
    val got = g.sql("select w_id, count(*) as n from events [size 100 on event_id] group by w_id")
    val total = ev.count()
    val full = got.filter(col("n") === 100).count()
    assert(full == total / 100)
  }

  test("sliding count window [size 3 every 2]: hand-computed overlap (r11)") {
    import TestSpark.spark.implicits._
    val g2 = new GraftSession(TestSpark.spark)
    g2.catalog.registerTable("five",
      Seq(0L, 1L, 2L, 3L, 4L).toDF("r"))
    val got = g2.sql(
        "select r, w_id from five [size 3 every 2 on r] order by r, w_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    // window j = rows [(j+1)*2-3, (j+1)*2-1]: w0={0,1}, w1={1,2,3}, w2={3,4}
    assert(got == Seq((0L, 0L), (1L, 0L), (1L, 1L), (2L, 1L),
      (3L, 1L), (3L, 2L), (4L, 2L)), s"got $got")
  }

  test("gap count window [size 2 every 3]: rows between windows get none (r11)") {
    import TestSpark.spark.implicits._
    val g2 = new GraftSession(TestSpark.spark)
    g2.catalog.registerTable("seven",
      (0L to 6L).toDF("r"))
    val got = g2.sql(
        "select r, w_id from seven [size 2 every 3 on r] order by r, w_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    // window j = rows [(j+1)*3-2, (j+1)*3-1]: w0={1,2}, w1={4,5}; 0,3,6 drop
    assert(got == Seq((1L, 0L), (2L, 0L), (4L, 1L), (5L, 1L)), s"got $got")
    // partitioned sliding path: same formula per key
    g2.catalog.registerTable("keyed",
      Seq(("a", 0L), ("a", 1L), ("a", 2L), ("b", 0L), ("b", 1L))
        .toDF("k", "r"))
    val keyed = g2.sql(
        "select k, r, w_id from keyed [size 3 every 2 on r partitioned on k] " +
        "order by k, r, w_id")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    assert(keyed == Seq(("a", 0L, 0L), ("a", 1L, 0L), ("a", 1L, 1L),
      ("a", 2L, 1L), ("b", 0L, 0L), ("b", 1L, 0L), ("b", 1L, 1L)), s"got $keyed")
    // mixed policy is a loud error, not a silent drop
    val err = intercept[graft.translate.GraftAnalysisException] {
      g2.sql("select r, w_id from seven [size 2 every 1 h on r]")
    }
    assert(err.getMessage.contains("time-based"))
  }

  test("windowed join buckets co-windowed rows") {
    // window specs make downstream aggregation implicitly per-window (FSQL
    // semantics): sum the per-window counts and compare with the total
    // number of co-windowed same-type pairs.
    val got = g.sql(
      "select count(*) as n from events [size 1 h on ts] as e1 join events [size 1 h on ts] as e2 on e1.event_type = e2.event_type")
    val gotTotal = got.agg(sum("n")).collect().head.getLong(0)
    val w = window(col("ts"), "1 hour")
    val l = ev.select(w.as("w"), col("event_type"))
    val r = ev.select(w.as("w"), col("event_type").as("et2"))
    val want = l.join(r, l("w") === r("w") && col("event_type") === col("et2")).count()
    assert(gotTotal == want)
  }

  test("fluent expression DSL") {
    import TestSpark.spark.implicits._
    val c = g.expr("l_quantity.sum as total")
    val got = li.agg(c).collect().head.getDouble(0)
    val want = li.agg(sum("l_quantity")).collect().head.getDouble(0)
    assert(got == want)
    assert(li.filter(g.expr("l_quantity > 30 && l_discount <= 0.05")).count() ==
      li.filter(col("l_quantity") > 30 && col("l_discount") <= 0.05).count())
    assert(li.select(g.expr("l_returnflag.substring(1, 1)")).distinct().count() ==
      li.select(col("l_returnflag").substr(1, 1)).distinct().count())
  }

  test("schemaOf reports output types without execution") {
    val sch = g.schemaOf("select l_orderkey as k, l_quantity / 2 as h from lineitem")
    assert(sch.fieldNames.toSeq == Seq("k", "h"))
    assert(sch("h").dataType.typeName == "double")
  }

  test("analytic OVER: ranking, offset, and aggregate-over-partition") {
    import org.apache.spark.sql.expressions.{Window => W}
    val got = g.sql(
      "select o_custkey as ck, o_orderkey as k, " +
      "row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey) as rn, " +
      "rank() over (partition by o_custkey order by o_orderstatus) as rk, " +
      "lag(o_orderkey) over (partition by o_custkey order by o_orderkey) as prev, " +
      "round(sum(o_totalprice) over (partition by o_custkey), 2) as tot " +
      "from orders where o_custkey < 20 order by ck, k")
    val base = g.catalog.relation("orders").filter(col("o_custkey") < 20)
    val want = base.select(
      col("o_custkey").as("ck"), col("o_orderkey").as("k"),
      row_number().over(W.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))).as("rn"),
      rank().over(W.partitionBy("o_custkey").orderBy("o_orderstatus")).as("rk"),
      lag("o_orderkey", 1).over(W.partitionBy("o_custkey").orderBy("o_orderkey")).as("prev"),
      round(sum("o_totalprice").over(W.partitionBy("o_custkey")), 2).as("tot"))
      .orderBy("ck", "k")
    assert(got.collect().toSeq == want.collect().toSeq)
    // unpartitioned running aggregate (default frame = rows up to current)
    val run = g.sql(
      "select n_nationkey as k, count(*) over (order by n_nationkey) as c " +
      "from nation order by k limit 3").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(run.toSeq == Seq((0, 1L), (1, 2L), (2, 3L)))
    // ranking without ORDER BY is a clear analysis error
    val e = intercept[graft.translate.GraftAnalysisException] {
      g.sql("select row_number() over (partition by n_regionkey) as rn from nation")
    }
    assert(e.getMessage.contains("ORDER BY"))
  }

  test("analytic OVER round-trips through the pretty-printer") {
    val sql = "select o_custkey as ck, row_number() over (partition by o_custkey order by o_totalprice desc) as rn from orders"
    val ast1 = graft.parser.SqlParser.parse(sql).toOption.get
    val printed = graft.ast.Pretty.print(ast1)
    val ast2 = graft.parser.SqlParser.parse(printed).toOption.get
    assert(ast2 == ast1, s"round-trip changed AST: $printed")
  }

  test("WITH: CTEs chain, shadow catalog names, and restore scope") {
    // later CTEs see earlier ones
    val got = g.sql(
      "with a as (select n_regionkey as k from nation where n_nationkey < 10), " +
      "b as (select k, count(*) as n from a group by k) " +
      "select k, n from b order by k").collect().map(r => (r.getInt(0), r.getLong(1)))
    val want = g.catalog.relation("nation").filter(col("n_nationkey") < 10)
      .groupBy(col("n_regionkey").as("k")).count()
      .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
    // a CTE named like a catalog table shadows it — only inside the statement
    val shadowed = g.sql(
      "with nation as (select 1 as one) select count(*) as n from nation")
      .collect().head.getLong(0)
    assert(shadowed == 1L)
    assert(g.sql("select count(*) as n from nation").collect().head.getLong(0) == 25L)
  }

  test("QUALIFY filters on window results (plain, input-col, and agg forms)") {
    // predicate over an inline window fn referencing input columns
    val top1 = g.sql(
      "select o_custkey as ck, o_orderkey as k from orders where o_custkey < 10 " +
      "qualify row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey) = 1 " +
      "order by ck")
    import org.apache.spark.sql.expressions.{Window => W}
    val want = g.catalog.relation("orders").filter(col("o_custkey") < 10)
      .withColumn("rn", row_number().over(
        W.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("ck"), col("o_orderkey").as("k")).orderBy("ck")
    assert(top1.collect().toSeq == want.collect().toSeq)
    // qualify over an aggregated output (rank groups by their aggregate)
    val topGroups = g.sql(
      "select l_returnflag as f, count(*) as n from lineitem group by l_returnflag " +
      "qualify row_number() over (order by n desc) <= 2 order by f")
    assert(topGroups.collect().length == 2)
  }

  test("GROUPING SETS equals the union of its member GROUP BYs") {
    val got = g.sql(
      "select l_returnflag as f, l_linestatus as s, count(*) as n from lineitem " +
      "group by grouping sets ((l_returnflag, l_linestatus), (l_linestatus), ()) " +
      "order by f, s")
    val byBoth = li.groupBy(col("l_returnflag").as("f"), col("l_linestatus").as("s")).count()
    val byS = li.groupBy(col("l_linestatus").as("s")).count()
      .select(lit(null).cast("string").as("f"), col("s"), col("count"))
    val total = li.agg(count(lit(1)).as("count"))
      .select(lit(null).cast("string").as("f"), lit(null).cast("string").as("s"), col("count"))
    val want = byBoth.select(col("f"), col("s"), col("count"))
      .unionByName(byS).unionByName(total)
      .orderBy(col("f"), col("s"))
    assert(got.collect().toSeq.map(_.toSeq) == want.collect().toSeq.map(_.toSeq))
  }

  test("ANSI sugar: ||, simple CASE, ordinals, NULLS FIRST/LAST") {
    // || chains and mixes with non-strings (Spark concat casts)
    val t = g.sql("select o_orderstatus || '_' || o_orderpriority as tag from orders where o_orderkey = 1")
      .collect().head.getString(0)
    val w = g.catalog.relation("orders").filter(col("o_orderkey") === 1)
      .select(concat(col("o_orderstatus"), lit("_"), col("o_orderpriority"))).collect().head.getString(0)
    assert(t == w)
    // simple CASE = equality chain against the subject
    val sc = g.sql(
      "select case n_regionkey when 0 then 'zero' when 1 then 'one' else 'many' end as c " +
      "from nation order by n_nationkey limit 5").collect().map(_.getString(0))
    val sw = g.catalog.relation("nation").orderBy("n_nationkey").limit(5)
      .select(when(col("n_regionkey") === 0, "zero").when(col("n_regionkey") === 1, "one")
        .otherwise("many")).collect().map(_.getString(0))
    assert(sc.toSeq == sw.toSeq)
    // GROUP BY 1 / ORDER BY 2 ordinals
    val ord = g.sql("select l_returnflag as f, count(*) as n from lineitem group by 1 order by 2 desc, 1")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val ordW = li.groupBy(col("l_returnflag").as("f")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("f")).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(ord.toSeq == ordW.toSeq)
    // NULLS LAST on an outer-join column flips Spark's default
    val nl = g.sql(
      "select n.n_name as nation, c.c_custkey as ck from customer c " +
      "right join nation n on c.c_nationkey = n.n_nationkey and c.c_acctbal > 9999 " +
      "order by nation, ck nulls last").collect()
    val perNation = nl.groupBy(_.getString(0))
    perNation.values.foreach { rows =>
      val nullIdx = rows.indexWhere(_.isNullAt(1))
      if (nullIdx >= 0) assert(rows.drop(nullIdx).forall(_.isNullAt(1)), "nulls must sort last")
    }
  }

  test("CAST uses the DDL type vocabulary") {
    val r = g.sql(
      "select cast(o_totalprice as long) as l, cast(o_orderkey as string) as s, " +
      "cast(o_totalprice as int) as i from orders where o_orderkey = 1").collect().head
    val want = g.catalog.relation("orders").filter(col("o_orderkey") === 1)
      .select(col("o_totalprice").cast("long"), col("o_orderkey").cast("string"),
        col("o_totalprice").cast("int")).collect().head
    assert(r == want)
    val e = intercept[Exception] {
      g.sql("select cast(o_orderkey as nosuchtype) as x from orders")
    }
    assert(e.getMessage.contains("unknown data type"))
  }

  test("correlated scalar subqueries decorrelate (incl. the COUNT bug)") {
    // projection-position, impossible filter → every group empty → count 0
    val zero = g.sql(
      "select n_nationkey as k, (select count(*) from customer c " +
      "where c.c_nationkey = n.n_nationkey and c.c_acctbal > 99999999) as nc " +
      "from nation n order by k limit 3").collect().map(_.getLong(1))
    assert(zero.toSeq == Seq(0L, 0L, 0L), "empty correlated COUNT group must be 0, not NULL")
    // WHERE-position equality correlation vs a hand-built join
    val got = g.sql(
      "select c_custkey as ck from customer c where c_acctbal > " +
      "(select avg(c_acctbal) from customer c2 where c2.c_nationkey = c.c_nationkey) order by ck")
      .collect().map(_.getLong(0))
    val cust = g.catalog.relation("customer")
    val avgByNation = cust.groupBy(col("c_nationkey").as("nk"))
      .agg(avg(col("c_acctbal")).as("a"))
    val want = cust.join(avgByNation, col("c_nationkey") === col("nk"))
      .where(col("c_acctbal") > col("a"))
      .select(col("c_custkey")).orderBy("c_custkey").collect().map(_.getLong(0))
    assert(got.toSeq == want.toSeq)
    // NON-equality correlation takes the native .scalar() path (round 3):
    // Catalyst decorrelates it, results match a manual window computation
    val ne = g.sql(
      "select n_nationkey as k, (select max(c_acctbal) from customer c " +
      "where c.c_nationkey > n.n_nationkey) as x from nation n order by k")
      .collect().map(r => (r.getAs[Number](0).longValue, Option(r.getAs[Number](1)).map(_.doubleValue)))
    val nat = g.catalog.relation("nation")
    val wantNe = nat.select(col("n_nationkey")).collect().map(_.getAs[Number](0).longValue)
      .sorted.map { k =>
        val mx = cust.where(col("c_nationkey") > k).agg(max(col("c_acctbal")))
          .collect().head
        (k, if (mx.isNullAt(0)) None else Some(mx.getDouble(0)))
      }
    assert(ne.toSeq == wantNe.toSeq)
    // a correlated NON-aggregate scalar subquery violates the <=1-row
    // contract at runtime (Spark enforces it inside the decorrelated plan)
    val e1 = intercept[Exception] {
      g.sql("select (select c_name from customer c where c.c_nationkey = n.n_nationkey) as x from nation n").collect()
    }
    assert(e1.getMessage.contains("More than one row") ||
      e1.getMessage.contains("SCALAR_SUBQUERY_TOO_MANY_ROWS"))
  }

  test("DESCRIBE (query) reports the output schema plan-only") {
    val rows = g.sql("describe (select l_orderkey + 1 as k, upper(l_returnflag) as f, " +
      "l_quantity / 2 as h from lineitem)")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("k", "bigint"), ("f", "string"), ("h", "double")))
  }

  test("SHOW TABLES / DESCRIBE / DROP lifecycle") {
    g.sql("create stream lc_s (a long, b string)")
    val names = g.sql("show tables").collect().map(_.getString(0))
    assert(names.contains("lc_s") && names.contains("lineitem"))
    val desc = g.sql("describe lc_s").collect().map(r => (r.getString(0), r.getString(1)))
    assert(desc.toSeq == Seq(("a", "bigint"), ("b", "string")))
    g.sql("drop stream lc_s")
    assert(!g.sql("show tables").collect().map(_.getString(0)).contains("lc_s"))
    // idempotent with IF EXISTS, error without
    g.sql("drop stream if exists lc_s")
    val e = intercept[graft.translate.GraftAnalysisException] { g.sql("drop stream lc_s") }
    assert(e.getMessage.contains("unknown"))
    g.sql("create schema lc_sch (x long)")
    g.sql("drop schema lc_sch")
    intercept[graft.translate.GraftAnalysisException] { g.sql("drop schema lc_sch") }
  }

  test("MERGE: action order, cardinality check, and insert alignment") {
    g.sql("create stream ms_t (k long, v double, tag string)")
    g.sql("insert into ms_t values (1, 10.0, 'a'), (2, 20.0, 'b'), (3, 30.0, 'c')")
    // delete listed FIRST wins over the later update for v < 15
    g.sql("create stream ms_s (k long, nv double)")
    g.sql("insert into ms_s values (1, 5.0), (2, 200.0), (4, 40.0)")
    g.sql(
      "merge into ms_t as t using ms_s as s on t.k = s.k " +
      "when matched and s.nv < 10 then delete " +
      "when matched then update set v = s.nv " +
      "when not matched then insert (k, v) values (s.k, s.nv)")
    val rows = g.sql("select k, v, tag from ms_t order by k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), if (r.isNullAt(2)) null else r.getString(2)))
    // k=1 deleted (nv<10), k=2 updated, k=3 untouched, k=4 inserted (tag null)
    assert(rows.toSeq == Seq((2L, 200.0, "b"), (3L, 30.0, "c"), (4L, 40.0, null)))
    // a second merge matching one target row twice must raise
    g.sql("create stream ms_dup (k long)")
    g.sql("insert into ms_dup values (2), (2)")
    val e = intercept[graft.translate.GraftAnalysisException] {
      g.sql("merge into ms_t as t using ms_dup as s on t.k = s.k " +
        "when matched then update set v = 0.0")
    }
    assert(e.getMessage.contains("cardinality"))
    // unknown column in SET is a clear error
    val e2 = intercept[graft.translate.GraftAnalysisException] {
      g.sql("merge into ms_t as t using ms_s as s on t.k = s.k " +
        "when matched then update set nope = 1")
    }
    assert(e2.getMessage.contains("nope"))
  }

  test("VALUES relation: literal rows, default col names, joins, errors") {
    val r = g.sql("select a, b from (values (1, 'x'), (2, 'y')) as t(a, b) order by a")
      .collect().map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq((1L, "x"), (2L, "y")))
    // default column names col1..colN
    assert(g.sql("select col1, col2 from (values (1, 2)) as v").columns.toSeq
      == Seq("col1", "col2"))
    // joinable against catalog relations
    val j = g.sql("select n.n_name as nm from (values (0), (1)) as v " +
      "join nation n on n.n_regionkey = v.col1")
    assert(j.count() > 0)
    // arity violations are clear analysis errors
    val e1 = intercept[graft.translate.GraftAnalysisException] {
      g.sql("select * from (values (1, 2), (3)) as t(a, b)")
    }
    assert(e1.getMessage.contains("row 2"))
    val e2 = intercept[graft.translate.GraftAnalysisException] {
      g.sql("select * from (values (1, 2)) as t(a)")
    }
    assert(e2.getMessage.contains("declares"))
  }

  test("explicit window frames: rolling sum, running min, range count") {
    val got = g.sql(
      "select k, t, " +
      "sum(v) over (partition by k order by t rows between 1 preceding and current row) as r2, " +
      "min(v) over (partition by k order by t rows between unbounded preceding and current row) as rmin, " +
      "count(*) over (partition by k order by t range between 1 preceding and current row) as nc " +
      "from (values (1, 10, 5.0), (1, 11, 3.0), (1, 13, 7.0), (2, 10, 1.0)) as x(k, t, v) " +
      "order by k, t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 10L, 5.0, 5.0, 1L),   // first row: frame = itself
      (1L, 11L, 8.0, 3.0, 2L),   // rows: 5+3; range 10..11 has both
      (1L, 13L, 10.0, 3.0, 1L),  // rows: 3+7; range 12..13 only itself
      (2L, 10L, 1.0, 1.0, 1L)))
    // frame without ORDER BY is rejected
    val e = intercept[graft.translate.GraftAnalysisException] {
      g.sql("select sum(v) over (partition by k rows between 1 preceding and current row) as r " +
        "from (values (1, 2.0)) as x(k, v)")
    }
    assert(e.getMessage.contains("ORDER BY"))
  }

  test("interval arithmetic and typed literals") {
    val r = g.sql(
      "select timestamp '2024-01-01 10:00:00' + interval 90 minute as a, " +
      "timestamp '2024-01-01 10:00:00' - interval 2 hour as b, " +
      "date '2024-02-28' + interval 1 day as c, " +
      "timestamp '2024-01-31 00:00:00' + interval 1 month as d").collect().head
    assert(r.getTimestamp(0).toString == "2024-01-01 11:30:00.0")
    assert(r.getTimestamp(1).toString == "2024-01-01 08:00:00.0")
    assert(r.getTimestamp(2).toString == "2024-02-29 00:00:00.0") // leap year
    assert(r.getTimestamp(3).toString == "2024-02-29 00:00:00.0") // month-end clamp
    // comparisons against typed literals filter correctly
    val n = g.sql("select count(*) as n from events where ts < timestamp '2024-01-02 00:00:00'")
      .collect().head.getLong(0)
    val total = g.catalog.relation("events").count()
    assert(n > 0 && n < total)
  }

  test("FILTER (WHERE ...) aggregates and EXTRACT desugar correctly") {
    val r = g.sql(
      "select count(*) filter (where v > 1) as big, " +
      "sum(v) filter (where k = 'a') as sa, count(*) as n " +
      "from (values ('a', 1), ('a', 2), ('b', 3)) as t(k, v)").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L && r.getLong(2) == 3L)
    // FILTER with no matching rows yields NULL for sum, 0 for count
    val r2 = g.sql("select sum(v) filter (where v > 99) as s, " +
      "count(*) filter (where v > 99) as c from (values (1)) as t(v)").collect().head
    assert(r2.isNullAt(0) && r2.getLong(1) == 0L)
    val ex = g.sql("select extract(year from timestamp '2024-03-05 10:11:12') as y, " +
      "extract(month from timestamp '2024-03-05 10:11:12') as m, " +
      "extract(hour from timestamp '2024-03-05 10:11:12') as h").collect().head
    assert((ex.getInt(0), ex.getInt(1), ex.getInt(2)) == ((2024, 3, 10)))
    // FILTER on non-NULL-skipping or multi-arg aggregates is a clean parse error
    val e1 = intercept[GraftParseException] {
      g.sql("select first(v) filter (where v > 1) as f from (values (1)) as t(v)")
    }
    assert(e1.getMessage.contains("NULL-skipping"))
    val e2 = intercept[GraftParseException] {
      g.sql("select corr(a, b) filter (where a > 0) as c from (values (1, 2)) as t(a, b)")
    }
    assert(e2.getMessage.contains("one-argument"))
  }

  test("ORDER BY ALL expands to ordinals over the projection") {
    val got = g.sql("select n_regionkey as r, n_name as nm from nation order by all")
      .collect().map(x => (x.get(0), x.getString(1)))
    val want = g.sql("select n_regionkey as r, n_name as nm from nation order by 1, 2")
      .collect().map(x => (x.get(0), x.getString(1)))
    assert(got.toSeq == want.toSeq)
    // DESC applies to every key; works after set ops too
    val d = g.sql("select n_regionkey as r from nation union select r_regionkey from region order by all desc")
      .collect().map(_.get(0).toString.toLong)
    assert(d.toSeq == d.toSeq.sorted.reverse)
    // star projection is rejected with a clear parse error
    val e = intercept[GraftParseException] { g.sql("select * from nation order by all") }
    assert(e.getMessage.contains("explicit projection"))
  }

  test("GROUP BY ALL: constant projections and DESCRIBE/EXPLAIN params (regression)") {
    // a literal projection is a constant, not a GROUP BY ordinal
    val r = g.sql("select 2 as version, count(*) as n from region group by all").collect()
    assert(r.length == 1 && r.head.getLong(0) == 2L && r.head.getLong(1) == 5L)
    // window-function projections cannot be inferred keys — clear error
    val e = intercept[graft.translate.GraftAnalysisException] {
      g.sql("select l_returnflag as f, count(*) as n, " +
        "row_number() over (order by l_returnflag) as r from lineitem group by all")
    }
    assert(e.getMessage.contains("window-function"))
    // ? parameters bind inside DESCRIBE (query) and EXPLAIN
    val d = g.sql("describe (select l_orderkey as k from lineitem where l_quantity > ?)", 10)
    assert(d.collect().map(_.getString(0)).toSeq == Seq("k"))
    assert(g.sql("explain select count(*) as n from lineitem where l_quantity > ?", 10).count() == 1)
  }

  test("GROUP BY ALL infers keys from aggregate-free projections") {
    val got = g.sql("select l_returnflag as f, l_linestatus as s2, count(*) as n " +
      "from lineitem group by all")
    val want = g.sql("select l_returnflag as f, l_linestatus as s2, count(*) as n " +
      "from lineitem group by l_returnflag, l_linestatus")
    assertSame(got, want)
    // expression keys (not just bare columns) participate
    val e1 = g.sql("select upper(l_returnflag) as uf, count(*) as n from lineitem group by all")
    val e2 = g.sql("select upper(l_returnflag) as uf, count(*) as n from lineitem group by upper(l_returnflag)")
    assertSame(e1, e2)
    // HAVING composes; star is rejected
    assert(g.sql("select l_returnflag as f, count(*) as n from lineitem group by all having count(*) > 100000").count() == 0)
    val err = intercept[graft.translate.GraftAnalysisException] {
      g.sql("select * from lineitem group by all")
    }
    assert(err.getMessage.contains("SELECT *"))
  }

  test("unnest explodes array values per row") {
    val r = g.sql("select a, unnest(split(s, ' ')) as w " +
      "from (values (1, 'x y'), (2, 'z')) as t(a, s) order by a, w")
      .collect().map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq((1L, "x"), (1L, "y"), (2L, "z")))
  }

  test("quantified comparisons: ANSI empty-set and NULL semantics") {
    // empty subquery: `op ALL` is vacuously TRUE, `op ANY` is FALSE
    assert(g.sql("select count(*) as n from region " +
      "where r_regionkey > all (select n_regionkey from nation where n_regionkey < 0)")
      .collect().head.getLong(0) == 5L)
    assert(g.sql("select count(*) as n from region " +
      "where r_regionkey > any (select n_regionkey from nation where n_regionkey < 0)")
      .collect().head.getLong(0) == 0L)
    // a NULL element poisons ALL (like NOT IN) but not a satisfied ANY
    assert(g.sql("select count(*) as n from region " +
      "where r_regionkey >= all (select case when a > 1 then null else a end " +
      "from (values (0), (2)) as t(a))").collect().head.getLong(0) == 0L)
    assert(g.sql("select count(*) as n from region " +
      "where r_regionkey >= any (select case when a > 1 then null else a end " +
      "from (values (0), (2)) as t(a))").collect().head.getLong(0) == 5L)
    // `<> ALL` ≡ NOT IN; `= ANY` ≡ IN
    val notIn = g.sql("select r_regionkey as k from region " +
      "where r_regionkey not in (select n_regionkey from nation where n_regionkey < 2) order by k")
    val neAll = g.sql("select r_regionkey as k from region " +
      "where r_regionkey <> all (select n_regionkey from nation where n_regionkey < 2) order by k")
    assertSame(neAll, notIn)
    // `= ALL`: only TRUE when the subquery holds exactly one distinct
    // non-NULL value equal to the scrutinee
    assert(g.sql("select count(*) as n from region " +
      "where r_regionkey = all (select n_regionkey from nation where n_regionkey = 2)")
      .collect().head.getLong(0) == 1L)
    assert(g.sql("select count(*) as n from region " +
      "where r_regionkey = all (select n_regionkey from nation where n_regionkey in (1, 2))")
      .collect().head.getLong(0) == 0L)
    // `<> ANY`: TRUE unless the subquery is a single distinct value equal
    // to the scrutinee; NULL scrutinee is UNKNOWN even with 2+ values
    assert(g.sql("select count(*) as n from region " +
      "where r_regionkey <> any (select n_regionkey from nation where n_regionkey in (1, 2))")
      .collect().head.getLong(0) == 5L)
    assert(g.sql("select count(*) as n from region " +
      "where r_regionkey <> any (select n_regionkey from nation where n_regionkey = 2)")
      .collect().head.getLong(0) == 4L)
    assert(g.sql("select count(*) as n from (select cast(null as int) as z) t " +
      "where z <> any (select n_regionkey from nation)")
      .collect().head.getLong(0) == 0L)
    // NOT flips the quantifier (De Morgan): not(> any) ≡ <= all
    val a = g.sql("select r_regionkey as k from region " +
      "where not (r_regionkey > any (select n_regionkey from nation where n_regionkey >= 3)) order by k")
    val b = g.sql("select r_regionkey as k from region " +
      "where r_regionkey <= all (select n_regionkey from nation where n_regionkey >= 3) order by k")
    assertSame(a, b)
    // round-trips through the pretty-printer
    val q = "select r_regionkey as k from region where r_regionkey > all (select n_regionkey from nation)"
    val ast1 = graft.parser.SqlParser.parse(q).toOption.get
    val ast2 = graft.parser.SqlParser.parse(graft.ast.Pretty.print(ast1)).toOption.get
    assert(ast1 == ast2)
  }

  test("WITH RECURSIVE: depth-bounded UNION ALL and cycle-safe UNION") {
    // UNION ALL: classic counter recursion, stops via the WHERE bound
    val seq = g.sql(
      "with recursive t as (select 1 as n union all select n + 1 as n from t where n < 6) " +
      "select n from t order by n").collect().map(_.getLong(0))
    assert(seq.toSeq == (1L to 6L))
    // UNION: functional-graph closure with cycles — dedup makes it converge
    val reach = g.sql(
      "with recursive r as (select 0 as k union select (k * 7 + 3) % 25 as k from r) " +
      "select k from r order by k").collect().map(_.getLong(0)).toSeq
    // 0 → 3 → 24 → 21 → 0 … : the orbit of 0 under k↦(7k+3) mod 25
    assert(reach == Seq(0L, 3L, 21L, 24L), s"got $reach")
    // a recursive CTE can feed a downstream join, and non-recursive CTEs
    // coexist in the same RECURSIVE list
    val n = g.sql(
      "with recursive lim as (select 2 as mx), " +
      "t as (select 0 as d union all select d + 1 as d from t where d < (select mx from lim)) " +
      "select count(*) as n from t").collect().head.getLong(0)
    assert(n == 3L)
    // anchor referencing itself is rejected with a clear error
    val e = intercept[graft.translate.GraftAnalysisException] {
      g.sql("with recursive t as (select n from t union all select 1 as n) select n from t")
    }
    assert(e.getMessage.contains("anchor"), e.getMessage)
    // non-convergent UNION ALL recursion hits the iteration guard
    val e2 = intercept[graft.translate.GraftAnalysisException] {
      g.sql("with recursive t as (select 1 as n union all select n from t) " +
        "select count(*) as n from t")
    }
    assert(e2.getMessage.contains("converge"), e2.getMessage)
    // round-trips through the pretty-printer
    val q = "with recursive t as (select 1 as n union all select n + 1 as n from t where n < 3) select n from t"
    val ast1 = graft.parser.SqlParser.parse(q).toOption.get
    assert(graft.parser.SqlParser.parse(graft.ast.Pretty.print(ast1)).toOption.get == ast1)
  }

  test("PIVOT: long to wide with explicit values, aliases, implicit grouping") {
    val r = g.sql(
      "select * from (values (1, 'a', 10.0), (1, 'b', 2.0), (2, 'a', 5.0)) as t(k, c, v) " +
      "pivot (sum(v) for c in ('a' as va, 'b' as vb)) order by k")
    assert(r.columns.toSeq == Seq("k", "va", "vb"))
    val rows = r.collect().map(x => (x.getLong(0), x.get(1), x.get(2)))
    assert(rows.toSeq == Seq((1L, 10.0, 2.0), (2L, 5.0, null)), s"got ${rows.toSeq}")
    // unnamed values keep the value text as the column name
    val r2 = g.sql(
      "select * from (values (1, 'a', 10.0)) as t(k, c, v) pivot (count(v) for c in ('a'))")
    assert(r2.columns.toSeq == Seq("k", "a"))
    // non-literal IN values are rejected clearly
    val e = intercept[graft.translate.GraftAnalysisException] {
      g.sql("select * from (values (1, 'a', 1.0)) as t(k, c, v) pivot (sum(v) for c in (k))")
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
    // round-trips through the pretty-printer
    val q = "select * from t pivot (sum(v) for c in ('a' as va, 'b')) order by k"
    val ast1 = graft.parser.SqlParser.parse(q).toOption.get
    assert(graft.parser.SqlParser.parse(graft.ast.Pretty.print(ast1)).toOption.get == ast1)
  }

  test("ASOF JOIN dialect: left and inner variants, error paths") {
    g.sql("create stream asof_l (k int, t long, lv string) as " +
      "(select * from (values (1, 10, 'x'), (1, 3, 'y'), (2, 5, 'z')) as v(k, t, lv))")
    g.sql("create stream asof_r (k int, t long, rv string) as " +
      "(select * from (values (1, 4, 'r4'), (1, 10, 'r10')) as v(k, t, rv))")
    // LEFT: latest right at-or-before; unmatched keys keep NULL payload
    val left = g.sql(
      "select k, t, rv from asof_l as l asof left join asof_r as r " +
      "on l.k = r.k and l.t >= r.t order by k, t")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(left.toSeq == Seq((1L, 3L, null), (1L, 10L, "r10"), (2L, 5L, null)),
      s"got ${left.toSeq}")
    // INNER: unmatched rows drop
    val inner = g.sql(
      "select k, t, rv from asof_l as l asof join asof_r as r " +
      "on l.k = r.k and l.t >= r.t order by k, t")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(inner.toSeq == Seq((1L, 10L, "r10")), s"got ${inner.toSeq}")
    // reversed time condition is rejected with a clear message
    val e = intercept[graft.translate.GraftAnalysisException] {
      g.sql("select k from asof_l as l asof join asof_r as r on l.k = r.k and r.t >= l.t")
    }
    assert(e.getMessage.contains("at-or-before"), e.getMessage)
    // missing time condition
    val e2 = intercept[graft.translate.GraftAnalysisException] {
      g.sql("select k from asof_l as l asof join asof_r as r on l.k = r.k")
    }
    assert(e2.getMessage.contains("time condition"), e2.getMessage)
    g.sql("drop stream asof_l"); g.sql("drop stream asof_r")
    // round-trips through the pretty-printer
    val q = "select a from l asof left join r on l.k = r.k and l.t >= r.t"
    val ast1 = graft.parser.SqlParser.parse(q).toOption.get
    assert(graft.parser.SqlParser.parse(graft.ast.Pretty.print(ast1)).toOption.get == ast1)
  }

  test("UNPIVOT: wide to long keeps id columns and row count × values") {
    val r = g.sql(
      "select * from (values (1, 10.0, 20.0), (2, 30.0, 40.0)) as t(k, a, b) " +
      "unpivot (v for m in (a, b)) order by k, m")
    assert(r.columns.toSeq == Seq("k", "m", "v"))
    val rows = r.collect().map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
    assert(rows.toSeq == Seq((1L, "a", 10.0), (1L, "b", 20.0), (2L, "a", 30.0), (2L, "b", 40.0)))
    // unknown column raises clearly
    val e = intercept[graft.translate.GraftAnalysisException] {
      g.sql("select * from (values (1, 2.0)) as t(k, a) unpivot (v for m in (zz))")
    }
    assert(e.getMessage.contains("unknown column"), e.getMessage)
    // round-trips through the pretty-printer
    val q = "select * from t unpivot (v for m in (a, b)) order by k"
    val ast1 = graft.parser.SqlParser.parse(q).toOption.get
    assert(graft.parser.SqlParser.parse(graft.ast.Pretty.print(ast1)).toOption.get == ast1)
  }

  test("IS [NOT] DISTINCT FROM is the null-safe comparison") {
    val r = g.sql(
      "select a, b, cast((a is distinct from b) as int) as d, " +
      "cast((a is not distinct from b) as int) as nd " +
      "from (values (1, 1), (1, 2), (null, 1), (null, null)) as t(a, b) " +
      "order by a nulls first, b nulls first")
      .collect().map(x => (x.getInt(2), x.getInt(3)))
    // rows sorted: (null,null)→same, (null,1)→distinct, (1,1)→same, (1,2)→distinct
    assert(r.toSeq == Seq((0, 1), (1, 0), (0, 1), (1, 0)), s"got ${r.toSeq}")
    val q = "select 1 as x from region where r_name is not distinct from 'EUROPE'"
    val ast1 = graft.parser.SqlParser.parse(q).toOption.get
    val ast2 = graft.parser.SqlParser.parse(graft.ast.Pretty.print(ast1)).toOption.get
    assert(ast1 == ast2)
  }

  test("NOT IN is tri-valued: NULL elements and NULL keys per ANSI, no NLJ needed") {
    def ks(sql: String): Seq[Long] =
      g.sql(sql).collect().map(_.getAs[Number](0).longValue).sorted.toSeq
    // plain case: non-null key not in non-null set
    assert(ks("select k from (values (1), (2), (cast(null as int))) as t(k) " +
      "where k not in (select v from (values (2), (5)) as s(v))") == Seq(1L))
    // a NULL element in the subquery makes NOT IN unknown for every row
    assert(ks("select k from (values (1), (2)) as t(k) " +
      "where k not in (select v from (values (5), (cast(null as int))) as s(v))").isEmpty)
    // empty subquery: vacuous TRUE keeps every row, NULL keys included
    val empt = g.sql("select k from (values (1), (cast(null as int))) as t(k) " +
      "where k not in (select v from (values (5)) as s(v) where v > 100)").collect()
    assert(empt.length == 2)
  }

  test("<> ALL routes through the NOT IN hash path (no nested-loop join)") {
    def ks(sql: String): Seq[Long] =
      g.sql(sql).collect().map(_.getAs[Number](0).longValue).sorted.toSeq
    assert(ks("select k from (values (1), (2), (cast(null as int))) as t(k) " +
      "where k <> all (select v from (values (2), (5)) as s(v))") == Seq(1L))
    assert(ks("select k from (values (1), (2)) as t(k) " +
      "where k <> all (select v from (values (5), (cast(null as int))) as s(v))").isEmpty)
    // the equality anti join must be a hash/broadcast join, not BNLJ on
    // the whole comparison (1-row summary cross joins are fine)
    val plan = g.sql("select c_custkey as ck from customer c " +
      "where c_nationkey <> all (select n_nationkey from nation where n_regionkey = 0) " +
      "order by ck").queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"))
    assert(!plan.contains("BuildRight, LeftAnti, ((__qc_key"))
  }

  test("CREATE TABLE AS registers a lazy derived table; composable + droppable") {
    g.sql("create table __ctas_t as select n_nationkey as k, n_regionkey as r " +
      "from nation where n_nationkey < 10")
    // composes with joins/aggregates like any relation
    val n = g.sql("select count(*) as n from __ctas_t t join region x " +
      "on t.r = x.r_regionkey").collect().head.getLong(0)
    assert(n == 10L)
    // visible in SHOW TABLES as a table; DROP TABLE removes it
    val kinds = g.sql("show tables").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kinds.get("__ctas_t").contains("table"))
    g.sql("drop table __ctas_t")
    val e = intercept[Exception](g.sql("select * from __ctas_t").collect())
    assert(e.getMessage.toLowerCase.contains("__ctas_t"))
    // a streaming query behind CTAS is rejected with a clear error
    g.sql("create schema __ctas_s (v int)")
    g.sql("create stream __ctas_live __ctas_s source host ('localhost', 19999)")
    val e2 = intercept[graft.translate.GraftAnalysisException](
      g.sql("create table __ctas_bad as select v from __ctas_live"))
    assert(e2.getMessage.contains("CREATE STREAM"))
    g.sql("drop stream __ctas_live")
    g.sql("drop schema __ctas_s")
  }
}
