package graft

import graft.parser.SqlParser
import graft.ast.Pretty
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip property: parse(print(parse(s))) == parse(s) for the whole
  * acceptance corpus (SURVEY §5 item 4 — the reference only kept expected
  * ASTs as comments). */
class RoundTripSpec extends AnyFunSuite {

  private val corpus = Seq(
    // reference corpus (SURVEY §5, adapted)
    "select * from stream [size 3 min on time every 1 partitioned on time]",
    "select id from stream [size 3] as s1 left join suoi [size 3] as s2 on s1.time = s2.thoigian",
    "select count(id) as i, 1 + 3 * 2 as num from stream group by item having item > 3",
    "select id + 3 from stream as s where id = 2 or (speed > 3 and time = 1)",
    "select id from (select p.id from oldStream as p) as q",
    "create stream myStream (time long) as (select p.id from oldStream as p)",
    "create schema name1 (a boolean) extends parents",
    "select (age + p.hight) * 2 from person p where age > 3 and hight < 1 or weight = 2",
    "select p.age, j.type from person p join job j on p.job = j.id",
    // our gate queries' shapes
    "select distinct l_returnflag as f from lineitem order by f",
    "select a from t union all select b from u order by a limit 3",
    "select x from t except select y from u",
    "select c from t where c in (1, 2, 3) and d not between 1 and 2 and e like 'x%' and f is not null",
    "select c from t where exists (select 1 from u where u.k = t.k) and c not in (select k from v)",
    "select case when a > 1 then 'x' else 'y' end as c, count(distinct b) as n from t group by c with rollup",
    "select a from t where b > ? order by a limit ? offset ?",
    "select a from t order by a desc, b limit 10 offset 5",
    "insert into sink (a, b) values (1, 'x'), (2, 'y')",
    "insert into sink select a, b from t where c > 0",
    "insert into sink [size 1 h on ts] select ts, v from events",
    "update t set a = 1, b = 'x' where c > 0",
    "delete from t where a = 1",
    "create stream s (id long, v double) source host('localhost', 9999)",
    "create stream s (id long, v double) source file('/tmp/x.csv')",
    "select w_start, count(*) as n from events [session 30 min on ts partitioned on event_type] group by w_start",
    "select sum(a) as s from t1 join t2 using (k1, k2) cross join t3 where not (a = 1)",
    "select -a as na, ~b as nb, a & b as ab, a | b as ob, a ^ b as xb, a << 2 as sl, a >> 1 as sr from t",
    "select (select max(x) from u) as mx from t",
    "select w_start from s [size 1 h on ts watermark 10 min partitioned on k] group by w_start",
    "explain select a from t where b > 1",
    // round-2 extensions: CTEs, QUALIFY, GROUPING SETS, MERGE
    "with x as (select 1 as a), y as (select a from x) select a from y",
    "with x as (select a from t) select a from x union select b from u order by a",
    "select a, b from t qualify (row_number() over (partition by a order by b) <= 2)",
    "select a, count(*) as n from t group by grouping sets ((a, b), (b), ()) having (count(*) > 1)",
    "merge into t as x using s on (x.k = s.k) when matched and (s.v < 0) then delete " +
      "when matched then update set v = (s.v + 1), w = 2 " +
      "when not matched then insert (k, v) values (s.k, 0)",
    "merge into t using (select k from u) as s on (t.k = s.k) when not matched then insert values (s.k)",
    "select cast(a as long) as al, cast(b as array<double>) as bd, cast((a + 1) as string) as s from t",
    "select (a || b) as ab, case x when 1 then 'a' when 2 then 'b' else 'c' end as c from t",
    "select a from t order by a desc nulls last, b nulls first",
    "select a, count(*) as n from t group by 1 order by 2 desc",
    // VALUES relation, sample clause, unnest generator
    "select a, b from (values (1, 'x'), (2, 'y')) as t(a, b) order by a",
    "select n from (values (1), (2)) as v join t on t.k = v.col1",
    "select a from t sample (10 percent) seed 42 where a > 1",
    "select doc_id, unnest(split(text, ' ')) as tok from documents",
    // explicit window frames
    "select sum(v) over (partition by k order by t rows between 2 preceding and current row) as r from t",
    "select max(v) over (order by t rows between current row and unbounded following) as m from t",
    "select count(*) over (order by t range between 10 preceding and 5 following) as n from t",
    "select last_value(v) over (partition by k order by t rows between unbounded preceding and unbounded following) as l from t",
    "select a, count(*) as n from t group by all having (count(*) > 1)",
    // interval / typed literals
    "select (ts + interval 1 day) as nd, (ts - interval 30 minute) as e from events",
    "select (ts + interval 2 year) as y, cast('2024-01-01 00:00:00' as timestamp) as t0, cast('2024-03-01' as date) as d0 from events",
    // round-3 dialect: DISTINCT ON, star modifiers, filtering/natural
    // joins, TRY_CAST, IGNORE NULLS, WITHIN GROUP, array literals
    "select distinct on (k) k, v from t order by k, v desc",
    "select * exclude (a, b) replace ((v + 1) as v) from t",
    "select t.* exclude (a) from t",
    "select a from t semi join u on (t.k = u.k)",
    "select a from t anti join u using (k)",
    "select a from t natural join u",
    "select a from t natural left join u",
    "select try_cast(a as int) as b, cast(a as long) as c from t",
    "select last_value(v) ignore nulls over (order by t2) as l from t",
    "select lag(v, 1) ignore nulls over (partition by k order by t2) as p from t",
    "select percentile_cont(0.5) within group (order by v) as med from t",
    "select string_agg(v, '|') within group (order by v desc) as s2 from t group by k",
    "select element_at(array(1, 2), cast(2 as int)) as x, array('a', 'b') as ar from t",
    // LATERAL + expression-position EXISTS
    "select a from t join lateral (select b from u where (u.k = t.k) order by b desc limit 2) as s2 on true",
    "select a from t left join lateral (select max(b) as m from u where (u.k = t.k)) as s2",
    "select a from t cross join lateral (select b from u where (u.k = t.k)) as s2",
    "select (exists (select 1 from u where (u.k = t.k))) as f from t",
    "select a from lateral (select 1 as a) as s2",
    // table functions in FROM
    "select range as k from range(1, 6) as r",
    "select generate_series as g from generate_series(0, 20, 5)",
    "select r.range as k from range(3) as r join t on (t.k = r.range)",
    // lambda higher-order functions
    "select transform(a, x -> (x + 1)) as t2 from t",
    "select aggregate(a, cast(0 as long), (acc, x) -> (acc + x)) as s2 from t",
    "select filter(a, x -> (x > 2)) as f from t",
    "select a from t order by a fetch first 3 rows with ties",
    // UNION BY NAME + interval RANGE frames (round 4)
    "select a from t union all by name select b from u",
    "select a from t union by name select b from u",
    "select sum(a) over (partition by k order by ts " +
      "range between interval 2 hour preceding and current row) as s2 from t",
    "select count(a) over (order by ts " +
      "range between interval 90 second preceding and interval 1 day following) as c from t"
  )

  test("parse . print . parse == parse over the corpus") {
    corpus.foreach { sql =>
      SqlParser.parse(sql) match {
        case Left(err) => fail(s"corpus string does not parse: $sql — $err")
        case Right(ast1) =>
          val printed = Pretty.print(ast1)
          SqlParser.parse(printed) match {
            case Left(err) =>
              fail(s"printed form does not parse.\n  in:  $sql\n  out: $printed\n  err: $err")
            case Right(ast2) =>
              assert(ast2 == ast1, s"round-trip changed the AST.\n  in:  $sql\n  out: $printed")
          }
      }
    }
  }
}
