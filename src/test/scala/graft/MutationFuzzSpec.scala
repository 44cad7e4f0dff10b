package graft

import org.scalatest.funsuite.AnyFunSuite

/** Negative fuzz: randomly mutilated dialect statements must fail CLEANLY
  * (a parse/analysis exception with a message) — never a MatchError, NPE,
  * ClassCastException, StackOverflowError or other crash class that would
  * indicate an unhandled path in the parser/translator. Seeded, so any
  * failure reproduces. */
class MutationFuzzSpec extends AnyFunSuite {

  private lazy val g = TestSpark.session

  private val bases = Seq(
    "select l_returnflag as f, sum(l_quantity) as q from lineitem group by l_returnflag having count(*) > 2 order by f",
    "select o.o_orderkey as k, count(*) as n from orders o join lineitem l on l.l_orderkey = o.o_orderkey where o.o_custkey % 3 = 1 group by o.o_orderkey order by k limit 10",
    "select n_name from nation where n_regionkey in (select r_regionkey from region where r_name like 'A%') order by n_name",
    "select event_type as et, count(*) as n from events [size 10 min on ts] group by w_start, event_type order by et",
    "select l_orderkey as k, rank() over (partition by l_returnflag order by l_orderkey) as r from lineitem qualify r <= 3 order by k, r",
    "with t as (select l_orderkey as k from lineitem where l_linenumber = 1) select k from t except select o_orderkey as k from orders intersect select o_orderkey as k from orders where o_custkey < 50 order by k",
    "select r_name as a, count(*) as n from region group by rollup (r_name) order by a nulls first",
    "select case when l_quantity > 25 then 'hi' else 'lo' end as b, avg(l_extendedprice) as p from lineitem group by b order by b",
    "insert into scratch_mut values (1, 'x')",
    "select * from (select n_nationkey as k, n_name from nation) t where t.k between 2 and 9 order by t.k",
    "select l_orderkey as k from lineitem where exists (select 1 from orders o where o.o_orderkey = lineitem.l_orderkey) order by k limit 5",
    "select string_agg(n_name, ',' order by n_name) as names from nation where n_regionkey = 0",
    // round-8 surface: FILTER aggregates, GROUP/ORDER BY ALL, VALUES
    // relations, EXTRACT, table functions, scalar registry fns
    "select l_returnflag as f, count(*) filter (where l_quantity > 10) as cf, sum(l_linenumber) as sl from lineitem group by all order by all",
    "select v.tag as tag, count(*) as n from (values (1, 'A'), (2, 'N')) as v(tag, f) join lineitem on l_returnflag = v.f group by v.tag order by tag",
    "select event_id as k, extract(hour from ts) as h from events where extract(month from ts) = 1 order by k limit 20",
    "select id, keep from gopher_flags(documents) where n_words > 10 order by id limit 5",
    "select doc_id, normalize_text(text) as t from documents where redact_pii(text) <> text order by doc_id limit 5",
    // round-9 surface: BPE table functions (pair stats, apply-mode and
    // train-mode tokenize)
    "select pair, n from bpe_pairs(documents, 5) order by n desc, pair",
    "select id, n_tokens from bpe_tokenize(documents, 'e r,i n') where n_words > 20 order by id limit 5",
    "select sum(n_tokens) as t from bpe_tokenize(documents, 3)",
    // round-9 late surface: hard negatives, index serving, leakage split
    "select qid, vec_id, cos from hard_negatives(embeddings, embeddings, 3, 0.98, 0.0) where qid < 5 order by qid, cos desc, vec_id",
    "select split, count(*) as n from leakage_safe_split(documents, 10) group by split order by split",
    "select * from ann_topk(embeddings, '/no/such/index', 5)",
    // round-10 surface: model artifacts, capped BPE train, grouped
    // quantiles table function
    "create model mm kind 'bpe' at '/no/such/merges.txt'",
    "drop model if exists mm",
    "show models",
    "select id, n_tokens from bpe_tokenize(documents, 4, 12) where id % 2 = 0 order by id limit 5",
    "select source, round(q, 6) as v, n from grouped_quantiles(documents, 'source', 'n_chars', 0.75) order by source",
    // round-10 late surface: token-id streams, PQ serve
    "select id, wpos, tpos, token_id from bpe_encode(documents, 'e r,i n', 12) where id < 3 order by id, wpos, tpos",
    "select * from pq_topk(embeddings, '/no/such/pq', 5, 50)",
    "create model pp kind 'pq' at '/no/such/layout'",
    // round-11 surface: composed IVF-PQ serving + fourth model kind
    "select * from ivfpq_topk(embeddings, '/no/such/ivfpq', 5, 4, 50)",
    "create model qq kind 'ivfpq' at '/no/such/layout'")

  private val crashClasses: Set[Class[_]] = Set(
    classOf[MatchError], classOf[NullPointerException],
    classOf[ClassCastException], classOf[scala.NotImplementedError],
    classOf[ArrayIndexOutOfBoundsException],
    classOf[StringIndexOutOfBoundsException])

  test("500 seeded mutants of valid statements fail cleanly or run — never crash") {
    g.sql("create stream scratch_mut (a int, b string)")
    val rnd = new scala.util.Random(8808L)
    var ran = 0
    val crashes = scala.collection.mutable.Buffer.empty[String]
    for (_ <- 0 until 500) {
      val base = bases(rnd.nextInt(bases.length))
      val words = base.split(" ").toBuffer
      val mutant = rnd.nextInt(7) match {
        case 0 => base.substring(0, 1 + rnd.nextInt(base.length - 1))
        case 1 => { words.remove(rnd.nextInt(words.length)); words.mkString(" ") }
        case 2 => { val i = rnd.nextInt(words.length); words.insert(i, words(i)); words.mkString(" ") }
        case 3 => { val i = rnd.nextInt(words.length - 1)
          val t = words(i); words(i) = words(i + 1); words(i + 1) = t; words.mkString(" ") }
        case 4 => { words(rnd.nextInt(words.length)) = "zz9q"; words.mkString(" ") }
        case 5 => { val i = rnd.nextInt(base.length)
          base.substring(0, i) + base.substring(math.min(i + 1, base.length)) }
        case _ => { val i = rnd.nextInt(base.length)
          base.substring(0, i) + (if (rnd.nextBoolean()) "(" else ")") + base.substring(i) }
      }
      ran += 1
      try { g.sql(mutant); () }
      catch {
        case t: Throwable if crashClasses.contains(t.getClass) =>
          crashes += s"${t.getClass.getSimpleName}: ${mutant.take(160)}"
        case t: StackOverflowError =>
          crashes += s"StackOverflow: ${mutant.take(160)}"
        case t: Throwable =>
          // clean failure: must carry a message (what a user would see)
          if (t.getMessage == null || t.getMessage.isEmpty)
            crashes += s"empty-message ${t.getClass.getSimpleName}: ${mutant.take(160)}"
      }
    }
    assert(ran == 500)
    assert(crashes.isEmpty,
      s"${crashes.length} unclean failures:\n  " + crashes.take(10).mkString("\n  "))
  }
}
