package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Regression specs for the round-3 advisory findings: subquery alias
  * shadowing (inner-first binding), ordered-aggregate DESC tie order,
  * named WINDOW references in ORDER BY, and the exact-recall candidate
  * source for incremental dedup. */
class AdviceR4Spec extends AnyFunSuite {
  private def g = TestSpark.session

  // --- inner FROM aliases shadow same-named enclosing aliases ------------

  test("subquery alias shadowing: inner alias binds inner-first") {
    // inner `r` (a nation-derived table) shadows outer `r` (region);
    // r.n_regionkey must bind to the INNER relation, not mark .outer()
    val rows = g.sql(
      "select r_regionkey as k, " +
      "(select count(*) from (select n_regionkey from nation) as r " +
      " where r.n_regionkey = 2) as c " +
      "from region as r order by k").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(1) == 5L))
  }

  test("shadowed inner alias coexists with a genuine outer reference") {
    // inner `r` is nation; the correlation reaches region through `o`
    val rows = g.sql(
      "select o.r_regionkey as k, " +
      "(select count(*) from nation as r " +
      " where r.n_regionkey = o.r_regionkey) as c " +
      "from region as o order by k").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(1) == 5L))
  }

  // --- ordered aggregates: DESC keeps ascending tie order ----------------

  test("string_agg ORDER BY k DESC keeps ascending value order on ties") {
    val r = g.sql(
      "select string_agg(v, ',' order by k desc) as s " +
      "from (values (1, 'b'), (1, 'a'), (2, 'c')) as t(k, v)").collect().head
    // k=2 first, then the k=1 tie in ASCENDING value order (DuckDB's
    // stable tie behavior) — NOT 'c,b,a' (a blanket reverse)
    assert(r.getString(0) == "c,a,b")
  }

  test("array_agg ORDER BY k DESC keeps ascending value order on ties") {
    val r = g.sql(
      "select array_agg(v order by k desc) as s " +
      "from (values (1, 'b'), (1, 'a'), (2, 'c')) as t(k, v)").collect().head
    assert(r.getSeq[String](0) == Seq("c", "a", "b"))
  }

  test("string_agg ORDER BY ASC unchanged") {
    val r = g.sql(
      "select string_agg(v, ',' order by k) as s " +
      "from (values (2, 'c'), (1, 'a'), (1, 'b')) as t(k, v)").collect().head
    assert(r.getString(0) == "a,b,c")
  }

  // --- named WINDOW references in ORDER BY -------------------------------

  test("OVER w in ORDER BY resolves against the WINDOW clause") {
    val rows = g.sql(
      "select n_name from nation window w as (order by n_name) " +
      "order by row_number() over w desc limit 1").collect()
    assert(rows.length == 1)
    // last name in ascending string order
    val last = g.sql("select max(n_name) as m from nation").collect().head.getString(0)
    assert(rows.head.getString(0) == last)
  }

  // --- incremental dedup: exact-recall candidate source ------------------

  test("againstCorpus exactCandidates catches borderline near-dups") {
    val s = TestSpark.spark
    import s.implicits._
    // 10-word docs; 9/11 shared words → Jaccard(3-shingles) high but the
    // texts are not identical — only the near pass can drop them
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq((0L, base), (2L, "completely different text here now"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (1L, base + " lambda"),                       // near-dup of 0
      (3L, base),                                   // exact dup of 0
      (5L, "fresh unique content nothing shared")   // fresh
    ).toDF("doc_id", "text")
    val kept = Dedup.againstCorpus(incoming, corpus, "text", "doc_id",
        threshold = 0.7, exactCandidates = true)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(5L))
    // identical answer from the default LSH banding path on this fixture
    val keptLsh = Dedup.againstCorpus(incoming, corpus, "text", "doc_id",
        threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(keptLsh.toSeq == Seq(5L))
  }
}
