package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FormattedMode
import graft.translate.GraftAnalysisException

/** Regression locks for the round-5 judge/advisor findings: FETCH WITH
  * TIES must use the boundary-value lowering (no single-partition
  * WindowExec) for EVERY key shape — including keys naming non-projected
  * input columns, expression keys, and star projections — and row-count
  * literals past Int.MaxValue must fail loudly instead of wrapping.
  */
class AdviceR6Spec extends AnyFunSuite {
  private def g = TestSpark.session

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  // --- WITH TIES: non-projected sort keys take the boundary path too ----

  test("WITH TIES with a non-projected sort key plans no WindowExec") {
    // o_totalprice is not in the projection — round 5 fell back to a
    // global rank() window here; round 6 carries it as a hidden column
    val df = g.sql("select o_orderkey as k from orders " +
      "order by o_totalprice fetch first 10 rows with ties")
    val p = plan(df)
    assert(!p.contains("Window"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    val rows = df.collect()
    assert(rows.length >= 10)
    // hidden sort column must not leak into the output schema
    assert(df.columns.toSeq == Seq("k"))
    // semantics: the kept keys are exactly the 10 smallest prices (+ties)
    val prices = g.sql("select o_orderkey as k, o_totalprice as p from orders")
      .collect().map(r => r.getAs[Number](0).longValue -> r.getDouble(1)).toMap
    val boundary = prices.values.toSeq.sorted.apply(9)
    val kept = rows.map(_.getAs[Number](0).longValue).toSet
    assert(kept == prices.filter(_._2 <= boundary).keySet)
  }

  test("WITH TIES with an expression key and a star projection") {
    // expression key over a non-projected column, star output
    val df = g.sql("select * from nation " +
      "order by n_regionkey % 3 desc fetch first 5 rows with ties")
    val p = plan(df)
    assert(!p.contains("Window"), p)
    val rows = df.collect()
    assert(df.columns.forall(!_.startsWith("__fth")))
    val mods = g.sql("select n_regionkey % 3 as m from nation")
      .collect().map(_.getAs[Number](0).longValue).sorted(Ordering.Long.reverse)
    val boundary = mods(4)
    assert(rows.length == mods.count(_ >= boundary))
  }

  test("WITH TIES key matching a projection expression reuses the output") {
    // sum(l_quantity) appears both as projection and sort key: the key is
    // rewritten to the output alias, not recomputed
    val df = g.sql("select l_returnflag as f, sum(l_quantity) as q " +
      "from lineitem group by l_returnflag " +
      "order by sum(l_quantity) desc fetch first 1 rows with ties")
    assert(!plan(df).contains("Window"), plan(df))
    val rows = df.collect()
    assert(rows.nonEmpty && df.columns.toSeq == Seq("f", "q"))
  }

  test("WITH TIES with a qualified non-projected key") {
    val df = g.sql("select n.n_name as nm from nation n " +
      "order by n.n_regionkey fetch first 5 rows with ties")
    assert(!plan(df).contains("Window"), plan(df))
    assert(df.columns.toSeq == Seq("nm"))
    assert(df.count() == 5)
  }

  test("WITH TIES: aggregate sort key becomes a hidden aggregate column") {
    // ORDER BY an aggregate NOT in the projection — computed as hidden agg
    val df = g.sql("select l_returnflag as f from lineitem group by l_returnflag " +
      "order by sum(l_quantity) desc fetch first 1 rows with ties")
    assert(!plan(df).contains("Window"), plan(df))
    assert(df.columns.toSeq == Seq("f") && df.count() >= 1)
  }

  test("WITH TIES + GROUP BY ALL rejects non-projected non-aggregate keys") {
    // a hidden non-aggregate projection would silently change the inferred
    // grouping keys — must be a loud error, not finer groups
    val e = intercept[GraftAnalysisException](
      g.sql("select l_returnflag as f, count(*) as n from lineitem " +
        "group by all order by l_linestatus fetch first 2 rows with ties").collect())
    assert(e.getMessage.contains("GROUP BY ALL"))
    // aggregate keys remain fine under GROUP BY ALL
    val ok = g.sql("select l_returnflag as f, count(*) as n from lineitem " +
      "group by all order by sum(l_quantity) desc fetch first 1 rows with ties")
    assert(ok.count() >= 1)
  }

  test("user columns named __fth* survive in non-ties queries") {
    // the hidden-column trim must only fire on WITH TIES selects with
    // desugar-shaped aliases, never on user columns sharing the prefix
    val df = g.sql("select n_name as __fth0, n_nationkey as k from nation " +
      "order by k limit 3")
    assert(df.columns.toSeq == Seq("__fth0", "k"))
    assert(df.count() == 3)
  }

  test("user __fth0 alias survives INSIDE a WITH TIES query too") {
    // second review pass: the trim drops exactly the names the desugar
    // generated; a colliding user alias forces a fresh hidden name
    val df = g.sql("select n_name as __fth0 from nation " +
      "order by n_regionkey fetch first 5 rows with ties")
    assert(df.columns.toSeq == Seq("__fth0"), df.columns.mkString(","))
    assert(df.count() >= 5)
    // and when the user alias IS the sort key, nothing is dropped at all
    val df2 = g.sql("select n_name as __fth0 from nation " +
      "order by __fth0 fetch first 3 rows with ties")
    assert(df2.columns.toSeq == Seq("__fth0"))
    assert(df2.count() == 3)
  }

  // --- limit/offset literals past Int.MaxValue fail loudly ---------------

  test("LIMIT / FETCH WITH TIES row counts past Int.MaxValue raise") {
    val big = (Int.MaxValue.toLong + 1).toString
    val e1 = intercept[GraftAnalysisException](
      g.sql(s"select n_name as nm from nation limit $big").collect())
    assert(e1.getMessage.contains("out of range"))
    val e2 = intercept[GraftAnalysisException](
      g.sql("select n_name as nm from nation " +
        s"order by nm fetch first $big rows with ties").collect())
    assert(e2.getMessage.contains("out of range"))
    // Int.MaxValue itself is accepted
    assert(g.sql(s"select n_name as nm from nation limit ${Int.MaxValue}")
      .count() == 25)
  }
}
