package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FormattedMode

/** Regression locks for the round-4 judge/advisor findings: quantified
  * ANY/ALL must never plan a nested-loop join, FETCH WITH TIES must not
  * collapse to a single-partition window, and the advisory fixes (CTAS
  * snapshot, interval-join integer bucketing, x49 partition bound).
  */
class AdviceR5Spec extends AnyFunSuite {
  private def g = TestSpark.session

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  // --- ordered ANY/ALL lower to a broadcast summary, not a BNLJ ----------

  test("ordered ALL/ANY subqueries plan no BroadcastNestedLoopJoin") {
    val df = g.sql(
      "select r_regionkey as k from region " +
      "where r_regionkey >= all (select n_regionkey from nation where n_regionkey < 3) " +
      "and r_regionkey > any (select n_regionkey from nation where n_regionkey < 2) " +
      "and r_regionkey < all (select n_regionkey + 10 from nation)")
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3, 4))
  }

  // --- FETCH WITH TIES lowers to boundary filter, not a global window ----

  test("FETCH WITH TIES plans no WindowExec when keys resolve on output") {
    val df = g.sql("select o_custkey as ck, o_orderpriority as pr from orders " +
      "where o_custkey < 200 order by pr fetch first 10 rows with ties")
    val p = plan(df)
    assert(!p.contains("Window"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // semantics: every kept row's key <= the 10th-smallest key, all peers kept
    val rows = df.collect()
    assert(rows.length >= 10)
    val boundary = rows.map(_.getString(1)).sorted.apply(9)
    assert(rows.forall(_.getString(1) <= boundary))
  }

  test("WITH TIES boundary semantics: desc keys, multi-key, n >= rows, n = 0") {
    // desc with ties at the boundary
    val d = g.sql("select n_regionkey as r from nation " +
      "order by n_regionkey desc fetch first 7 rows with ties").collect()
    assert(d.length == 10 && d.forall(_.getAs[Number](0).longValue >= 3))
    // two keys: boundary decided lexicographically
    val m = g.sql("select n_regionkey as r, n_name as nm from nation " +
      "order by n_regionkey, n_name fetch first 6 rows with ties").collect()
    assert(m.length == 6)
    // n >= row count keeps everything
    assert(g.sql("select n_nationkey as k from nation " +
      "order by k fetch first 999 rows with ties").count() == 25)
    // n = 0 keeps nothing
    assert(g.sql("select n_nationkey as k from nation " +
      "order by k fetch first 0 rows with ties").count() == 0)
  }

  // --- unkeyed batch count window: no single global sort over the data ---

  test("unkeyed count window range-partitions; data window is per-partition") {
    val df = g.sql("select w_id, count(*) as n " +
      "from events [size 100 on event_id] group by w_id")
    val p = plan(df)
    // round 6: the numbering is stamped by zipWithIndex over one pinned
    // (persisted) range-partitioned RDD — the plan shows the pre-computed
    // scan, and must contain no global Window or single-partition sort
    assert(p.contains("ExistingRDD") || p.contains("rangepartitioning"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
    // chunk ids are contiguous 0..N-1 with exactly 100 rows each (last may
    // be short): identical to the old global row_number semantics
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = rows.map(_._2).sum
    assert(rows.map(_._1).toSeq == (0L until rows.length))
    assert(rows.init.forall(_._2 == 100L))
    assert(rows.last._2 == (if (total % 100 == 0) 100L else total % 100))
  }

  // --- CTAS is evaluate-once w.r.t. session DML on its sources -----------

  test("CTAS contents are fixed at creation; later DML cannot change them") {
    g.sql("create table ctas_src5 as select n_nationkey as k, n_name as v " +
      "from nation where n_nationkey < 3")
    g.sql("create table ctas_snap5 as select k, v from ctas_src5")
    g.sql("update ctas_src5 set v = 'XX' where k = 1")
    g.sql("delete from ctas_src5 where k = 2")
    g.sql("insert into ctas_src5 values (99, 'new')")
    val snap = g.sql("select k, v from ctas_snap5 order by k").collect()
    assert(snap.map(r => (r.getAs[Number](0).longValue, r.getString(1))).toSeq ==
      Seq((0L, "NATION_0"), (1L, "NATION_1"), (2L, "NATION_2")))
    // the source itself did change
    val src = g.sql("select k, v from ctas_src5 order by k").collect()
    assert(src.map(r => (r.getAs[Number](0).longValue, r.getString(1))).toSeq ==
      Seq((0L, "NATION_0"), (1L, "XX"), (99L, "new")))
  }

  test("json_extract_string is the named ->> form, aliasing json_extract") {
    val r = g.sql("""select json_extract_string('{"a": "x"}', '$.a') as s1, """ +
      """json_extract('{"a": "x"}', '$.a') as s2""").collect().head
    assert(r.getString(0) == "x" && r.getString(1) == "x")
  }

  test("interval-join bucketing is exact long arithmetic (no double rounding)") {
    import org.apache.spark.sql.functions._
    val spark = g.spark
    import spark.implicits._
    // epoch µs beyond 2^53: year ~2540. floor(double/width) misplaces
    // boundary rows; integral div must not.
    val base = 18014398509481984L // 2^54 µs
    val l = Seq((1L, base)).toDF("l_id", "lus")
      .select(col("l_id"), timestamp_micros(col("lus")).as("l_ts"), lit("k").as("k"))
    val r = Seq((10L, base - 1000000L), (11L, base + 1000000L))
      .toDF("r_id", "rus")
      .select(col("r_id"), timestamp_micros(col("rus")).as("r_ts"), lit("k").as("k"))
    val j = graft.operators.IntervalJoin.join(l, r, Seq("k"), "l_ts", "r_ts",
      beforeUs = 2000000L, afterUs = 2000000L)
    assert(j.select("r_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 11L))
  }

  test("= ALL and <> ANY also avoid nested-loop plans") {
    val df2 = g.sql(
      "select r_regionkey as k from region " +
      "where r_regionkey = all (select n_regionkey from nation where n_regionkey = 2) " +
      "and r_regionkey <> any (select n_regionkey from nation where n_regionkey < 2)")
    assert(!plan(df2).contains("BroadcastNestedLoopJoin"), plan(df2))
    assert(df2.collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("null-aware NOT IN plans no BroadcastNestedLoopJoin either") {
    val df = g.sql("select r_regionkey as k from region " +
      "where r_regionkey not in (select n_regionkey from nation where n_regionkey < 2) " +
      "order by k")
    assert(!plan(df).contains("BroadcastNestedLoopJoin"), plan(df))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2, 3, 4))
    // ANSI: a NULL element empties the NOT IN result entirely
    assert(g.sql("select count(*) as n from region where r_regionkey not in " +
      "(select case when n_regionkey = 2 then null else n_regionkey end from nation)")
      .collect().head.getLong(0) == 0L)
  }
}
