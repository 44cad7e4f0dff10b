package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regressions for the round-8 advisory findings (ADVICE.md, round 9). */
class AdviceR9Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("grand-total row appears on empty input even when the projection has NO real aggregate") {
    val g = GraftSession.forDir(spark, TestSpark.sf)
    // advisory: a pure grouping()/grouping_id() projection over the ()
    // grouping set used to stay a plain Project over the empty relation
    // (0 rows) instead of the ANSI 1-row global aggregate
    val r = g.sql(
      "select cast(grouping(l_returnflag) as bigint) as ga from lineitem " +
        "where l_suppkey > 999999999 group by rollup (l_returnflag)").collect()
    assert(r.length == 1 && r.head.getLong(0) == 1L)
    val r2 = g.sql(
      "select cast(grouping_id(l_returnflag, l_linestatus) as bigint) as gid " +
        "from lineitem where l_suppkey > 999999999 " +
        "group by cube (l_returnflag, l_linestatus)").collect()
    assert(r2.length == 1 && r2.head.getLong(0) == 3L)
    // non-empty input unchanged: rollup of 3 flags → 3 detail + 1 grand
    val full = g.sql(
      "select cast(grouping(l_returnflag) as bigint) as ga from lineitem " +
        "group by rollup (l_returnflag) order by ga").collect()
    assert(full.map(_.getLong(0)).toSeq.sorted.reverse.head == 1L &&
      full.count(_.getLong(0) == 1L) == 1)
  }

  test("exact quantile index is decimal-exact: q=0.29 over 101 values selects rank 30, not 29") {
    import spark.implicits._
    val df = (0L to 100L).toDF("v")
    // (n−1)·q = 100·0.29 = 29 exactly in decimal; double arithmetic gives
    // 28.999999999999996 and used to floor one rank low (value 28)
    assert(graft.operators.Quantiles.exactQuantileLong(df, "v", 0.29) == 29L)
    val dd = (0L to 100L).map(_.toDouble).toDF("v")
    assert(graft.operators.Quantiles.exactQuantileDouble(dd, "v", 0.29) == 29.0)
  }

  test("writeShards audit reflects the write it audited, not later overwrites of the dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("advice_shards_").toString
    try {
      val a = (1L to 100L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
      val statsA = graft.operators.Curation.writeShards(a, "doc_id", dir, 4)
      val totalA = statsA.agg(sum("n_rows")).head().getLong(0)
      assert(totalA == 100L)
      // overwrite the same directory with a SMALLER corpus: the earlier
      // audit frame must still report the write it measured (advisory:
      // it was a lazy frame over the directory and silently changed)
      val b = (1L to 7L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
      graft.operators.Curation.writeShards(b, "doc_id", dir, 4)
      assert(statsA.agg(sum("n_rows")).head().getLong(0) == 100L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("dsir table functions raise a dialect error naming the `source` convention eagerly") {
    val g = GraftSession.forDir(spark, TestSpark.sf)
    // lineitem has no `source` column — the failure must be a
    // GraftAnalysisException stating the corpus convention, not a raw
    // Spark unresolved-column error at action time
    val e1 = intercept[graft.translate.GraftAnalysisException](
      g.sql("select * from dsir_scores(lineitem, 'src0')"))
    assert(e1.getMessage.contains("source") && e1.getMessage.contains("dsir_scores"))
    val e2 = intercept[graft.translate.GraftAnalysisException](
      g.sql("select * from dsir_resample(lineitem, 'src0', 0.5)"))
    assert(e2.getMessage.contains("source"))
    val e3 = intercept[graft.translate.GraftAnalysisException](
      g.sql("select * from distinct_audit(lineitem)"))
    assert(e3.getMessage.contains("source"))
    // the happy path still works (documents has the column)
    assert(g.sql("select * from dsir_scores(documents, 'src0')").columns.contains("score"))
  }
}
