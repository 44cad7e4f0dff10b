package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Round-8 advisory regressions: (1) graft's OWN session-window boundary
  * semantics at the exact-gap edge, keyed AND unkeyed (ADVICE r7: the old
  * ScratchGapSpec only probed Spark's native session_window); (2) the
  * unkeyed batch session window actually executes — its task closures used
  * to capture the non-serializable Translator (`NotSerializableException`
  * at submit) and no test covered the path; (3) TIMESTAMP_NTZ parquet
  * inputs work end-to-end: catalog normalization plus the defensive casts
  * in IntervalJoin / RANGE-INTERVAL frames (Spark 4 reads
  * isAdjustedToUTC=false parquet timestamps as NTZ — the engine must not
  * depend on how a writer encoded its timestamps). */
class AdviceR8Spec extends AnyFunSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def freshSession(): GraftSession = new GraftSession(TestSpark.spark)

  test("session window, keyed dialect path: exact-gap rows share a session; over-gap splits") {
    val spark = TestSpark.spark
    import spark.implicits._
    val g = freshSession()
    // k=a: 00:00, 01:00 (exactly the 60-min gap → ONE session, matching
    // Spark's native session_window merge-at-exact-gap), then 02:00:01
    // (1 s past the gap → NEW session). k=b: a lone row.
    g.catalog.registerTable("sess_k", Seq(
      ("a", ts("2024-01-01 00:00:00")),
      ("a", ts("2024-01-01 01:00:00")),
      ("a", ts("2024-01-01 02:00:01")),
      ("b", ts("2024-01-01 05:00:00"))
    ).toDF("k", "ts"))
    val out = g.sql(
      "select w_start, w_end, k, count(*) as n from sess_k " +
        "[session 60 min on ts partitioned on k] group by w_start, w_end, k " +
        "order by k, w_start")
      .collect().map(r => (r.getString(2), r.getTimestamp(0), r.getTimestamp(1), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00"), 2L),
      ("a", ts("2024-01-01 02:00:01"), ts("2024-01-01 03:00:01"), 1L),
      ("b", ts("2024-01-01 05:00:00"), ts("2024-01-01 06:00:00"), 1L)))
  }

  test("session window, UNKEYED dialect path: executes (serializable closures) and matches keyed semantics") {
    val spark = TestSpark.spark
    import spark.implicits._
    val g = freshSession()
    // 500 rows in randomized input order across 4 partitions — sessions of
    // 5 rows spaced 10 min, separated by 2 h; plus an exact-gap pair and
    // two null timestamps (each a singleton session, like the keyed path)
    val times = (0 until 33).flatMap { s =>
      val base = s.toLong * 7200L
      (0 until 5).map(i => base + i * 600L)
    } // 33 sessions x 5 rows, 10-min spacing, 60-min gap never exceeded inside
    val rows = scala.util.Random.shuffle(
      times.map(t => Tuple1(new java.sql.Timestamp(1704067200000L + t * 1000L))) ++
        Seq(Tuple1(null.asInstanceOf[java.sql.Timestamp]),
          Tuple1(null.asInstanceOf[java.sql.Timestamp])))
    g.catalog.registerTable("sess_u", rows.toDF("ts").repartition(4))
    val unkeyed = g.sql(
      "select w_start, w_end, count(*) as n from sess_u " +
        "[session 60 min on ts] group by w_start, w_end order by w_start")
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSeq
    // keyed path over the same rows with a constant key = ground truth
    g.catalog.registerTable("sess_u2",
      rows.toDF("ts").repartition(4).withColumn("k", lit(1)))
    val keyed = g.sql(
      "select w_start, w_end, count(*) as n from sess_u2 " +
        "[session 60 min on ts partitioned on k] group by w_start, w_end " +
        "order by w_start")
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSeq
    assert(unkeyed == keyed)
    // the two null-time rows are singleton sessions with (null, null)
    // bounds, which the GROUP BY collapses into one output row of n=2 —
    // identical in both paths
    assert(unkeyed.count(_._1 == null) == 1)
    assert(unkeyed.filter(_._1 == null).head._3 == 2L)
    assert(unkeyed.count(_._1 != null) == 33)     // 33 real sessions
    assert(unkeyed.filter(_._1 != null).forall(_._3 == 5L))
    g.releaseOperatorCaches()
  }

  test("session window, unkeyed: exact-gap rows straddling partitions merge into one session") {
    val spark = TestSpark.spark
    import spark.implicits._
    val g = freshSession()
    // 8 rows spaced EXACTLY one gap apart, forced through 4 partitions:
    // the boundary-merge must chain them all into a single session
    val rows = (0 until 8).map(i => Tuple1(new java.sql.Timestamp(1704067200000L + i * 3600000L)))
    g.catalog.registerTable("sess_chain", rows.toDF("ts").repartition(4))
    val out = g.sql(
      "select w_start, w_end, count(*) as n from sess_chain " +
        "[session 60 min on ts] group by w_start, w_end")
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
    assert(out.length == 1)
    assert(out.head == ((new java.sql.Timestamp(1704067200000L),
      new java.sql.Timestamp(1704067200000L + 8L * 3600000L), 8L)))
    g.releaseOperatorCaches()
  }

  test("GROUP BY projection alias (DuckDB ergonomics); input columns shadow aliases") {
    val spark = TestSpark.spark
    import spark.implicits._
    val g = GraftSession.forDir(spark, TestSpark.sf)
    val byAlias = g.sql(
      "select l_returnflag as flag, cast(count(*) as bigint) as n " +
        "from lineitem group by flag order by flag").collect()
    val byExpr = g.sql(
      "select l_returnflag as flag, cast(count(*) as bigint) as n " +
        "from lineitem group by l_returnflag order by flag").collect()
    assert(byAlias.toSeq == byExpr.toSeq && byAlias.nonEmpty)
    // computed alias
    val comp = g.sql(
      "select l_linenumber % 2 as par, cast(count(*) as bigint) as n " +
        "from lineitem group by par order by par").collect()
    assert(comp.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    // an input column named like the alias SHADOWS the alias (both engines)
    val g2 = freshSession()
    g2.catalog.registerTable("shadow_t",
      Seq((1, "x"), (1, "y"), (2, "z")).toDF("a", "b"))
    val sh = g2.sql(
      "select a + 10 as a, cast(count(*) as bigint) as n from shadow_t " +
        "group by a order by a").collect()
    assert(sh.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((11L, 2L), (12L, 1L)))
    // aliasing an aggregate cannot be a group key
    val err = intercept[Exception](g.sql(
      "select count(*) as n from lineitem group by n").collect())
    assert(err.getMessage.contains("aggregate"))
  }

  test("ROLLUP/CUBE on empty input emit the ANSI grand-total row (count=0, keys/sums NULL)") {
    val spark = TestSpark.spark
    val g = GraftSession.forDir(spark, TestSpark.sf)
    // empty after filtering: ANSI GROUP BY ROLLUP(a,b) still has the ()
    // grouping set, which behaves as global aggregation → ONE row
    val r = g.sql(
      "select l_returnflag as a, cast(count(*) as bigint) as n, " +
        "cast(sum(l_orderkey) as bigint) as sm from lineitem " +
        "where l_suppkey > 999999999 group by rollup (l_returnflag)")
      .collect()
    assert(r.length == 1 && r.head.isNullAt(0) && r.head.getLong(1) == 0L && r.head.isNullAt(2))
    val c = g.sql(
      "select l_returnflag as a, l_linestatus as b, cast(count(*) as bigint) as n " +
        "from lineitem where l_suppkey > 999999999 group by cube (l_returnflag, l_linestatus)")
      .collect()
    assert(c.length == 1 && c.head.getLong(2) == 0L)
    // HAVING filters the grand row like any other (count=0 fails > 0)
    val h = g.sql(
      "select l_returnflag as a, cast(count(*) as bigint) as n from lineitem " +
        "where l_suppkey > 999999999 group by rollup (l_returnflag) having count(*) > 0")
      .collect()
    assert(h.isEmpty)
    // GROUPING SETS without the empty set: still zero rows on empty input
    val gs = g.sql(
      "select l_returnflag as a, cast(count(*) as bigint) as n from lineitem " +
        "where l_suppkey > 999999999 group by grouping sets ((l_returnflag))")
      .collect()
    assert(gs.isEmpty)
    // grouping()/grouping_id() are CONSTANTS on the grand row (1 /
    // all-ones) — projected AND in HAVING (fuzz f078, seed 9303)
    val gf = g.sql(
      "select l_returnflag as a, l_linestatus as b, " +
        "cast(grouping(l_returnflag) as bigint) as ga, " +
        "cast(grouping(l_linestatus) as bigint) as gb, " +
        "cast(grouping_id(l_returnflag, l_linestatus) as bigint) as gid, " +
        "cast(count(*) as bigint) as n from lineitem " +
        "where l_suppkey > 999999999 group by rollup (l_returnflag, l_linestatus) " +
        "having grouping(l_linestatus) = 1")
      .collect()
    assert(gf.length == 1 && gf.head.isNullAt(0) && gf.head.isNullAt(1) &&
      gf.head.getLong(2) == 1L && gf.head.getLong(3) == 1L &&
      gf.head.getLong(4) == 3L && gf.head.getLong(5) == 0L)
    // ...and HAVING grouping(...) = 0 drops the synthetic row
    val gf0 = g.sql(
      "select l_returnflag as a, cast(count(*) as bigint) as n from lineitem " +
        "where l_suppkey > 999999999 group by rollup (l_returnflag) " +
        "having grouping(l_returnflag) = 0")
      .collect()
    assert(gf0.isEmpty)
    // non-empty input: unchanged totals (grand row not duplicated)
    val full = g.sql(
      "select l_returnflag as a, cast(count(*) as bigint) as n from lineitem " +
        "group by rollup (l_returnflag) order by a nulls first").collect()
    assert(full.count(_.isNullAt(0)) == 1)
  }

  test("session window, STREAMING path: exact-gap rows merge (parity with the batch dialect)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // exactly-gap pair for key a (must merge: ONE session), 1 s past the
    // gap for key b (must split: TWO sessions) — the boundary the batch
    // dialect pins; a Spark behavior change here would silently diverge
    // stream from batch
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)](spark)
    val sess = graft.streaming.Sessions.aggregate(
      in.toDF().toDF("ts", "k"), "ts", "3600 seconds", Seq("k"),
      (count(lit(1)).as("n"), Nil))
    val sink = "advr8_gap_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = sess.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try {
      in.addData(
        (ts("2024-01-01 00:00:00"), "a"), (ts("2024-01-01 01:00:00"), "a"),
        (ts("2024-01-01 00:00:00"), "b"), (ts("2024-01-01 01:00:01"), "b"))
      q.processAllAvailable()
      val byKey = spark.table(sink).groupBy("k")
        .agg(count(lit(1)).as("sessions"), sum("n").as("rows"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(byKey("a") == ((1L, 2L)), s"exact-gap must merge, got ${byKey("a")}")
      assert(byKey("b") == ((2L, 2L)), s"over-gap must split, got ${byKey("b")}")
    } finally q.stop()
  }

  test("TIMESTAMP_NTZ inputs: scan-level + catalog normalization; interval join, RANGE frame, session window all run") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toFile
    dir.deleteOnExit()
    val p = new java.io.File(dir, "ntz_events.parquet").getPath
    def ntzDf = Seq(
      (1L, "a", ts("2024-03-01 10:00:00")),
      (2L, "a", ts("2024-03-01 10:20:00")),
      (3L, "a", ts("2024-03-01 12:00:00")),
      (4L, "b", ts("2024-03-01 10:10:00")),
      (5L, "b", ts("2024-03-01 23:00:00"))
    ).toDF("id", "k", "ts")
      .withColumn("ts", col("ts").cast(TimestampNTZType))
    // an NTZ-typed writer produces isAdjustedToUTC=false (naive) parquet —
    // the pandas/pyarrow default encoding the driver data uses
    ntzDf.write.mode("overwrite").parquet(p)

    val g = freshSession()
    // layer 1 — READER: with inferTimestampNTZ disabled (GraftSession
    // init), naive parquet from a NON-Spark writer (the driver's
    // pandas-written testdata; Spark-written files carry their own schema
    // metadata, which wins over inference) reads as TIMESTAMP at the scan
    // itself, so time-range predicates still reach PushedFilters (a
    // cast-wrapped column would hide them from the parquet reader — the
    // partition-prune path at scale).
    val driverEvents = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    val tsType = driverEvents.schema("ts").dataType
    // TIMESTAMP whether the driver wrote naive (conf applies) or
    // UTC-adjusted micros; only NANOS (long under nanosAsLong) is exempt
    if (tsType != LongType) {
      assert(tsType == TimestampType, s"driver ts read as $tsType")
      val filtered = driverEvents.where(col("ts") >= lit(ts("2024-03-01 11:00:00")))
      assert(filtered.queryExecution.executedPlan.toString.contains("GreaterThanOrEqual(ts"),
        "timestamp predicate must push down to the parquet scan")
    }
    // Spark-written NTZ parquet keeps its NTZ schema (embedded metadata) —
    // the catalog boundary is what normalizes it
    g.catalog.registerTable("ntz_events", spark.read.parquet(p))
    // layer 2 — CATALOG: a pre-built NTZ DataFrame registered directly
    // (bypassing the reader conf) is normalized to TIMESTAMP at relation()
    val g2 = freshSession()
    g2.catalog.registerTable("ntz_mem", ntzDf)
    assert(ntzDf.schema("ts").dataType == TimestampNTZType)
    assert(g2.catalog.relation("ntz_mem").schema("ts").dataType == TimestampType)
    val rel = g.catalog.relation("ntz_events")
    assert(rel.schema("ts").dataType == TimestampType)
    assert(rel.orderBy("id").collect().map(_.getTimestamp(2)).head == ts("2024-03-01 10:00:00"))
    // 2) RANGE INTERVAL frame over the dialect
    val rf = g.sql(
      "select id, count(*) over (partition by k order by ts " +
        "range between interval 30 minute preceding and current row) as c " +
        "from ntz_events order by id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rf == Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
    // 3) session window (keyed + unkeyed) over NTZ input
    val sess = g.sql(
      "select k, count(*) as n from ntz_events " +
        "[session 30 min on ts partitioned on k] group by w_start, w_end, k " +
        "order by k, n desc")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sess == Seq(("a", 2L), ("a", 1L), ("b", 1L), ("b", 1L)))
    // 4) the operator API on a RAW NTZ DataFrame (bypassing both the
    //    reader conf and the catalog) — IntervalJoin's defensive casts
    //    must carry it
    val raw = ntzDf
    val l = raw.select(col("id").as("l_id"), col("k"), col("ts").as("l_ts"))
    val r = raw.select(col("id").as("r_id"), col("k"), col("ts").as("r_ts"))
    val joined = graft.operators.IntervalJoin.join(
      l, r, Seq("k"), "l_ts", "r_ts", beforeUs = 30L * 60L * 1000000L, afterUs = 0L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // pairs with r.ts in [l.ts - 30min, l.ts]: self-pairs + (2,1) + (4,4)...
    assert(joined == Set((1L, 1L), (2L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L)))
    g.releaseOperatorCaches()
  }
}
