package graft
// Plan inspection: assert the physical plans we'd want at 100 TB.
object PlanProbe {
  def main(a: Array[String]): Unit = {
    val spark = TestSpark.spark
    val g = GraftSession.forDir(spark, "/root/testdata/sf0.1")

    def show(tag: String, df: org.apache.spark.sql.DataFrame,
             expect: Seq[String]): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExtendedMode)
      val fm = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"==== $tag")
      expect.foreach { e =>
        val ok = fm.contains(e) || plan.contains(e)
        println(s"  [${if (ok) "OK " else "MISS"}] $e")
      }
      // scan summary lines
      fm.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Broadcast") && l.trim.startsWith("*")).take(8)
        .foreach(l => println("   " + l.trim.take(140)))
    }

    show("filter+projection pushdown",
      g.sql("select l_orderkey + 3 as k from lineitem where l_quantity > 45"),
      Seq("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"))

    show("small dim join broadcasts",
      g.sql("select c.c_name, n.n_name from customer c join nation n on c.c_nationkey = n.n_nationkey"),
      Seq("BroadcastHashJoin"))

    show("agg partial/final split",
      g.sql("select l_returnflag as f, sum(l_quantity) as q from lineitem group by l_returnflag"),
      Seq("HashAggregate", "partial_sum"))

    show("order+limit -> TakeOrderedAndProject",
      g.sql("select o_orderkey as k from orders order by o_totalprice desc limit 5"),
      Seq("TakeOrderedAndProject"))

    show("exists -> semi join",
      g.sql("select c_custkey from customer c where exists (select 1 from orders o where o.o_custkey = c.c_custkey)"),
      Seq("LeftSemi"))

    show("windowed join equi-join on bucket (hash-partitionable; broadcasts when small)",
      g.sql("select count(*) as n from events [size 1 h on ts] as e1 join events [size 1 h on ts] as e2 on e1.event_type = e2.event_type"),
      Seq("HashJoin", "w_start"))

    val emb = g.catalog.relation("embeddings")
    show("brute topk: broadcast queries, codegen cosine",
      operators.Similarity.bruteForceTopK(emb, emb.where(org.apache.spark.sql.functions.col("vec_id") < 10), 5),
      Seq("BroadcastNestedLoopJoin", "vec_cosine"))

    val docs = g.catalog.relation("documents")
    show("text stats scan prunes columns",
      operators.TextAnalysis.stats(docs, "text", "doc_id"),
      Seq("ReadSchema: struct<doc_id:bigint,text:string>"))

    show("VALUES relation joins as broadcast (literal side tiny by construction)",
      g.sql("select n.n_name as nm from (values (0), (1)) as v " +
        "join nation n on n.n_regionkey = v.col1"),
      Seq("BroadcastHashJoin"))

    show("unnest lowers to Generate explode with pruned scan (no shuffle)",
      g.sql("select doc_id, unnest(split(text, ' ')) as tok from documents"),
      Seq("Generate explode", "ReadSchema: struct<doc_id:bigint,text:string>"))

    show("window frame runs in one Window node over one sort",
      g.sql("select sum(o_totalprice) over (partition by o_custkey order by o_orderkey " +
        "rows between 2 preceding and current row) as r from orders"),
      Seq("Window", "specifiedwindowframe(RowFrame, -2, currentrow$())"))

    show("sample clause is a narrow Sample operator over the scan",
      g.sql("select count(*) as n from lineitem sample (10 percent) seed 42"),
      Seq("Sample 0.0, 0.1"))

    // ---- round 3 ----
    show("star EXCLUDE prunes the excluded column at the scan",
      g.sql("select * exclude (text) from documents where doc_id < 10"),
      Seq("ReadSchema: struct<doc_id:bigint,lang:string,source:string,n_chars:bigint>"))

    show("explicit SEMI JOIN plans as broadcast hash left-semi",
      g.sql("select n_name from nation semi join region on n_regionkey = r_regionkey"),
      Seq("BroadcastHashJoin", "LeftSemi"))

    show("DISTINCT ON is one exchange + one window (no self-join)",
      g.sql("select distinct on (o_custkey) o_custkey, o_orderkey from orders " +
        "order by o_custkey, o_totalprice desc"),
      Seq("Window", "row_number"))

    show("ordered string_agg stays one hash aggregate (no window, no extra exchange)",
      g.sql("select n_regionkey as k, string_agg(n_name, '|') within group (order by n_name) as s " +
        "from nation group by n_regionkey"),
      Seq("ObjectHashAggregate", "partial_collect_list"))

    show("mixture is a narrow filter over the scan (zero shuffle)",
      operators.Sampling.mixture(docs, "source", "doc_id", Map("src0" -> 0.5), 1L),
      Seq("PushedFilters", "xxhash64"))

    show("per-source cap: single hash exchange on the group key",
      operators.Sampling.capPerGroup(docs, "source", 10, "doc_id"),
      Seq("hashpartitioning(source", "row_number"))

    show("lateral top-N decorrelates to a window filter, not a per-row loop",
      g.sql("select c.c_custkey as ck, o.o_orderkey from customer c " +
        "join lateral (select o_orderkey from orders " +
        "where o_custkey = c.c_custkey order by o_totalprice desc limit 2) as o on true"),
      Seq("Window", "row_number"))

    show("exists-in-projection plans as a single left semi-ish join (no per-row subquery)",
      g.sql("select c_custkey, exists (select 1 from orders o " +
        "where o.o_custkey = c.c_custkey) as has from customer c"),
      Seq("Join ExistenceJoin"))

    // ---- round 4 ----
    val events = g.catalog.relation("events")
    show("interval join is a bucket equi-join, never a cartesian/range product",
      operators.IntervalJoin.join(
        events.select(org.apache.spark.sql.functions.col("event_id").as("l_id"),
          org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.col("ts").as("l_ts")),
        events.select(org.apache.spark.sql.functions.col("event_id").as("r_id"),
          org.apache.spark.sql.functions.col("event_type").as("event_type"),
          org.apache.spark.sql.functions.col("ts").as("r_ts"))
          .withColumnRenamed("event_type", "event_type"),
        Seq("event_type"), "l_ts", "r_ts", 1800000000L, 0L),
      Seq("HashJoin", "__ib"))

    show("bloom prefilter is a scalar subquery + narrow filter (no join, no shuffle on incoming)",
      operators.Bloom.prefilter(docs.limit(100), docs, "text"),
      Seq("Subquery", "might_contain"))

    show("centroid assignment broadcasts centroids, top-1 short-circuits (WindowGroupLimit)",
      operators.Similarity.centroidAssign(emb, "embedding", "vec_id", "label"),
      Seq("Broadcast", "WindowGroupLimit"))

    // the single exchange is Par.widen's repartition by doc_id; the window
    // (partitioned on its alias `id`) and both aggregate phases reuse it
    show("cdc chunking: one doc-keyed window + hash aggregate, no extra exchange",
      operators.TextAnalysis.cdcChunk(docs, "text", "doc_id"),
      Seq("Window", "hashpartitioning(doc_id"))

    show("union by name stays a zero-shuffle concat (Union node, no Exchange before it)",
      g.sql("select n_nationkey as k, n_name as nm from nation " +
        "union all by name select r_regionkey as k, r_name as nm, r_regionkey as x from region"),
      Seq("Union"))

    show("range-interval frame is ONE native WindowExec on unix_micros (no self-join)",
      g.sql("select event_id as k, sum(value) over (partition by user_id order by ts " +
        "range between interval 1 hour preceding and current row) as sv from events"),
      Seq("Window", "specifiedwindowframe(RangeFrame"))

    show("shared substrings: per-doc gram sets in the projection, ONE " +
      "corpus-sized HASH aggregate, no join on the gram key, no Window",
      operators.TextAnalysis.sharedSubstrings(docs, "text", "doc_id"),
      Seq("xxhash64", "HashAggregate", "array_distinct"))

    show("int8 quantization is a narrow projection (no Exchange at all)",
      operators.Similarity.quantizeInt8(emb, "embedding", "vec_id"),
      Seq("Project"))

    // the only Exchange is Par.widen's small-input parallelism guard
    // (a no-op at scale); the stats themselves are one codegen'd Project
    show("pretokenizer is one projection over the scan (no aggregate, no join)",
      operators.TextAnalysis.pretokenStats(docs, "text", "doc_id"),
      Seq("Project", "regexp_extract_all"))

    show("epoch expansion is a narrow generate (explode) with no Exchange",
      operators.Sampling.epochExpand(docs, "source", "doc_id",
        Map("src0" -> 2.5, "src1" -> 0.5)),
      Seq("Generate explode"))
  }
}
