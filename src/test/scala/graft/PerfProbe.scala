package graft
// Scratch perf probe for operator stages (not a spec).
object PerfProbe {
  def main(a: Array[String]): Unit = {
    val spark = TestSpark.spark
    val g = GraftSession.forDir(spark, "/root/testdata/sf0.1")
    val docs = g.catalog.relation("documents")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[perf] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("entry smoke (driver contract)")(SparkEntry.entry(spark).count())
    time("docs count")(docs.count())
    // x10 probe
    def noop(df: org.apache.spark.sql.DataFrame): Long = { df.write.format("noop").mode("overwrite").save(); 0L }
    time("x10 stats only")(noop(operators.TextAnalysis.stats(docs, "text", "doc_id")))
    time("x10 quality full")(noop(operators.TextAnalysis.quality(docs, "text", "doc_id")))
    time("x10 gate shape")(noop(operators.TextAnalysis.quality(docs, "text", "doc_id")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.col("quality"), 6).as("quality"))
      .orderBy("doc_id")))
    val q24 = "select w_start, count(*) as n, round(sum(value), 4) as v from events [size 1 d on ts] group by w_start order by w_start"
    time("q24 first")(g.sql(q24).count())
    time("q24 repeat")(g.sql(q24).count())
    time("events scan only")(g.catalog.relation("events").count())
    time("shingleRows")(operators.Dedup.shingleRows(docs, "text", "doc_id").count())
    time("minhashSignatures")(operators.Dedup.minhashSignatures(docs, "text", "doc_id").count())
    time("minhashCandidates 0.48")(operators.Dedup.minhashCandidates(docs, "text", "doc_id", threshold = 0.48).count())
    val pairs = operators.Dedup.minhashCandidates(docs, "text", "doc_id", threshold = 0.48)
      .select(org.apache.spark.sql.functions.col("ida"), org.apache.spark.sql.functions.col("idb"))
      .localCheckpoint()
    time("pairs checkpointed")(pairs.count())
    time("ngramJaccard on pairs")(operators.Dedup.ngramJaccard(pairs, docs, "text", "doc_id").count())
    time("nearDuplicates e2e")(operators.Dedup.nearDuplicates(docs, "text", "doc_id").count())
    val big = docs.select(org.apache.spark.sql.functions.col("doc_id"), org.apache.spark.sql.functions.col("lang"))
    val dim = docs.select(org.apache.spark.sql.functions.col("lang")).distinct()
    time("plain join")(big.join(dim, Seq("lang")).count())
    time("salted join (8)")(operators.Skew.saltedJoin(big, dim, Seq("lang"), 8).count())
    time("curation pipeline")(operators.Curation.curate(docs).count())
    val embd = g.catalog.relation("embeddings")
    val q10 = embd.where(org.apache.spark.sql.functions.col("vec_id") < 10)
    time("topk collect_list")(operators.Similarity.bruteForceTopK(embd, q10, 5).count())
    time("topk bounded-heap udaf")(operators.Similarity.bruteForceTopKPartial(embd, q10, 5).count())
  }
}
