package graft
object SimProbe {
  def main(a: Array[String]): Unit = {
    val spark = TestSpark.spark
    val g = GraftSession.forDir(spark, "/root/testdata/sf0.1")
    val docs = g.catalog.relation("documents")
    import org.apache.spark.sql.functions._
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[perf] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    docs.count()
    val cands = operators.Dedup.simhashCandidates(docs, "text", "doc_id", 3).localCheckpoint()
    cands.count()
    val pairs = cands.select(col("ida"), col("idb"))
    val wanted = pairs.select(col("ida").as("doc_id")).union(pairs.select(col("idb").as("doc_id"))).distinct()
    time("wanted")(wanted.count())
    val needed = docs.join(wanted, Seq("doc_id"), "left_semi")
    time("needed")(needed.count())
    val sr = operators.Dedup.shingleRows(needed, "text", "doc_id", 3)
    time("shingleRows(needed)")(sr.count())
    val gsets = sr.groupBy(col("id")).agg(collect_set(col("sh")).as("__grams"))
    time("collect_set grams")(gsets.count())
    time("ngramJaccard full")(operators.Dedup.ngramJaccard(pairs, docs, "text", "doc_id").count())
    time("ngramJaccard full (2nd)")(operators.Dedup.ngramJaccard(pairs, docs, "text", "doc_id").count())
  }
}
