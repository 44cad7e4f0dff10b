package graft
// Round-count probe for Components.connectedComponents on the x35/x27/x57
// gate graphs (scratch, not a spec).
object CCProbe {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val g = GraftSession.forDir(spark, sfDir)
    val e = g.catalog.relation("embeddings").where(col("vec_id") < 500)
    val l = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val r = e.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = l.join(r, col("ida") < col("idb"))
      .where(operators.Similarity.cosine(col("va"), col("vb")) >= 0.4)
      .select(col("ida"), col("idb")).localCheckpoint()
    println(s"[cc] x35 pairs = ${pairs.count()}")
    val t0 = System.nanoTime()
    val labels = operators.Components.connectedComponents(pairs)
    println(f"[cc] x35 components done in ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"n=${labels.count()}, ncomp=${labels.select("comp").distinct().count()}")
    val docs = g.catalog.relation("documents")
    val p2 = operators.Dedup.nearDuplicates(docs, "text", "doc_id", threshold = 0.8)
      .select(col("ida"), col("idb")).localCheckpoint()
    println(s"[cc] x27 pairs = ${p2.count()}")
    val t1 = System.nanoTime()
    val l2 = operators.Components.connectedComponents(p2)
    println(f"[cc] x27 components done in ${(System.nanoTime() - t1) / 1e9}%.2f s, n=${l2.count()}")
  }
}
