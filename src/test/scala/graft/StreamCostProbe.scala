package graft
// Where does a one-micro-batch file-replay stream gate spend its wall
// time? (scratch probe for the r15 optimization round)
object StreamCostProbe {
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
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scp] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    for (round <- 1 to 2) {
      println(s"[scp] ---- round $round")
      val dd = t("docs checkpoint")(g.catalog.relation("documents").localCheckpoint())
      val train = dd.where(col("doc_id") % 97 =!= 0)
      val bench = dd.where(col("doc_id") % 97 === 0)
      val batchIds = t("batch clean collect")(
        operators.Decontaminate.clean(train, bench, "text", "doc_id", w = 3, minHits = 1)
          .select(col("doc_id")).collect().map(_.getLong(0)).sorted)
      val hot = t("hot model checkpoint")(
        operators.Decontaminate.benchShingleHashes(bench, "text", "doc_id", w = 3)
          .localCheckpoint())
      val dir = t("replay write")(java.nio.file.Files.createTempDirectory("scp_").toString)
      t("replay write parquet")(train.select("doc_id", "text").write.mode("overwrite").parquet(dir))
      val in = spark.readStream.schema(train.select("doc_id", "text").schema).parquet(dir)
      val streamed = operators.Decontaminate.applyClean(in, "text", "doc_id", hot,
        w = 3, minHits = 1).select("doc_id")
      val outDir = java.nio.file.Files.createTempDirectory("scp_out_").toString
      val ckpt = java.nio.file.Files.createTempDirectory("scp_ckpt_").toString
      val q = t("stream start")(streamed.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start())
      t("processAllAvailable")(q.processAllAvailable())
      t("stop")(q.stop())
      t("readback+compare")(
        assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted.toSeq == batchIds.toSeq))
    }
  }
}
