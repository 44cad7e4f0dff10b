package graft
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Extensions}
object ProbeX88b {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    val docs = GraftSession.forDir(s, "/root/testdata/sf0.1").catalog.relation("documents")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val injected = t("inject")(docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, concat(col("text"), lit(" the quick brown fox jumps over the lazy dog tonight")))
      .otherwise(col("text")).as("text")).localCheckpoint())
    val batchOut = t("batch")(Dedup.exciseSharedSpans(injected, "text", "doc_id", 8, 2L)
      .select(col("id"), col("n_words"), col("n_removed"), md5(col("cleaned")).as("h")).localCheckpoint())
    val hot = t("hot ckpt")(Dedup.hotSpans(injected, "text", "doc_id", 8, 2L).localCheckpoint())
    val dir = Extensions.tempDir("p88_replay_")
    t("replay write")(injected.select("doc_id","text").write.mode("overwrite").parquet(dir))
    val in = s.readStream.schema(injected.select("doc_id","text").schema).parquet(dir)
    val streamed = Dedup.applySpanExcision(in, "text", "doc_id", hot, 8)
      .select(col("id"), col("n_words"), col("n_removed"), md5(col("cleaned")).as("h"))
    val outDir = Extensions.tempDir("p88_out_"); val ckpt = Extensions.tempDir("p88_ckpt_")
    val q = t("start")(streamed.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt).outputMode("append").start())
    t("processAllAvailable")(q.processAllAvailable())
    q.stop()
    t("compare") {
      val got = s.read.parquet(outDir).select("id","n_words","n_removed","h")
      println(got.count() == batchOut.count() && got.except(batchOut).isEmpty && batchOut.except(got).isEmpty)
    }
  }
}
