package graft
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object ProbeHot {
  def main(a: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/sfsynth10")) {
      val docs = GraftSession.forDir(spark, d).catalog.relation("documents")
      val injected = docs.select(col("doc_id"),
        concat(col("source"), lit(" | COMMON SITE HEADER\ncookie notice: accept all\n"),
          regexp_replace(col("text"), "((?:\\S+ ){8})", "$1\n")).as("text"))
      val t0 = System.nanoTime
      val nHot = Dedup.hotLines(injected, "text", "doc_id", 5L).count()
      val nLines = injected.select(explode(split(col("text"), "\n"))).count()
      println(f"[probe] $d hot=$nHot lines=$nLines  (${(System.nanoTime-t0)/1e9}%.1f s)")
    }
  }
}
