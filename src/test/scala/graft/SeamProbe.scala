package graft

import org.apache.spark.sql.functions._

/** Same-window A/B of Curation.fullPipeline's two materialization modes
  * (localCheckpoint vs parquet seam) — the r15 seam option's honest sf10
  * cost. Run:
  *   `SPARK_GRAFT_SF_DIR=/tmp/sfsynth10 sbt -batch "Test/runMain graft.SeamProbe"`
  * Two passes per mode, interleaved (A B A B) so neither mode owns the
  * colder half of the window; min per mode reported.
  */
object SeamProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfsynth10")
    val spark = TestSpark.spark
    val docs = GraftSession.forDir(spark, sfDir).catalog.relation("documents")
    def once(seam: Boolean): Double = {
      val t0 = System.nanoTime()
      val out = graft.operators.Curation.fullPipeline(docs,
        seamDir = if (seam)
          Some(java.nio.file.Files.createTempDirectory("seamprobe_").toString)
        else None)
      out.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val times = Seq(false, true, false, true).map(s => s -> once(s))
    def minOf(s: Boolean) =
      times.collect { case (`s`, t) => t }.min
    times.foreach { case (s, t) =>
      println(f"[seamprobe] seam=$s%-5s ${t}%7.1f s") }
    println(f"[seamprobe] min localCheckpoint=${minOf(false)}%.1f s  " +
      f"min parquet-seam=${minOf(true)}%.1f s  " +
      f"ratio=${minOf(true) / minOf(false)}%.2f")
  }
}
