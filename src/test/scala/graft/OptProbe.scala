package graft
// Round-15 optimization scratch probe: split a gate's wall time into
// build (fn() returns: parse/translate + any eager actions inside the
// gate), analyze/optimize, and execute (noop sink). Not a spec.
object OptProbe {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (a.nonEmpty) a(0).split(",").toSeq else Seq("q136")
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.startsWith) }
    def t[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // two rounds: cold then warm
    for (round <- 1 to 3; (name, fn) <- sel) {
      val (df, tBuild) = t(fn(spark, sfDir))
      val (_, tOpt) = t(df.queryExecution.executedPlan)
      val (_, tExec) = t(df.write.format("noop").mode("overwrite").save())
      try GraftSession.forDir(spark, sfDir).releaseOperatorCaches()
      catch { case _: Throwable => () }
      println(f"[opt] r$round $name%-30s build=$tBuild%7.3f plan=$tOpt%7.3f exec=$tExec%7.3f total=${tBuild + tOpt + tExec}%7.3f")
    }
  }
}
