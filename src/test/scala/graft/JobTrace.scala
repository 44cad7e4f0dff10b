package graft
// Per-job trace of a single gate: job id, duration, task count, task time,
// and the callsite description — finds which ACTION inside a composite
// lifecycle gate burns the time. Scratch probe.
object JobTrace {
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
    val gate = if (a.nonEmpty) a(0) else "x107"
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]
    val jobStage = new java.util.concurrent.ConcurrentHashMap[Int, Int] // stageId -> jobId
    @volatile var trace = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties).flatMap(p =>
          Option(p.getProperty("spark.job.description"))).getOrElse("")
        val site = Option(j.properties).flatMap(p =>
          Option(p.getProperty("callSite.short"))).getOrElse("")
        starts.put(j.jobId, (System.nanoTime(), if (desc.nonEmpty) desc else site))
        taskMs.put(j.jobId, new java.util.concurrent.atomic.AtomicLong)
        j.stageIds.foreach(sid => jobStage.put(sid, j.jobId))
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val jid = jobStage.get(t.stageId)
        if (taskMs.containsKey(jid) && t.taskMetrics != null)
          taskMs.get(jid).addAndGet(t.taskMetrics.executorRunTime): Unit
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        if (trace) {
          val (t0, site) = starts.getOrDefault(j.jobId, (0L, "?"))
          val ms = (System.nanoTime() - t0) / 1e6
          val tm = Option(taskMs.get(j.jobId)).map(_.get).getOrElse(0L)
          if (ms > 30) println(f"[job] ${j.jobId}%4d ${ms / 1000}%7.2f s taskms=$tm%-7d $site")
        }
      }
    })
    val fn = SparkEntry.queries(SparkEntry.queries.keys.find(_.startsWith(gate)).get)
    // warm pass
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    try GraftSession.forDir(spark, sfDir).releaseOperatorCaches() catch { case _: Throwable => () }
    println("[job] ==== measured pass")
    trace = true
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"[job] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
