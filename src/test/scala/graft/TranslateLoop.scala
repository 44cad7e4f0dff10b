package graft
// Spin translate in a loop so jstack sampling finds the hot frames (scratch).
object TranslateLoop {
  def main(a: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = GraftSession.forDir(spark, "/root/testdata/sf0.1")
    val q2 = "select c.c_custkey as ck, o.o_orderkey as ok from customer c " +
      "left join orders o on c.c_custkey = o.o_custkey and o.o_totalprice > 400000 order by ck, ok"
    g.sql(q2)
    println("[loop] pid=" + ProcessHandle.current().pid())
    val t0 = System.nanoTime()
    var n = 0
    while ((System.nanoTime() - t0) < 30e9) { g.sql(q2); n += 1 }
    println(s"[loop] iterations=$n in 30s -> ${30000.0 / n} ms/op")
  }
}
