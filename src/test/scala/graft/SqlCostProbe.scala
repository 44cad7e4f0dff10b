package graft
// How much of a simple gate is parse/translate vs Spark? (scratch)
object SqlCostProbe {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = GraftSession.forDir(spark, "/root/testdata/sf0.1")
    val q1 = "select l_returnflag as f, count(*) as n from lineitem group by l_returnflag order by f"
    val q2 = "select c.c_custkey as ck, o.o_orderkey as ok from customer c " +
      "left join orders o on c.c_custkey = o.o_custkey and o.o_totalprice > 400000 order by ck, ok"
    def bench(tag: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      var i = 0; while (i < n) { f; i += 1 }
      println(f"[sqlcost] $tag%-22s ${(System.nanoTime() - t0) / 1e6 / n}%8.2f ms/op")
    }
    bench("parse q1", 50)(graft.parser.SqlParser.parse(q1))
    bench("parse q2", 50)(graft.parser.SqlParser.parse(q2))
    bench("sql() q1 (to DF)", 50)(g.sql(q1))
    bench("sql() q2 (to DF)", 50)(g.sql(q2))
    bench("noop exec q1", 10)(g.sql(q1).write.format("noop").mode("overwrite").save())
    bench("noop exec q2", 10)(g.sql(q2).write.format("noop").mode("overwrite").save())
  }
}
