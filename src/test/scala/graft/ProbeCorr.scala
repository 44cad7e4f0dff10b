object ProbeCorr {
  def main(args: Array[String]): Unit = {
    val g = graft.TestSpark.session
    def run(label: String, sql: String): Unit =
      try {
        val r = g.sql(sql).collect()
        println(s"== $label -> ${r.length} rows: ${r.take(5).mkString(" | ")}")
      } catch { case e: Throwable => println(s"== $label -> ERROR(${e.getClass.getSimpleName}): ${e.getMessage.take(160)}") }
    run("correlated IN",
      "select c_custkey as ck from customer c where c_nationkey in " +
      "(select n_nationkey from nation n where n.n_regionkey = c.c_custkey % 5) order by ck limit 3")
    run("correlated NOT IN",
      "select count(*) as n from customer c where c_nationkey not in " +
      "(select n_nationkey from nation n where n.n_regionkey = c.c_custkey % 5)")
    run("HAVING without GROUP BY",
      "select count(*) as n from nation having count(*) > 10")
    run("scalar subquery >1 row",
      "select (select n_nationkey from nation) as x from region")
    run("correlated EXISTS with agg inside",
      "select r_name from region r where exists (select count(*) from nation n " +
      "where n.n_regionkey = r.r_regionkey group by n.n_regionkey having count(*) > 4) order by r_name")
  }
}
