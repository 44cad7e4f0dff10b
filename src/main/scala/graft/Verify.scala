package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, s"usage: Verify <sfDir> <outDir> (got ${args.length} args)")
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local pre-flight convenience: SPARK_GRAFT_ONLY=q94,q95 runs the
    // matching-prefix subset (driver never sets it → full run)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = only match {
      case None => SparkEntry.queries
      case Some(pfx) =>
        val sub = SparkEntry.queries.filter { case (n, _) => pfx.exists(n.startsWith) }
        // loud, unmissable: a filtered run must never pass for a full one
        println(s"[verify] *** SUBSET RUN: ${sub.size}/${SparkEntry.queries.size} " +
          s"queries (SPARK_GRAFT_ONLY=${pfx.mkString(",")}) ***")
        System.err.println(s"[verify] *** SUBSET RUN: ${sub.size}/${SparkEntry.queries.size} queries ***")
        sub
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.toString}")
        e.printStackTrace()
        // delete any stale output from a previous run: a leftover parquet
        // would make the driver's compare read old (passing) results and
        // report a broken query as correct
        val stale = new java.io.File(s"$outDir/$name")
        if (stale.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete()
          }
          rm(stale)
        }
      }
      // result fully written (or the query failed) — safe point to drop
      // operator-pinned RDDs so a 163-gate run cannot accumulate pinned
      // range-partitioned blocks across queries. Own try: a throwing
      // forDir (e.g. corrupt table file) must stay a PER-QUERY failure,
      // not abort the run before later gates and oracle_sql.json
      try GraftSession.forDir(spark, sfDir).releaseOperatorCaches()
      catch { case _: Throwable => () }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
