package graft

/** Differential-fuzz runner (pairs with `tools/fuzz_differential.py`):
  * reads a {name -> sql} JSON of generated queries (identical text is valid
  * in the dialect AND DuckDB), executes each through `GraftSession.sql`,
  * writes one parquet dir per query for the python side to hash-compare.
  *
  * Usage: sbt "Test/runMain graft.FuzzRun <queries.json> <outDir> <sfDir>"
  */
object FuzzRun {
  def main(a: Array[String]): Unit = {
    require(a.length == 3, "usage: FuzzRun <queries.json> <outDir> <sfDir>")
    val Array(qfile, outDir, sfDir) = a
    val spark = TestSpark.spark
    val g = GraftSession.forDir(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    // minimal JSON object parse: {"name": "sql", ...} with \" and \\ escapes
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(qfile)), "UTF-8")
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
      .replace("\\n", "\n").replace("\\t", "\t")
    var pass = 0; var fail = 0
    entry.findAllMatchIn(text).foreach { m =>
      val (name, sql) = (unesc(m.group(1)), unesc(m.group(2)))
      // `<name>__oracle` entries hold DuckDB-only recomputations for the
      // window-spec pair shapes (round 9) — consumed by cmp, not by us
      if (name.endsWith("__oracle")) ()
      else try {
        g.sql(sql).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        pass += 1
      } catch { case e: Throwable =>
        fail += 1
        System.err.println(s"[fuzz] $name THREW: ${e.toString.linesIterator.next()}")
        System.err.println(s"[fuzz]   sql: ${sql.take(300)}")
      } finally
        // unkeyed count windows pin a range-partitioned RDD per statement
        // (the Verify discipline): release between queries so a long fuzz
        // batch cannot accumulate pinned blocks
        try g.releaseOperatorCaches() catch { case _: Throwable => () }
    }
    println(s"[fuzz] executed $pass, threw $fail")
    if (fail > 0) sys.exit(1)
  }
}
