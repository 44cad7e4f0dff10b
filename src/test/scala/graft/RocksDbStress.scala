package graft

import org.apache.spark.sql.functions._

/** Round-10 scale proof (VERDICT r9 task #6): streaming exact dedup over
  * the FULL ~sf10 corpus (500k docs) on the RocksDB state-store provider,
  * keyed on the raw document TEXT — the fattest realistic key, so the
  * state store holds ~0.5 GB of key bytes while the RocksDB memory
  * budget is pinned to 64 MB (`boundedMemoryUsage`): the state
  * deliberately exceeds its memory budget by ~10× and must live on local
  * disk. Asserts completion + exact parity with the batch distinct count
  * and prints the state-operator metrics (rows, memory, wall time) for
  * SCALE.md.
  *
  * Run: `SPARK_DRIVER_MEM=8g sbt -batch
  *   "Test/runMain graft.RocksDbStress /tmp/sfsynth10"`
  * (small heap on purpose — the point is that state does NOT live there)
  */
object RocksDbStress {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/tmp/sfsynth10")
    val spark = TestSpark.spark
    val rocks = spark.newSession()
    rocks.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    rocks.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
    rocks.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", "64")
    rocks.conf.set("spark.sql.shuffle.partitions", "8")

    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val srcDir = tmp("rstress_src_")
    val outDir = tmp("rstress_out_")
    val ckpt = tmp("rstress_ckpt_")

    val docs = GraftSession.forDir(spark, sfDir).catalog.relation("documents")
      .select(col("doc_id"), col("text"))
    val expectedDistinct = docs.agg(countDistinct(col("text"))).head().getLong(0)
    val stateBytesLB = docs.select(col("text")).distinct()
      .agg(sum(length(col("text")))).head().getLong(0)
    docs.repartition(64).write.mode("overwrite").parquet(srcDir)

    val in = rocks.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "16").parquet(srcDir)
    val dd = graft.streaming.Dedup.exact(in, Seq("text")).select("doc_id")
    val t0 = System.nanoTime()
    val q = dd.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val wall = (System.nanoTime() - t0) / 1e9

    val got = spark.read.parquet(outDir).count()
    val stateOps = q.recentProgress.flatMap(_.stateOperators)
    val rowsTotal = if (stateOps.nonEmpty) stateOps.last.numRowsTotal else -1L
    val memUsed = if (stateOps.nonEmpty) stateOps.last.memoryUsedBytes else -1L
    val custom =
      if (stateOps.nonEmpty)
        stateOps.last.customMetrics.entrySet().iterator()
      else java.util.Collections.emptyIterator[
        java.util.Map.Entry[String, java.lang.Long]]()
    val interesting = Set("rocksdbTotalMemoryUsage", "rocksdbSstFileSize",
      "rocksdbPinnedBlocksMemoryUsage", "rocksdbTotalBytesWritten")
    val sb = new StringBuilder
    while (custom.hasNext) {
      val e = custom.next()
      if (interesting(e.getKey)) sb.append(s"  ${e.getKey}=${e.getValue}\n")
    }
    println(f"[rocks-stress] corpus=500k docs, distinct texts=$expectedDistinct, " +
      f"state key bytes (lower bound)=${stateBytesLB / 1e6}%.0f MB, " +
      f"memory budget=64 MB")
    println(f"[rocks-stress] wall=${wall}%.1f s  output rows=$got  " +
      f"state rows=$rowsTotal  memoryUsedBytes=$memUsed")
    print(sb.toString)
    require(got == expectedDistinct,
      s"parity broken: streamed dedup $got vs batch distinct $expectedDistinct")
    require(rowsTotal == expectedDistinct,
      s"state rows $rowsTotal != distinct keys $expectedDistinct")
    println("[rocks-stress] PASS: completion + parity with state >> memory budget")
    // unload every loaded RocksDB provider BEFORE the JVM exits: the
    // rocksdbjni maintenance threads otherwise race JVM teardown and
    // SIGABRT in JniUtil::getJniEnv after the run has already passed
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
  }
}
