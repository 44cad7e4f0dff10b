package graft

import org.apache.spark.sql.functions._

/** Round-13 scale proof (VERDICT r12 task #8): streaming SESSION-WINDOW
  * and COUNT-WINDOW state at RocksDB scale — the x102/x106 operator
  * shapes run over the full ~sf10 events replay (10M rows, ~150k keys)
  * with the state store pinned to the 64 MB RocksDB budget
  * (the RocksDbStress discipline applied to window state).
  *
  * Why this is the hard case: the replay arrives as ONE micro-batch, so
  * the session operator holds the PEAK state — every session of the
  * whole 8.5-year timeline at once (events average hours apart per user,
  * so nearly every event is its own session: ~10M session rows against a
  * 64 MB memory budget, forced onto local disk). A far-future sentinel
  * row then advances the watermark past every real session and the
  * no-data flush batch must emit them ALL in append mode.
  *
  * Parity (order-invariant at this scale):
  *  - sessions: (count, Σn, Σ(epoch(w_start) mod 1e9)) equals the batch
  *    dialect's `[session 30 min on ts partitioned on user_id]` result;
  *  - count windows: the multiset of per-(user, w_id) row counts equals
  *    batch chunking's — tumbling counts are arrival-order-invariant
  *    even though individual w_id assignments are not.
  *
  * The UNKEYED streaming session path intentionally has no stress row:
  * the dialect rejects it ("partitioned on" required — Spark has no
  * global session aggregation on streams); its batch form is the
  * range-partitioned merge audited in SCALE.md.
  *
  * Run: `SPARK_DRIVER_MEM=8g sbt -batch
  *   "Test/runMain graft.SessionWindowStress /tmp/sfsynth10"` */
object SessionWindowStress {
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
    val g = GraftSession.forDir(spark, sfDir)
    val ev = g.catalog.relation("events")
      .select(col("ts"), col("user_id").cast("long").as("user_id"), col("value"))
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()

    // ---------- shape A: dialect session windows (x102 family) ----------
    val batchSess = g.sql(
      "select user_id, w_start, count(*) as n from events " +
      "[session 30 min on ts partitioned on user_id] group by user_id")
      .agg(count(lit(1)).as("nw"), sum(col("n")).as("sn"),
        sum(unix_timestamp(col("w_start")) % 1000000000L).as("cs")).head()
    val (bNw, bSn, bCs) = (batchSess.getLong(0), batchSess.getLong(1),
      batchSess.getLong(2))

    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(
      maxTs.getTime + 60L * 24 * 3600 * 1000) // +60 days: past every session
    val srcDir = tmp("sessstress_") + "/feed.parquet"
    import spark.implicits._
    ev.union(Seq((sentinelTs, -1L, 0.0)).toDF("ts", "user_id", "value"))
      .write.mode("overwrite").parquet(srcDir)

    val gs = new GraftSession(rocks, streaming = true)
    gs.sql("create stream sess10 (ts timestamp, user_id long, value double) " +
      s"source file('$srcDir')")
    val sessOut = tmp("sessstress_out_")
    val sessCk = tmp("sessstress_ck_")
    val streamed = gs.sql(
      "select user_id, w_start, count(*) as n from sess10 " +
      "[session 30 min on ts partitioned on user_id] group by user_id")
    val t0 = System.nanoTime()
    val q = streamed.writeStream.format("parquet")
      .option("path", sessOut).option("checkpointLocation", sessCk)
      .outputMode("append").start()
    val (rowsTotal, memUsed, rocksMetrics) = try {
      // the append flush rides the post-sentinel no-data batch; poll until
      // the emitted window count reaches the batch truth (q117 pattern)
      val deadline = System.currentTimeMillis() + 30 * 60 * 1000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        done = spark.read.parquet(sessOut).count() >= bNw
        if (!done) Thread.sleep(500)
      }
      val ops = q.recentProgress.flatMap(_.stateOperators)
      val rt = ops.map(_.numRowsTotal).foldLeft(0L)(math.max)
      val mu = ops.map(_.memoryUsedBytes).foldLeft(0L)(math.max)
      val interesting = Set("rocksdbTotalMemoryUsage", "rocksdbSstFileSize",
        "rocksdbTotalBytesWritten")
      val sb = new StringBuilder
      ops.lastOption.foreach { op =>
        val it = op.customMetrics.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (interesting(e.getKey)) sb.append(s"  ${e.getKey}=${e.getValue}\n")
        }
      }
      (rt, mu, sb.toString)
    } finally q.stop()
    val sessWall = (System.nanoTime() - t0) / 1e9

    val got = spark.read.parquet(sessOut)
      .agg(count(lit(1)).as("nw"), sum(col("n")).as("sn"),
        sum(unix_timestamp(col("w_start")) % 1000000000L).as("cs")).head()
    println(f"[sess-stress] events=$nEvents users=$nUsers  batch windows=$bNw")
    println(f"[sess-stress] wall=$sessWall%.1f s  peak state rows=$rowsTotal  " +
      f"memoryUsedBytes=$memUsed  budget=64 MB")
    print(rocksMetrics)
    require(got.getLong(0) == bNw && got.getLong(1) == bSn && got.getLong(2) == bCs,
      s"session parity broken: stream (${got.getLong(0)}, ${got.getLong(1)}, " +
        s"${got.getLong(2)}) vs batch ($bNw, $bSn, $bCs)")
    // peak state must be corpus-scale (nearly one session per event on
    // this timeline), not a trickle — the point of the single-batch replay
    require(rowsTotal > nEvents / 10,
      s"stress did not reach state scale: peak state rows $rowsTotal of $nEvents events")

    // ---------- shape B: streaming count windows (x106 family) ----------
    // batch chunking truth: per-(user, w_id) row counts under tumbling
    // size 100 — order-invariant, so the file replay needs no ordering
    val batchCw = ev
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "value")) - 1)
      .groupBy(col("user_id"), (col("rn") / 100).cast("long").as("w_id"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("user_id", "cnt").agg(count(lit(1)).as("g"))
    val cwIn = rocks.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
      .where(col("user_id") >= 0) // drop the session sentinel
    val assigned = graft.streaming.CountWindow.assign(cwIn, 100, Seq("user_id"))
    val cwOut = tmp("cwstress_out_")
    val cwCk = tmp("cwstress_ck_")
    val t1 = System.nanoTime()
    val q2 = assigned.select(col("user_id"), col("w_id")).writeStream
      .format("parquet").option("path", cwOut)
      .option("checkpointLocation", cwCk).outputMode("append").start()
    val cwStateRows = try {
      q2.processAllAvailable()
      q2.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal).foldLeft(0L)(math.max)
    } finally q2.stop()
    val cwWall = (System.nanoTime() - t1) / 1e9
    val gotCw = spark.read.parquet(cwOut)
      .groupBy("user_id", "w_id").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id", "cnt").agg(count(lit(1)).as("g"))
    val diff = gotCw.except(batchCw).count() + batchCw.except(gotCw).count()
    val outRows = spark.read.parquet(cwOut).count()
    println(f"[cw-stress] wall=$cwWall%.1f s  output rows=$outRows  " +
      f"state rows (per-key counters)=$cwStateRows")
    require(outRows == nEvents, s"count-window rows $outRows != input $nEvents")
    require(diff == 0, s"count-window chunk-count multiset differs: $diff rows")
    require(cwStateRows == nUsers,
      s"count-window state $cwStateRows != distinct users $nUsers")
    println("[sess-stress] PASS: session + count-window parity with state >> memory budget")
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
  }
}
