package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Sink surface for streaming queries (SURVEY §2.1: the reference defines
  * no sinks beyond INSERT INTO — fsql/parser.scala:273-277; we standardize
  * on Structured Streaming writers with watermark-aware defaults).
  */
object Sinks {

  /** Console sink for interactive use. */
  def console(df: DataFrame, mode: OutputMode = OutputMode.Update()): StreamingQuery =
    df.writeStream.outputMode(mode).format("console").start()

  /** In-memory sink (named table) — the parity-test harness sink. */
  def memory(df: DataFrame, name: String,
             mode: OutputMode = OutputMode.Append()): StreamingQuery =
    df.writeStream.outputMode(mode).format("memory").queryName(name).start()

  /** Parquet file sink with checkpointing (exactly-once file output). */
  def parquet(df: DataFrame, path: String, checkpoint: String,
              trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet").start(path)

  /** Publish one micro-batch under `outDir/batch=<id>` with a commit
    * marker, idempotently: a batch id whose marker already exists is
    * skipped (the replay-after-crash case), a batch id with data but NO
    * marker (crash mid-write) is overwritten whole. Returns true iff this
    * call wrote the batch. The `_COMMITTED` marker file is invisible to
    * parquet readers (underscore-prefixed paths are filtered by Spark's
    * file index), so a directory is only ever observed empty-or-complete.
    */
  def publishBatch(batch: DataFrame, outDir: String, batchId: Long): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(outDir, s"batch=$batchId")
    val fs = dir.getFileSystem(
      batch.sparkSession.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(dir, "_COMMITTED")
    if (fs.exists(marker)) false
    else {
      batch.write.mode("overwrite").parquet(dir.toString)
      fs.create(marker, true).close()
      true
    }
  }

  /** Exactly-once parquet publish WITHOUT the built-in file sink's
    * `_spark_metadata` log. The file sink proves exactly-once by recording
    * every file it ever wrote in a driver-maintained compaction log that
    * readers must replay — at 100 TB (millions of files, months-long
    * queries) that log is itself the bottleneck: compactions pause the
    * stream and cold reads scan the whole log. foreachBatch + a per-batch
    * commit marker gets the same guarantee from the checkpoint's offset
    * log alone: the engine replays an uncommitted batch with the SAME
    * batch id and the SAME data, and [[publishBatch]] makes re-publishing
    * that id a no-op. Output is plain partitioned parquet — readers need
    * no sink-specific log, and the `batch=` layout partition-prunes
    * incremental consumers reading only batches they haven't seen.
    */
  def idempotentParquet(df: DataFrame, outDir: String, checkpoint: String,
                        trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], id: Long) =>
        publishBatch(b.toDF(), outDir, id); ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** [[idempotentParquet]] with a per-batch TRANSFORM before the publish —
    * the online-serving shape: each micro-batch of requests is mapped
    * (e.g. ANN-served against a persisted index, scored against a
    * broadcast model) and the RESULT is published exactly-once. The
    * guarantee is unchanged: a replayed batch id re-serves the same
    * input rows and [[publishBatch]] skips the already-committed id, so
    * `serve` must be deterministic per batch (every serve path in this
    * library is). */
  def idempotentServe(df: DataFrame, outDir: String, checkpoint: String,
                      serve: DataFrame => DataFrame,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], id: Long) =>
        publishBatch(serve(b.toDF()), outDir, id); ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Read back only COMMITTED batches from an [[idempotentParquet]] output
    * dir — uncommitted (crash-torn) batch directories are excluded, so a
    * reader running concurrently with the stream never sees a partial
    * batch. Returns rows without the `batch` partition column.
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
                    outDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val committed =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root).collect {
        case st if st.isDirectory &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_COMMITTED")) =>
          st.getPath.toString
      }
    require(committed.nonEmpty, s"no committed batches under $outDir")
    spark.read.parquet(committed.toIndexedSeq: _*)
  }
}
