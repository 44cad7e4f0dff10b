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
}
