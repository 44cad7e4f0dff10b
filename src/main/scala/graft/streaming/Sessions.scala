package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming session windows: Spark-native `session_window()` with a
  * watermark (required for merging/expiring session state). The session
  * extent depends on the whole group, so the batch translator's per-row
  * gaps-and-islands form is not expressible on a stream — this is the
  * streaming path (SURVEY §2.9: session windows are a deliberate
  * beyond-reference addition).
  */
object Sessions {

  /** Group a stream into gap-based sessions per `keys` and apply `aggs`.
    * Output columns: w_start, w_end, keys..., aggregates. */
  def aggregate(df: DataFrame, timeCol: String, gap: String,
                keys: Seq[String], aggs: (Column, Seq[Column]),
                watermarkDelay: Option[String] = None): DataFrame = {
    val wm = df.withWatermark(timeCol, watermarkDelay.getOrElse(gap))
    val groupCols = session_window(col(timeCol), gap) +: keys.map(col)
    val agged = wm.groupBy(groupCols: _*).agg(aggs._1, aggs._2: _*)
    // column order matches the doc: w_start, w_end, keys..., aggregates
    val rest = agged.columns.filterNot(_ == "session_window")
    agged.select(
      (col("session_window.start").as("w_start") +:
       col("session_window.end").as("w_end") +:
       rest.map(col).toSeq): _*)
  }
}
