package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming deduplication (SURVEY §7.2 M4 — `dropDuplicates` /
  * `dropDuplicatesWithinWatermark` on unbounded inputs).
  *
  * Two state regimes, chosen by whether a watermark column is given:
  *  - [[exact]]: keep-first per key with UNBOUNDED state — every key ever
  *    seen stays in the state store. Correct for bounded key domains
  *    (user ids, document ids in a replay), wrong for open-ended ones.
  *  - [[withinWatermark]]: keep-first per key where state for keys older
  *    than the watermark is EVICTED — the 100 TB regime: state is bounded
  *    by (keys arriving within the delay window), and late duplicates
  *    beyond the delay are dropped by the watermark rather than matched.
  *    Uses Spark's native dropDuplicatesWithinWatermark operator, so
  *    eviction happens in the state store, not in user code.
  */
object Dedup {

  /** Keep-first per `keys` with unbounded state (bounded key domains). */
  def exact(stream: DataFrame, keys: Seq[String]): DataFrame =
    stream.dropDuplicates(keys)

  /** Keep-first per `keys` with watermark-bounded state: duplicates
    * arriving within `delay` of the first occurrence (by `timeCol` event
    * time) are dropped; state older than the watermark is evicted. */
  def withinWatermark(stream: DataFrame, keys: Seq[String],
                      timeCol: String, delay: String): DataFrame =
    stream.withWatermark(timeCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}
