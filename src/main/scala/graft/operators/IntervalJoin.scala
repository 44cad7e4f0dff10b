package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Time-interval join — Flink's `intervalJoin` semantics: pair left and
  * right rows on equal keys whenever
  * `l.time - before <= r.time <= l.time + after`. The streaming staple
  * for enrichment within a bounded lateness window (clicks ⨝ impressions
  * of the last 10 minutes, trades ⨝ quotes ±1 s).
  *
  * Batch scale design: a naive key-equi-join followed by the range filter
  * builds the full per-key cross product first — O(|L|·|R| / keys) rows
  * through the join. Here both sides are aligned to fixed time buckets of
  * width `before + after` instead: the left row keeps its ONE bucket, the
  * right row is exploded to the (at most 2) buckets its match interval
  * can touch, and the join runs on (key, bucket) before the exact range
  * predicate trims the edges. Join input grows by ≤ 2×, join output is
  * bounded by rows that are actually near each other in time — no per-key
  * blowup, one hash shuffle per side, AQE-skew-splittable. Each matching
  * pair shares exactly one bucket (the left row's), so no dedup pass is
  * needed.
  *
  * Streaming: the same semantics run natively as a Spark stream-stream
  * join — `withWatermark` both sides and use the range predicate in the
  * join condition ([[streaming]]); Spark derives the state retention from
  * the time bound.
  */
object IntervalJoin {

  // The operator API takes arbitrary DataFrames (not just catalog
  // relations, which already normalize NTZ→TIMESTAMP), so time columns are
  // defensively cast before unix_micros — NTZ inputs (e.g. pandas-written
  // parquet read by Spark 4) otherwise fail DATATYPE_MISMATCH. The cast is
  // a no-op on TIMESTAMP; NTZ is interpreted in the session time zone.
  private def micros(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp"))

  /** Batch interval join. `right`'s columns are appended; names must not
    * clash with left's (rename before joining). `beforeUs`/`afterUs` are
    * non-negative microsecond bounds relative to the LEFT row's time. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           lTime: String, rTime: String,
           beforeUs: Long, afterUs: Long): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0, "interval bounds must be >= 0")
    val clash = right.columns.toSet.intersect(left.columns.toSet) -- keys
    require(clash.isEmpty,
      s"right columns clash with left columns: ${clash.mkString(", ")}")
    val width = math.max(beforeUs + afterUs, 1L)
    // exact long floor division (subtract the non-negative pmod, then the
    // numerator divides evenly — `div` is integral, no double rounding):
    // correct for any epoch, unlike floor(double/width) which loses
    // precision past 2^53 µs
    def bucket(us: org.apache.spark.sql.Column) =
      call_function("div", us - pmod(us, lit(width)), lit(width))
    // r matches l ⟺ l.time ∈ [r.time - after, r.time + before], so the
    // right row must appear in every bucket that interval touches
    val l = left.withColumn("__ib", bucket(micros(col(lTime))))
    val r = right.withColumn("__ib",
      explode(sequence(bucket(micros(col(rTime)) - afterUs),
        bucket(micros(col(rTime)) + beforeUs))))
    l.join(r, keys :+ "__ib")
      .where(micros(col(rTime))
        .between(micros(col(lTime)) - beforeUs,
          micros(col(lTime)) + afterUs))
      .drop("__ib")
  }

  /** Streaming interval join: watermark both sides and let Spark's
    * stream-stream join keep state only for the bounded interval. */
  def streaming(left: DataFrame, right: DataFrame, keys: Seq[String],
                lTime: String, rTime: String, beforeUs: Long, afterUs: Long,
                watermarkDelay: String): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0, "interval bounds must be >= 0")
    val l = Catalog.normalizeNtz(left).withWatermark(lTime, watermarkDelay)
    val r = Catalog.normalizeNtz(right).withWatermark(rTime, watermarkDelay)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val range =
      unix_micros(r(rTime)).between(unix_micros(l(lTime)) - beforeUs,
        unix_micros(l(lTime)) + afterUs)
    l.join(r, keyCond && range, "inner")
  }
}
