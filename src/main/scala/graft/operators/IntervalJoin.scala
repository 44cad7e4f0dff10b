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
  // relations, which already normalize NTZ→TIMESTAMP). Time columns are
  // TYPE-CHECKED, not blanket-cast: TIMESTAMP passes through, NTZ (e.g.
  // pandas-written parquet read by Spark 4) is cast in the session time
  // zone, and anything else (bigint epoch values, strings) stays a LOUD
  // error — a silent cast would interpret epoch-micros longs as SECONDS
  // and return garbage matches.
  // Returns an unresolved-by-name column (valid in any frame containing
  // `name`, including the join output), with the cast decision made from
  // the side's schema once.
  private def timeCol(df: DataFrame, name: String): org.apache.spark.sql.Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.TimestampType    => col(name)
      case org.apache.spark.sql.types.TimestampNTZType => col(name).cast("timestamp")
      case other => throw new IllegalArgumentException(
        s"time column $name must be TIMESTAMP or TIMESTAMP_NTZ, got $other " +
          "(cast epoch numbers explicitly with timestamp_micros/timestamp_seconds)")
    }

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
    val lUs = unix_micros(timeCol(left, lTime))
    val rUs = unix_micros(timeCol(right, rTime))
    val l = left.withColumn("__ib", bucket(lUs))
    val r = right.withColumn("__ib",
      explode(sequence(bucket(rUs - afterUs), bucket(rUs + beforeUs))))
    l.join(r, keys :+ "__ib")
      .where(rUs.between(lUs - beforeUs, lUs + afterUs))
      .drop("__ib")
  }

  /** Streaming interval join: watermark both sides and let Spark's
    * stream-stream join keep state only for the bounded interval.
    *
    * Scale: the user keys alone can be LOW-CARDINALITY (5 event types over
    * a 100 TB stream), and the symmetric-hash join probes EVERY stored row
    * of the matching key before the range predicate runs — per-batch cost
    * degenerates to |state/key|·|input|. So the streaming plan joins on
    * the SAME (key, time-bucket) composite as the batch plan: left keeps
    * its one bucket, right is exploded to the ≤2 buckets its match
    * interval touches, and state probes only ever see same-bucket rows —
    * cost proportional to true matches, never the per-key cross product.
    * Each matching pair shares exactly one bucket (the left row's), so no
    * dedup pass is needed; the range predicate still references both
    * event-time columns, so Spark's watermark state eviction is unchanged.
    */
  def streaming(left: DataFrame, right: DataFrame, keys: Seq[String],
                lTime: String, rTime: String, beforeUs: Long, afterUs: Long,
                watermarkDelay: String): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0, "interval bounds must be >= 0")
    val width = math.max(beforeUs + afterUs, 1L)
    def bucket(us: org.apache.spark.sql.Column) =
      call_function("div", us - pmod(us, lit(width)), lit(width))
    val l = Catalog.normalizeNtz(left).withWatermark(lTime, watermarkDelay)
      .withColumn("__ib", bucket(unix_micros(col(lTime))))
    val r = Catalog.normalizeNtz(right).withWatermark(rTime, watermarkDelay)
      .withColumn("__ib",
        explode(sequence(bucket(unix_micros(col(rTime)) - afterUs),
          bucket(unix_micros(col(rTime)) + beforeUs))))
    val keyCond = (keys :+ "__ib").map(k => l(k) === r(k)).reduce(_ && _)
    val range =
      unix_micros(r(rTime)).between(unix_micros(l(lTime)) - beforeUs,
        unix_micros(l(lTime)) + afterUs)
    l.join(r, keyCond && range, "inner").drop("__ib")
  }
}
