package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global quantiles by histogram refinement — order statistics
  * WITHOUT a global sort.
  *
  * The training-data-curation primitive behind CCNet/RefinedWeb-style
  * "keep the best p% by score": thresholds must be GLOBAL order
  * statistics, but a global `ORDER BY` at 100 TB funnels everything
  * through a total-order shuffle. Spark's built-in exact `percentile`
  * aggregate is no better at that scale: it buffers EVERY value in one
  * aggregation state. `approx_percentile` avoids both but is not exact,
  * so a filter derived from it disagrees with an oracle (and between
  * runs at different parallelism).
  *
  * This implements exact selection as iterative histogram refinement:
  * each pass builds a `buckets`-bin histogram of the candidate range
  * (one narrow scan + a ≤`buckets`-row aggregate to the driver), finds
  * the bin containing the k-th value, and recurses into it. The range
  * shrinks by ×`buckets` per pass, so a 64-bit domain resolves in
  * ≤ ⌈64/log₂ buckets⌉ = 6 passes with the default 4096 bins — six
  * narrow column scans (rowgroup min/max stats prune ever harder as the
  * range tightens) and six tiny driver aggregates, independent of data
  * size. No sort, no single-reducer stage, no full-column state.
  */
object Quantiles {

  /** Exact k-th smallest (1-based, nulls excluded) value of an integral
    * column. `k` ∈ [1, count]; ties are resolved naturally (values, not
    * rows, are ranked — duplicates occupy adjacent ranks).
    *
    * The column is read as LONG; use this for ints/longs/shorts (exact).
    * Cost: ≤6 scans of the single projected column (see object doc).
    */
  def kthSmallestLong(df: DataFrame, colName: String, k: Long,
                      buckets: Int = 4096): Long = {
    require(buckets >= 2, "need at least 2 histogram buckets")
    val base = df.select(col(colName).cast("long").as("x"))
      .where(col("x").isNotNull)
    val head = base.agg(min(col("x")), max(col("x")), count(lit(1))).head()
    val n = head.getLong(2)
    require(k >= 1 && k <= n, s"k=$k out of range [1, $n]")
    var lo = head.getLong(0)
    var hi = head.getLong(1)
    var kk = k
    while (hi > lo) {
      // BigInt width arithmetic: (hi - lo) overflows Long when the data
      // spans more than half the 64-bit domain
      val width = (((BigInt(hi) - BigInt(lo)) / buckets) + 1).toLong
      val hist = base
        .where(col("x") >= lo && col("x") <= hi)
        .groupBy(call_function("div", col("x") - lit(lo), lit(width)).as("b"))
        .agg(count(lit(1)).as("c"))
        .orderBy("b")
        .collect() // ≤ `buckets` rows by construction
      var i = 0
      var chosen = -1L
      while (i < hist.length && chosen < 0) {
        val c = hist(i).getLong(1)
        if (kk > c) { kk -= c; i += 1 } else chosen = hist(i).getLong(0)
      }
      // kk ≤ in-range count by the loop invariant, so a bin is always found
      val newLo = lo + chosen * width
      lo = newLo
      hi = math.min(hi, newLo + width - 1)
    }
    lo
  }

  /** Exact discrete quantile (numpy `interpolation='lower'`): the value
    * at 0-based index ⌊(n−1)·q⌋ of the sorted column. q ∈ [0, 1]. */
  def exactQuantileLong(df: DataFrame, colName: String, q: Double,
                        buckets: Int = 4096): Long = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0, 1]")
    val n = df.where(col(colName).isNotNull).count()
    require(n > 0, "exactQuantileLong on an empty column")
    kthSmallestLong(df, colName, math.floor((n - 1) * q).toLong + 1, buckets)
  }

  /** Keep the rows whose `colName` ≤ the exact global `q`-quantile —
    * "drop the longest/worst (1−q) tail" with an oracle-exact boundary.
    * One quantile computation (≤6 narrow scans) + one pushed-down
    * filter; the threshold is a literal, so the plan stays a plain
    * codegen'd scan-filter with parquet min/max pruning. */
  def keepBelowQuantile(df: DataFrame, colName: String, q: Double): DataFrame = {
    val thr = exactQuantileLong(df, colName, q)
    df.where(col(colName) <= lit(thr))
  }
}
