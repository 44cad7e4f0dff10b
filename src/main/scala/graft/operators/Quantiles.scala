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
                      buckets: Int = 4096): Long =
    selectKth(df.select(col(colName).cast("long").as("x")), k, buckets)

  /** Exact k-th smallest (1-based, nulls excluded, `Double.compare`
    * order: -0.0 < +0.0, NaN last) value of a float/double column. The
    * column is mapped through the order-preserving IEEE bit trick
    * ([[graft.expr.DoubleSortableBits]], codegen'd), selected exactly as
    * a long, and mapped back — same ≤6-narrow-scan cost, no sort. */
  def kthSmallestDouble(df: DataFrame, colName: String, k: Long,
                        buckets: Int = 4096): Double =
    graft.expr.DoubleSortableBits.inverse(
      selectKth(df.select(
        graft.expr.DoubleSortableBits.column(col(colName).cast("double")).as("x")),
        k, buckets))

  /** Histogram-refinement selection over a single-LONG-column frame. */
  private def selectKth(raw: DataFrame, k: Long, buckets: Int): Long = {
    require(buckets >= 2, "need at least 2 histogram buckets")
    val base = raw.where(col("x").isNotNull)
    val head = base.agg(min(col("x")), max(col("x")), count(lit(1))).head()
    val n = head.getLong(2)
    require(k >= 1 && k <= n, s"k=$k out of range [1, $n]")
    var lo = head.getLong(0)
    var hi = head.getLong(1)
    var kk = k
    while (hi > lo) {
      // Power-of-two bins assigned by ARITHMETIC SHIFT, not subtraction:
      // `x - lo` overflows Long (ANSI error) whenever the candidate range
      // spans more than half the 64-bit domain — routine for
      // sortable-bits-mapped doubles (±1e300 ⇒ nearly the full domain).
      // `(x >> s) − (lo >> s)` is overflow-free for any s ≥ 1 (both
      // operands fit in 63−s bits) and equals floor division by 2^s.
      var s = 0
      def bins(sh: Int): BigInt = (BigInt(hi) >> sh) - (BigInt(lo) >> sh)
      while (bins(s) >= buckets) s += 1
      val lob = lo >> s
      val hist = base
        .where(col("x") >= lo && col("x") <= hi)
        .groupBy((shiftright(col("x"), s) - lit(lob)).as("b"))
        .agg(count(lit(1)).as("c"))
        .orderBy("b")
        .collect() // < `buckets` rows by construction
      var i = 0
      var chosen = -1L
      while (i < hist.length && chosen < 0) {
        val c = hist(i).getLong(1)
        if (kk > c) { kk -= c; i += 1 } else chosen = hist(i).getLong(0)
      }
      // kk ≤ in-range count by the loop invariant, so a bin is always
      // found; the bin holds [binLo, binLo + 2^s − 1] ∩ [lo, hi], a
      // strict sub-range (the chosen s always yields ≥ 2 bins)
      val binLo = (lob + chosen) << s
      lo = if (binLo > lo) binLo else lo
      hi = (BigInt(hi) min (BigInt(binLo) + (BigInt(1) << s) - 1)).toLong
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

  /** Exact discrete quantile of a float/double column (same numpy
    * 'lower' index convention as [[exactQuantileLong]]). */
  def exactQuantileDouble(df: DataFrame, colName: String, q: Double,
                          buckets: Int = 4096): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0, 1]")
    val n = df.where(col(colName).isNotNull).count()
    require(n > 0, "exactQuantileDouble on an empty column")
    kthSmallestDouble(df, colName, math.floor((n - 1) * q).toLong + 1, buckets)
  }

  /** Keep the rows whose `colName` ≥ the exact global (1−frac)-quantile
    * — "keep the best ~frac of the corpus by score", the selection step
    * of score-and-filter curation (quality models, DSIR importance
    * weights). Boundary ties are kept, so the fraction is a floor, not
    * an exact count; the threshold is EXACT, so the kept set is
    * reproducible and oracle-checkable. */
  def keepTopFraction(df: DataFrame, colName: String, frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"fraction $frac out of (0, 1]")
    val thr = exactQuantileDouble(df, colName, 1.0 - frac)
    df.where(col(colName) >= lit(thr))
  }
}
