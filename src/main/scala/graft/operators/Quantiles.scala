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

  /** 0-based sorted index ⌊(n−1)·q⌋, computed in DECIMAL arithmetic: `q`
    * is interpreted at its shortest decimal representation (the number the
    * caller typed), so q=0.29, n=101 gives exactly 100·0.29 = 29 — double
    * multiplication yields 28.999999999999996 and floors one rank low,
    * diverging from any exact-rational oracle (round-8 advisory). */
  private def lowerIndex(n: Long, q: Double): Long =
    (BigDecimal(n - 1) * BigDecimal(q))
      .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong

  /** Exact discrete quantile (numpy `interpolation='lower'`): the value
    * at 0-based index ⌊(n−1)·q⌋ of the sorted column (index in decimal
    * arithmetic — see [[lowerIndex]]). q ∈ [0, 1]. */
  def exactQuantileLong(df: DataFrame, colName: String, q: Double,
                        buckets: Int = 4096): Long = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0, 1]")
    val n = df.where(col(colName).isNotNull).count()
    require(n > 0, "exactQuantileLong on an empty column")
    kthSmallestLong(df, colName, lowerIndex(n, q) + 1, buckets)
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
    kthSmallestDouble(df, colName, lowerIndex(n, q) + 1, buckets)
  }

  /** Instrumentation from the last [[groupedExactQuantiles]] run on this
    * thread: refinement passes executed and the largest driver collect
    * (rows) of any pass — the numbers the bounded-state contract is about
    * (passes ≤ ⌈64/log₂ buckets⌉, collect ≤ activeTasks·buckets). */
  final case class GroupedSelectionStats(passes: Int, maxCollectedRows: Long,
                                         tasks: Int)
  private val lastStats = new ThreadLocal[GroupedSelectionStats]
  def lastGroupedStats: Option[GroupedSelectionStats] = Option(lastStats.get)

  /** Exact INTERPOLATED per-group quantiles (SQL `quantile_cont`
    * semantics: value at fractional index h = (n−1)·q, linear between
    * the two neighboring order statistics) with BOUNDED executor state —
    * the grouped complement of the global histogram selection above.
    *
    * Spark's exact `percentile` aggregate buffers EVERY group value in
    * one aggregation buffer: correct when groups are small, unbounded
    * executor state when one group holds a large corpus slice. This
    * runs the same iterative histogram refinement as [[kthSmallestLong]]
    * for ALL (group, rank) targets SIMULTANEOUSLY: each pass joins the
    * corpus against a broadcast #tasks-row range table, aggregates
    * per-(task, bin) counts (hash-agg state ≤ tasks·buckets entries —
    * executor memory independent of group sizes), and the driver narrows
    * each task's candidate range. ≤ ⌈64/log₂ buckets⌉ passes total
    * because every active range shrinks ×buckets per pass.
    *
    * Posture: built for FEW groups × UNBOUNDED group sizes (quality
    * tiers, sources, language buckets — the curation shapes). Driver
    * state is O(#groups · #qs), so a million-group column belongs in the
    * built-in `percentile` (many small groups) instead; the two are
    * complementary and documented as such at the dialect surface.
    *
    * Output: one row per group — `keyCol`, one DOUBLE column per
    * (name, q) in `qs`, and `n` (non-null count). Groups whose values
    * are all NULL keep NULL quantiles. Values are read as LONG (ints);
    * interpolation is decimal-exact in the index ([[lowerIndex]]) and
    * double in the value — matching `quantile_cont` on both engines. */
  def groupedExactQuantiles(df: DataFrame, keyCol: String, valCol: String,
                            qs: Seq[(String, Double)],
                            buckets: Int = 4096): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    qs.foreach { case (n, q) =>
      require(q >= 0.0 && q <= 1.0, s"quantile $n=$q out of [0, 1]") }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val keyField = df.schema(df.schema.fieldIndex(keyCol))
    val base = df.select(col(keyCol).as("k"), col(valCol).cast("long").as("x"))

    // one pass: per-group n/min/max — #groups rows to the driver (the
    // documented model-sized bound of this operator)
    val head = base.groupBy(col("k"))
      .agg(count(col("x")).as("n"), min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect()

    // (group, 1-based rank) targets, deduped: quantile h = (n−1)·q needs
    // ranks ⌊h⌋+1 and (if fractional) ⌊h⌋+2
    final case class Task(id: Long, key: Any, var lo: Long, var hi: Long,
                          var kk: Long)
    val tasks = scala.collection.mutable.ArrayBuffer.empty[Task]
    // per group: key → (n, Map[rank → taskIdx])
    val groups = head.map { r =>
      val key = r.get(0)
      val n = r.getLong(1)
      val ranks = scala.collection.mutable.Map.empty[Long, Int]
      if (n > 0) {
        val lo0 = r.getLong(2); val hi0 = r.getLong(3)
        qs.foreach { case (_, q) =>
          val h = (BigDecimal(n - 1) * BigDecimal(q))
          val kLo = h.setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
          val need = if (h.isWhole) Seq(kLo + 1) else Seq(kLo + 1, kLo + 2)
          need.foreach { rk =>
            if (!ranks.contains(rk)) {
              ranks(rk) = tasks.length
              tasks += Task(tasks.length.toLong, key, lo0, hi0, rk)
            }
          }
        }
      }
      (key, n, ranks.toMap)
    }

    val taskSchema = StructType(Seq(
      StructField("tid", LongType, nullable = false),
      StructField("tk", keyField.dataType, nullable = true),
      StructField("tlo", LongType, nullable = false),
      StructField("thi", LongType, nullable = false),
      StructField("ts", IntegerType, nullable = false),
      StructField("tlob", LongType, nullable = false)))

    var passes = 0
    var maxCollected = 0L
    var active = tasks.filter(t => t.hi > t.lo)
    while (active.nonEmpty) {
      passes += 1
      val taskRows: java.util.List[Row] = new java.util.ArrayList[Row]
      val shifts = active.map { t =>
        var s = 0
        def bins(sh: Int): BigInt = (BigInt(t.hi) >> sh) - (BigInt(t.lo) >> sh)
        while (bins(s) >= buckets) s += 1
        taskRows.add(Row(t.id, t.key, t.lo, t.hi, s, t.lo >> s))
        (t.id, (s, t.lo >> s))
      }.toMap
      val taskDf = spark.createDataFrame(taskRows, taskSchema)
      val hist = base
        .join(broadcast(taskDf), base("k") <=> taskDf("tk"))
        .where(col("x").isNotNull && col("x") >= col("tlo") && col("x") <= col("thi"))
        // per-task shift/offset come from the broadcast row, so one scan
        // serves every task: bin = (x >> ts) − (lo >> ts), the same
        // overflow-free arithmetic-shift binning as selectKth
        .groupBy(col("tid"), (expr("shiftright(x, ts)") - col("tlob")).as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
      maxCollected = math.max(maxCollected, hist.length.toLong)
      val byTask = hist.groupBy(_.getLong(0))
      val stillActive = scala.collection.mutable.ArrayBuffer.empty[Task]
      active.foreach { t =>
        val (s, lob) = shifts(t.id)
        val binsSorted = byTask(t.id).map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
        var i = 0
        var chosen = -1L
        while (i < binsSorted.length && chosen < 0) {
          val (b, c) = binsSorted(i)
          if (t.kk > c) { t.kk -= c; i += 1 } else chosen = b
        }
        val binLo = (lob + chosen) << s
        t.lo = if (binLo > t.lo) binLo else t.lo
        t.hi = (BigInt(t.hi) min (BigInt(binLo) + (BigInt(1) << s) - 1)).toLong
        if (t.hi > t.lo) stillActive += t
      }
      active = stillActive
    }
    lastStats.set(GroupedSelectionStats(passes, maxCollected, tasks.length))

    // assemble: per group, interpolate each q from its resolved rank values
    val outSchema = StructType(
      keyField.copy(name = keyCol) +:
        qs.map { case (nm, _) => StructField(nm, DoubleType, nullable = true) } :+
        StructField("n", LongType, nullable = false))
    val outRows: java.util.List[Row] = new java.util.ArrayList[Row]
    groups.foreach { case (key, n, ranks) =>
      val vals: Seq[Any] = qs.map { case (_, q) =>
        if (n == 0) null
        else {
          val h = BigDecimal(n - 1) * BigDecimal(q)
          val kLo = h.setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
          val vLo = tasks(ranks(kLo + 1)).lo.toDouble
          if (h.isWhole) vLo
          else {
            val vHi = tasks(ranks(kLo + 2)).lo.toDouble
            val frac = (h - kLo).toDouble
            vLo + frac * (vHi - vLo)
          }
        }
      }
      outRows.add(Row.fromSeq(key +: vals :+ n))
    }
    spark.createDataFrame(outRows, outSchema)
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
