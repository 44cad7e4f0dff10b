package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines (SURVEY §7.2 M4).
  * All three are narrow per-partition operations — no shuffle, no driver
  * involvement — so they scale linearly and compose under pushdown.
  *
  *  - [[bernoulli]]: seeded random sample (reproducible per Spark version;
  *    membership changes if the data is repartitioned);
  *  - [[stratified]]: per-stratum fractions (class rebalancing) via
  *    `df.stat.sampleBy`;
  *  - [[splitByHash]]: DETERMINISTIC content-addressed split — membership
  *    depends only on the key value (xxhash64 bucket), so train/test
  *    assignment is stable across runs, partitionings, Spark versions and
  *    cluster sizes, and rows never migrate between splits when the
  *    corpus grows. The standard way to cut held-out sets at 100 TB.
  */
object Sampling {

  /** Seeded Bernoulli sample of `fraction` (0..1). */
  def bernoulli(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(fraction, seed)

  /** Per-stratum sampling: `fractions` maps a stratum value of `col` to
    * its keep-fraction (absent strata keep nothing). */
  def stratified(df: DataFrame, col: String, fractions: Map[Any, Double],
                 seed: Long = 42L): DataFrame =
    df.stat.sampleBy(col, fractions, seed)

  /** Bucket 0..99 for a key — the split predicate building block. */
  def hashBucket(key: Column, seed: Long = 0L): Column =
    pmod(xxhash64(key, lit(seed)), lit(100L))

  /** Deterministic split column: rows with bucket < `testPercent` are
    * "test", the rest "train". Returns df + a `split` column. */
  def splitByHash(df: DataFrame, keyCol: String, testPercent: Int,
                  seed: Long = 0L): DataFrame = {
    require(testPercent >= 0 && testPercent <= 100, "testPercent in [0,100]")
    df.withColumn("split",
      when(hashBucket(col(keyCol), seed) < testPercent, "test").otherwise("train"))
  }

  /** Leakage-safe split: train/test membership is decided per duplicate
    * FAMILY, not per row — two copies of the same document can never
    * straddle the split boundary, the classic eval-contamination bug
    * that [[splitByHash]] on ids permits. Families default to exact text
    * identity (min-id representative, grouped on the 64-bit text hash —
    * the [[graft.operators.Dedup.exact]] exchange; the x44 collision
    * argument applies). Callers holding NEAR-dup clusters pass their own
    * (id, rep) frame — e.g. `clusterNearDuplicates` components — and get
    * the same guarantee at the cluster level.
    *
    * The split hash is the engine-portable multiplicative hash on the
    * representative id, pre-bounded with pmod so it can never overflow
    * at any id scale (ANSI mode would error): assignment is
    * content-addressed, stable as the corpus grows, and exactly
    * recomputable by the DuckDB oracle (x92 hash-matches the full
    * (id, rep, split) assignment, not just counts).
    *
    * Scale: one keyed hash shuffle (family agg) + one same-key join
    * back. Output: (id, rep, split). */
  def leakageSafeSplit(df: DataFrame, textCol: String, idCol: String,
                       testPercent: Int,
                       families: Option[DataFrame] = None): DataFrame = {
    require(testPercent >= 0 && testPercent <= 100, "testPercent in [0,100]")
    val fam = families match {
      case Some(f) =>
        // cluster maps (first two columns = member id, family label —
        // e.g. connectedComponents' (id, comp)) usually cover only the
        // CLUSTERED rows; uncovered rows default to their own family
        require(f.columns.length >= 2,
          s"families needs (id, rep) columns, got ${f.columns.mkString(", ")}")
        val fr = f.select(col(f.columns(0)).as("id"), col(f.columns(1)).as("rep"))
        df.select(col(idCol).as("id"))
          .join(fr, Seq("id"), "left")
          .select(col("id"), coalesce(col("rep"), col("id")).as("rep"))
      case None =>
        val keyed = df.select(col(idCol).as("id"),
          xxhash64(col(textCol)).as("__fh"))
        keyed.join(
          keyed.groupBy(col("__fh")).agg(min(col("id")).as("rep")), "__fh")
          .select(col("id"), col("rep"))
    }
    // ((rep mod 10^6) * 2654435761) mod 10^6 — bounded before the
    // multiply (max product ~2.7e15 << 2^63), identical in DuckDB
    val bucket = pmod(pmod(col("rep"), lit(1000000L)) * lit(2654435761L),
      lit(1000000L))
    fam.select(col("id"), col("rep"),
      when(bucket < testPercent * 10000L, "test").otherwise("train")
        .as("split"))
  }

  /** Cap rows per group (per-domain/per-source caps — the RefinedWeb/C4
    * trick against one domain dominating a crawl): keep the first `cap`
    * rows of each `groupCol` value in `orderCol` order (ties broken by
    * `orderCol` itself being unique, or deterministically by value).
    *
    * Scale: one hash shuffle on the group key; per-group state in the
    * window is a single counter. Hot groups (the reason this operator
    * exists) land on one partition each — for truly pathological skew,
    * pre-filter with an approximate count or salt, but at cap ≈ 10³-10⁶
    * rows per group the partition stays bounded by construction. */
  def capPerGroup(df: DataFrame, groupCol: String, cap: Int,
                  orderCol: String): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap).drop("__rn")
  }

  /** Uniform-without-replacement k-sample PER GROUP, content-addressed:
    * rows rank by `md5(key)` within their group and the first `cap` win.
    * Unlike [[capPerGroup]] (which keeps the FIRST k in key order — a
    * biased prefix), the md5 rank is a uniform pseudo-random permutation
    * of the group, yet fully deterministic: the same rows win across
    * runs, partitionings and cluster sizes, and the hash is md5-of-
    * decimal-string so external systems (the gate's DuckDB oracle, a
    * Python audit notebook) can recompute membership EXACTLY — the
    * per-group analog of [[mixture]]'s content addressing.
    *
    * Scale: one keyed window shuffle (partition by group); same hot-key
    * caveat as every per-group window — a single pathologically large
    * group serializes on one task; salt-split such groups upstream. */
  def uniformPerGroup(df: DataFrame, groupCol: String, cap: Int,
                      keyCol: String): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap).drop("__rn")
  }

  /** Weighted corpus mixture: keep each row of source s with probability
    * `weights(s)` (sources absent from the map drop entirely). Membership
    * is content-addressed (xxhash64 of the key), NOT random: the same row
    * keeps or drops identically across runs, partitionings and cluster
    * sizes — re-running a 100 TB mixture job is a no-op diff. This is the
    * deterministic down-sampling half of training-mixture building; use
    * UNION ALL of per-corpus mixtures for multi-corpus blends. */
  def mixture(df: DataFrame, sourceCol: String, keyCol: String,
              weights: Map[String, Double], seed: Long = 0L): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 1), "weights in [0,1]")
    val million = 1000000L
    // per-source threshold over a 10^6 hash space; seed offsets the space
    // so different mixtures draw independent subsets
    val thr = weights.foldLeft(lit(-1L)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit((w * million).toLong)).otherwise(acc)
    }
    df.where(pmod(xxhash64(col(keyCol), lit(seed)), lit(million)) < thr)
  }

  /** Deterministic global shuffle: a stable pseudo-random permutation
    * `pos` ∈ [0, n) ordered by xxhash64(key, seed) — how training data is
    * order-randomized without RNG state (re-runs give byte-identical
    * shards; changing `seed` gives an independent permutation).
    *
    * Scale: one global sort (range partitioning). That is the inherent
    * cost of a total order; at 100 TB prefer writing the hash column and
    * range-partitioning the WRITE (`df.repartitionByRange(shuffle_key)`)
    * so no single reducer sees the full order. The `pos` column (zip of
    * the sorted order) is what sequence-packing and shard-slicing key on. */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(xxhash64(col(keyCol), lit(seed)), col(keyCol))
    df.withColumn("pos", row_number().over(w).cast("long") - 1)
  }

  /** Temperature-scaled mixture (the multilingual/multi-source sampling
    * rule from multilingual-LM training: p_g ∝ n_g^T, T < 1 upsampling
    * rare groups relative to their natural share). Keeps the first
    * `floor(frac · N · n_g^T / Σ n^T)` rows of each group (min 1) in
    * `orderCol` order — fully deterministic, no RNG.
    *
    * Scale: group counts are one hash aggregate (tiny — one row per
    * group) broadcast back; the keep-filter is one windowed counter per
    * group, same shape as [[capPerGroup]]. */
  def temperatureMix(df: DataFrame, groupCol: String, orderCol: String,
                     frac: Double, temperature: Double = 0.5): DataFrame = {
    require(frac > 0 && frac <= 1, "frac in (0,1]")
    require(temperature > 0, "temperature must be positive")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__ng"))
    val totals = counts.agg(
      sum(col("__ng")).as("__n"),
      sum(pow(col("__ng").cast("double"), temperature)).as("__z"))
    // the share is rounded (6 dp) before flooring so sum-order ulp noise
    // in Σ n^T cannot flip a target across an integer boundary between
    // runs (or against a recomputing oracle)
    val targets = counts.crossJoin(broadcast(totals))
      .select(col(groupCol),
        greatest(lit(1L), floor(round(lit(frac) * col("__n") *
          pow(col("__ng").cast("double"), temperature) / col("__z"), 6)).cast("long"))
          .as("__target"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(targets), Seq(groupCol))
      .where(col("__rn") <= col("__target"))
      .drop("__rn", "__target")
  }

  /** Fractional-epoch upsampling: every row of group g appears
    * `floor(e_g)` times, plus once more for a deterministic
    * `frac(e_g)`-share of rows chosen by a content-addressed hash of the
    * id — "2.3 epochs" = 2 full copies + a stable 30% third copy,
    * reproducible across runs, partitionings and cluster sizes (the same
    * content-addressing property as [[mixture]]). Adds an `epoch` column
    * (1-based copy index) usable as a shuffle salt downstream; rows whose
    * group has e < 1 and that miss the fractional draw are dropped.
    * One narrow explode — no shuffle, no RNG.
    *
    * `selector` maps the id column to a uniform value in [0, 1e6); the
    * default is xxhash64. Gates pass a multiplicative-hash selector that
    * an external SQL engine recomputes exactly. */
  def epochExpand(df: DataFrame, groupCol: String, idCol: String,
                  epochs: Map[String, Double],
                  selector: Column => Column =
                    c => pmod(xxhash64(c, lit(42L)), lit(1000000L))): DataFrame = {
    require(epochs.values.forall(_ >= 0), "epoch weights must be >= 0")
    // unlisted groups default to one epoch (pass-through)
    val e = epochs.foldLeft(lit(1.0)) { case (acc, (g, w)) =>
      when(col(groupCol) === lit(g), lit(w)).otherwise(acc) }
    val whole = floor(e).cast("long")
    val frac = e - floor(e)
    val extra = when(selector(col(idCol)).cast("double") < frac * 1000000.0, 1L)
      .otherwise(0L)
    val copies = whole + extra
    df.withColumn("epoch",
        explode(when(copies >= 1, sequence(lit(1L), copies))
          .otherwise(array().cast("array<bigint>"))))
  }
}
