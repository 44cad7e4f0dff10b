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
}
