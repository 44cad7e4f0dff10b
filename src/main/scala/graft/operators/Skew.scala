package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the 100 TB contract.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles most skew at runtime; explicit salting remains the
  * tool when one build-side key is hot enough that even a split partition
  * can't hold it, or when AQE is unavailable (streaming joins).
  */
object Skew {

  /** Salted equi-join: the (large, skewed) left side gets a random salt
    * in [0, buckets); the (smaller) right side is replicated `buckets`
    * times, so each hot key spreads over `buckets` reducers. Result equals
    * `left.join(right, keys, "inner")`.
    *
    * The salt uses a deterministic spray — hash of all left columns mod
    * buckets — not rand(), so retried tasks (speculative execution, stage
    * retry) salt identically and results stay exactly reproducible. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    val saltL = pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(buckets))
    val l = left.withColumn("__salt", saltL)
    val r = right
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Top key frequencies — the diagnostic for choosing `buckets`. */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
