package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Input-parallelism guard for explode-heavy narrow stages.
  *
  * A small parquet input (one file < the open-cost threshold) scans as a
  * SINGLE partition, so everything up to the first shuffle — shingle
  * explosion, hashing, map-side partial aggregation, i.e. the expensive part
  * of the signature operators — runs on one core. `widen` hash-repartitions
  * such inputs on the operator's id/group column to the cluster's
  * parallelism: downstream per-id aggregations then find their required
  * distribution already satisfied (no second exchange), and hash
  * partitioning avoids round-robin's mapper-side sort. It is a deliberate
  * NO-OP when the source already has enough partitions (the at-scale case:
  * thousands of file splits), so no extra shuffle is ever added for large
  * inputs.
  */
private[operators] object Par {
  def widen(df: DataFrame, key: String): DataFrame = {
    if (df.isStreaming) df
    else {
      val want = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions * 2 >= want) df
      else df.repartition(want, col(key))
    }
  }
}
