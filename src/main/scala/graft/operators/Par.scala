package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for explode-heavy narrow stages.
  *
  * A small parquet input (one file < maxPartitionBytes) scans as a SINGLE
  * partition, so everything up to the first shuffle — shingle explosion,
  * hashing, map-side partial aggregation, i.e. the expensive part of the
  * signature operators — runs on one core. `widen` repartitions such inputs
  * to the cluster's parallelism. It is a deliberate NO-OP when the source
  * already has enough partitions (the 100 TB case: thousands of file
  * splits), so no extra shuffle is ever added at scale; only small inputs
  * pay one (tiny) round-robin shuffle to unlock every core.
  */
private[operators] object Par {
  def widen(df: DataFrame): DataFrame = {
    if (df.isStreaming) df
    else {
      val want = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions * 2 >= want) df else df.repartition(want)
    }
  }
}
