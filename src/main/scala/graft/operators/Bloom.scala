package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter pre-filtering — the 100 TB decontamination/dedup
  * accelerator. An exact hash join against a benchmark/corpus ships the
  * corpus key set through a shuffle; a Bloom filter compresses that set
  * to a few MB of bits that BROADCAST to every executor, so the bulk of
  * clean rows drop in a narrow scan-side filter and only possible
  * matches reach the exact join. False positives → a few extra rows
  * verified exactly; false negatives → none, by construction, so nothing
  * is ever missed. (Spark uses the same machinery internally for runtime
  * row-level filtering; the expressions are not SQL-registered, hence
  * the direct Catalyst construction.)
  */
object Bloom {

  /** Aggregate a column of xxhash64 values into a serialized Bloom filter
    * (one binary cell). */
  def bloomAgg(hash: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      GraftBridge.expression(hash),
      GraftBridge.expression(lit(expectedItems)),
      GraftBridge.expression(lit(numBits))).toAggregateExpression())

  /** Membership probe against a serialized Bloom filter column. */
  def mightContain(bloom: Column, hash: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(bloom),
      GraftBridge.expression(hash)))

  /** Keep only `incoming` rows whose `textCol` MIGHT appear verbatim in
    * `corpus` — a superset of the true matches (no false negatives).
    * Chain `.join(corpusHashes, …, "left_semi")` after it for exactness;
    * the bloom pass eliminates the bulk of rows before that join. */
  def prefilter(incoming: DataFrame, corpus: DataFrame, textCol: String,
                expectedItems: Long = 1000000L,
                bitsPerItem: Int = 20): DataFrame = {
    // might_contain requires the filter as a constant/scalar subquery —
    // .scalar() plans it as one, computed once and shipped to every task
    val bf = corpus.agg(bloomAgg(xxhash64(col(textCol)),
      expectedItems, expectedItems * bitsPerItem).as("__bf"))
    incoming.where(mightContain(bf.scalar(), xxhash64(col(textCol))))
  }
}
