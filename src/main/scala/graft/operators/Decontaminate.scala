package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora (SURVEY §7.2 M4):
  * flag training documents that share word w-shingles with an evaluation/
  * benchmark set, so test data can be removed from pretraining corpora.
  *
  * Scale design (the 100 TB contract):
  *  - shingles explode narrowly ([[Dedup.shingleRows]] — codegen, rows stay
  *    in their scan partition);
  *  - the join ships 64-bit xxhash64 shingle keys, never shingle strings;
  *  - the benchmark side (small by definition) is distinct-reduced first
  *    and broadcasts below the threshold — the corpus never re-shuffles
  *    beyond the one groupBy(id) with map-side partial aggregation.
  */
object Decontaminate {

  /** Distinct contaminated-shingle count per training doc (≥ `minHits`).
    * Returns (id, hits) for flagged docs only. */
  def overlap(train: DataFrame, bench: DataFrame, textCol: String,
              idCol: String, w: Int = 8, minHits: Int = 1): DataFrame = {
    val t = Dedup.shingleRows(train, textCol, idCol, w)
      .select(col("id"), xxhash64(col("sh")).as("h")).distinct()
    val b = Dedup.shingleRows(bench, textCol, idCol, w)
      .select(xxhash64(col("sh")).as("h")).distinct()
    t.join(b, Seq("h"))
      .groupBy(col("id")).agg(count(lit(1)).as("hits"))
      .where(col("hits") >= minHits)
  }

  /** The removal composition: training rows whose id is NOT flagged. */
  def clean(train: DataFrame, bench: DataFrame, textCol: String,
            idCol: String, w: Int = 8, minHits: Int = 1): DataFrame = {
    val flagged = overlap(train, bench, textCol, idCol, w, minHits)
      .select(col("id").as(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** The benchmark shingle hot set as 64-bit hashes — the batch-side
    * MODEL for [[applyClean]] (small by definition: the benchmark side). */
  def benchShingleHashes(bench: DataFrame, textCol: String, idCol: String,
                         w: Int = 8): DataFrame =
    Dedup.shingleRows(bench, textCol, idCol, w)
      .select(xxhash64(col("sh")).as("h")).distinct()

  /** Persist a [[benchShingleHashes]] hot set — the artifact behind
    * `CREATE MODEL … KIND 'shingles'`: one (h BIGINT) parquet directory,
    * served through [[applyClean]]. */
  def saveBenchShingles(hashes: DataFrame, path: String): Unit =
    ModelIO.saveColumnSet(hashes, path, "h", "long")

  /** Load a [[saveBenchShingles]] artifact (layout-validated). */
  def loadBenchShingles(spark: org.apache.spark.sql.SparkSession,
                        path: String): DataFrame =
    ModelIO.loadColumnSet(spark, path, "h", "long")

  /** STATELESS streaming decontamination — the hot-set discipline of the
    * streaming line/paragraph/span dedups applied to benchmark removal:
    * the benchmark's distinct shingle hashes broadcast as ONE sorted
    * array (8 bytes/entry), and each arriving doc counts its own distinct
    * shingles against it with the O(log |bench|) codegen binary search
    * (`SortedArrayContains`); docs reaching `minHits` drop. Row-at-a-time,
    * no state store, works identically on batch frames — parity with
    * [[clean]] is gated (x109). */
  def applyClean(docs: DataFrame, textCol: String, idCol: String,
                 benchHashes: DataFrame, w: Int = 8,
                 minHits: Int = 1): DataFrame = {
    val hotArr = broadcast(benchHashes.agg(
      sort_array(collect_list(col(benchHashes.columns.head)))
        .as("__dc_hotarr")))
    docs.join(hotArr, lit(true), "inner")
      .withColumn("__dc_hits",
        size(filter(array_distinct(Dedup.shingles(col(textCol), w)),
          s => graft.expr.SortedArrayContains(col("__dc_hotarr"),
            xxhash64(s)))).cast("long"))
      .where(col("__dc_hits") < minHits)
      .drop("__dc_hotarr", "__dc_hits")
  }
}
