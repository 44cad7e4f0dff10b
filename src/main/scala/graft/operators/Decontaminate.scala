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
}
