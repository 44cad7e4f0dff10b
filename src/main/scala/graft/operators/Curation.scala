package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the composition the M4
  * operators exist for: exact-dedup → quality filter → token budgeting.
  * Each stage is an oracle-checkable relational step (one groupBy + one
  * join + narrow projections), so the whole pipeline is a single Catalyst
  * plan: scan once, shuffle twice (dedup key, final stats), no driver
  * round-trips.
  */
object Curation {

  /** Curate a document corpus:
    * 1. exact dedup on text (keep lowest id);
    * 2. drop docs below `minQuality` (TextAnalysis.quality formula);
    * 3. report per-language surviving doc count and token budget.
    * Output: (lang, n_docs, n_tokens) sorted by lang. */
  def curate(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val deduped = Dedup.exact(docs, Seq("text"), "doc_id")
    // ONE stats pass (the token explode+agg is the expensive stage); the
    // quality score derives from the stats columns — same rounded
    // components as TextAnalysis.quality, so the oracle mirror holds.
    val st = TextAnalysis.stats(deduped, "text", "doc_id")
    val quality = TextAnalysis.qualityFromStats(col("__len"),
      col("mean_tok_len"), col("stopword_ratio"), col("digit_ratio"))
    deduped.select(col("doc_id"), col("lang"),
        length(col("text")).cast("double").as("__len"))
      .join(st, "doc_id")
      .where(quality >= minQuality)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("token_est")).as("n_tokens"))
      .orderBy(col("lang"))
  }
}
