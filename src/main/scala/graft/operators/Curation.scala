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
    val quality =
      least(col("__len") / 500.0, lit(1.0)) * 0.25 +
      when(col("mean_tok_len").between(3.0, 10.0), 1.0).otherwise(0.5) * 0.25 +
      least(col("stopword_ratio") * 4.0, lit(1.0)) * 0.25 +
      (lit(1.0) - least(col("digit_ratio") * 2.0, lit(1.0))) * 0.25
    deduped.select(col("doc_id"), col("lang"),
        length(col("text")).cast("double").as("__len"))
      .join(st, "doc_id")
      .where(quality >= minQuality)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("token_est")).as("n_tokens"))
      .orderBy(col("lang"))
  }
}
