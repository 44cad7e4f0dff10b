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
    val scored = TextAnalysis.quality(deduped, "text", "doc_id")
    val stats = TextAnalysis.stats(deduped, "text", "doc_id")
      .select(col("doc_id"), col("token_est"))
    deduped.select(col("doc_id"), col("lang"))
      .join(scored, "doc_id")
      .join(stats, "doc_id")
      .where(col("quality") >= minQuality)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("token_est")).as("n_tokens"))
      .orderBy(col("lang"))
  }
}
