package graft.operators

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gate wiring for the M4 extension operators (SURVEY §7.2):
  * one `queries` entry per operator, DuckDB oracles where the semantics
  * are ANSI-SQL-expressible, rows-only checks for hash-seeded operators
  * (xxhash64 has no DuckDB equivalent).
  */
object Extensions {

  private def docs(s: SparkSession, d: String): DataFrame =
    GraftSession.forDir(s, d).catalog.relation("documents")
  private def emb(s: SparkSession, d: String): DataFrame =
    GraftSession.forDir(s, d).catalog.relation("embeddings")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dedup ----
    "x01_dedup_exact" -> ((s, d) =>
      Dedup.exact(docs(s, d), Seq("text"), "doc_id")
        .select(col("doc_id").as("keep_id")).orderBy("keep_id")),
    "x02_dedup_exact_hash" -> ((s, d) =>
      Dedup.exactByHash(docs(s, d), "text", "doc_id")
        .select(col("doc_id").as("keep_id")).orderBy("keep_id")),
    "x03_dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashCandidates(docs(s, d), "text", "doc_id", threshold = 0.5)
        .orderBy("ida", "idb")),
    "x04_dedup_simhash" -> ((s, d) =>
      Dedup.simhashCandidates(docs(s, d), "text", "doc_id", maxHamming = 3)
        .orderBy("ida", "idb")),
    "x05_dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.nearDuplicates(docs(s, d), "text", "doc_id", threshold = 0.8)
        .orderBy("ida", "idb")),
    "x06_dedup_embed_cosine" -> ((s, d) =>
      Dedup.embeddingNearDup(emb(s, d), "embedding", "vec_id", minCos = 0.4)
        .orderBy("ida", "idb")),
    // ---- similarity search ----
    "x07_sim_brute_topk" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 10), k = 5)
        .orderBy(col("qid"), col("cos").desc, col("vec_id"))
    }),
    "x08_sim_lsh_topk" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.lshTopK(e, e.where(col("vec_id") < 10), k = 5)
        .orderBy(col("qid"), col("cos").desc, col("vec_id"))
    }),
    // ---- text analysis ----
    "x09_text_stats" -> ((s, d) =>
      TextAnalysis.stats(docs(s, d), "text", "doc_id").orderBy("doc_id")),
    "x10_text_quality" -> ((s, d) =>
      TextAnalysis.quality(docs(s, d), "text", "doc_id")
        .select(col("doc_id"), round(col("quality"), 6).as("quality"))
        .orderBy("doc_id")),
    "x11_text_langid" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), col("lang"))
        .join(TextAnalysis.langIdDF(docs(s, d), "text", "doc_id"), "doc_id")
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")),
    "x12_text_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprintDF(docs(s, d), "text", "doc_id")
        .orderBy("doc_id")),
    // ---- multimodal ----
    "x13_mm_decode" -> ((s, d) =>
      Multimodal.decode(Multimodal.synthesize(docs(s, d))).toDF()
        .select("media_id", "mime", "width", "height", "channels", "ok")
        .orderBy("media_id")),
    "x14_mm_frames" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.synthesize(docs(s, d)))
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
        .orderBy("media_id")),
    // tf-idf restricted to a doc slice so the gate output stays bounded
    "x17_text_tfidf" -> ((s, d) =>
      TextAnalysis.tfidf(docs(s, d), "text", "doc_id")
        .where(col("id") < 20).orderBy("id", "term")),
    "x16_sim_ivf_topk" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.ivfTopK(e, e.where(col("vec_id") < 10), k = 5, iters = 1)
        .orderBy(col("qid"), col("cos").desc, col("vec_id"))
    }),
    // ---- end-to-end curation pipeline (dedup → quality → token budget) ----
    "x15_curation" -> ((s, d) => Curation.curate(docs(s, d), minQuality = 0.5)),
    // ---- sampling: dialect TABLESAMPLE (tolerance flag — Bernoulli draws
    // differ across engines, the FLAG is deterministic) ----
    "x18_sample_dialect" -> ((s, d) =>
      GraftSession.forDir(s, d).sql(
        "select case when s.n > 0.07 * t.n and s.n < 0.13 * t.n then 1 else 0 end as ok " +
        "from (select count(*) as n from lineitem sample (10 percent) seed 42) as s " +
        "cross join (select count(*) as n from lineitem) as t")),
    // ---- deterministic train/test split: every row lands in one of the
    // two splits and the test fraction is near the requested 10% — both
    // engine-checkable as flags, one narrow pass ----
    "x19_split_by_hash" -> ((s, d) => {
      val split = Sampling.splitByHash(docs(s, d), "doc_id", testPercent = 10)
      val testN = sum(when(col("split") === "test", 1L).otherwise(0L))
      split.agg(
        (count_distinct(col("split")) <= 2 &&
          sum(when(col("split").isin("test", "train"), 1L).otherwise(0L)) === count(lit(1)))
          .cast("int").as("covers_all"),
        (testN * 100 > count(lit(1)) * 2 && testN * 100 < count(lit(1)) * 20)
          .cast("int").as("test_in_range"))
    })
  )

  /** DuckDB lambda syntax for the stopword-hit count used twice below. */
  private val swList =
    "['the','a','an','and','or','of','to','in','is','it','that','was','for','on','with','as','at','by','be','this']"
  private def duckTokens(t: String) = s"regexp_split_to_array(trim($t), '\\s+')"
  private def duckTokCount(t: String) =
    s"CASE WHEN length(trim($t)) = 0 THEN 0 ELSE len(${duckTokens(t)}) END"
  private def duckStopHits(t: String) =
    s"len(list_filter(regexp_split_to_array(lower(trim($t)), '\\s+'), x -> list_contains($swList, x)))"

  def oracles: Map[String, String] = {
    val t = "text"
    val nTok = duckTokCount(t)
    val digitR = s"CASE WHEN length($t) = 0 THEN 0.0 ELSE CAST(length(regexp_replace($t, '[^0-9]', '', 'g')) AS DOUBLE) / length($t) END"
    val alphaR = s"CASE WHEN length($t) = 0 THEN 0.0 ELSE CAST(length(regexp_replace($t, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length($t) END"
    val meanTok = s"CASE WHEN $nTok = 0 THEN 0.0 ELSE CAST(length(regexp_replace($t, '\\s', '', 'g')) AS DOUBLE) / $nTok END"
    val swRatio = s"CASE WHEN $nTok = 0 THEN 0.0 ELSE CAST(${duckStopHits(t)} AS DOUBLE) / $nTok END"
    // Mirrors TextAnalysis.quality exactly: the component ratios are the
    // ROUND(..., 6) values stats() emits, so threshold comparisons cannot
    // diverge between engines.
    val qualityExpr =
      s"(LEAST(CAST(length($t) AS DOUBLE) / 500.0, 1.0) * 0.25 + " +
      s"(CASE WHEN ROUND($meanTok, 6) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.25 + " +
      s"LEAST(ROUND($swRatio, 6) * 4.0, 1.0) * 0.25 + " +
      s"(1.0 - LEAST(ROUND($digitR, 6) * 2.0, 1.0)) * 0.25)"
    Map(
      "x01_dedup_exact" ->
        "SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY text ORDER BY keep_id",
      "x02_dedup_exact_hash" ->
        "SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY text ORDER BY keep_id",
      // x03..x06, x08, x12: xxhash64-seeded / approximate → rows-only check
      "x07_sim_brute_topk" -> (
        "WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10), " +
        "s AS (SELECT q.qid, e.vec_id, " +
        "(SELECT SUM(x*y) FROM (SELECT UNNEST(CAST(e.embedding AS DOUBLE[])) AS x, UNNEST(CAST(q.qv AS DOUBLE[])) AS y)) AS dp, " +
        "sqrt((SELECT SUM(x*x) FROM (SELECT UNNEST(CAST(e.embedding AS DOUBLE[])) AS x))) AS na, " +
        "sqrt((SELECT SUM(y*y) FROM (SELECT UNNEST(CAST(q.qv AS DOUBLE[])) AS y))) AS nb " +
        "FROM embeddings e, q WHERE e.vec_id <> q.qid) " +
        "SELECT qid, vec_id, cos FROM (SELECT qid, vec_id, ROUND(dp / (na * nb), 4) AS cos, " +
        "row_number() OVER (PARTITION BY qid ORDER BY ROUND(dp / (na * nb), 4) DESC, vec_id) AS rn FROM s) " +
        "WHERE rn <= 5 ORDER BY qid, cos DESC, vec_id"),
      "x09_text_stats" -> (
        s"SELECT doc_id, $nTok AS n_tokens, " +
        s"CASE WHEN length(trim($t)) = 0 THEN 0 ELSE CAST((SELECT SUM(CAST(CEIL(CAST(length(w) AS DOUBLE) / 4.0) AS BIGINT)) FROM (SELECT UNNEST(${duckTokens(t)}) AS w)) AS BIGINT) END AS token_est, " +
        s"ROUND($digitR, 6) AS digit_ratio, ROUND($alphaR, 6) AS alpha_ratio, " +
        s"ROUND($meanTok, 6) AS mean_tok_len, ROUND($swRatio, 6) AS stopword_ratio " +
        "FROM documents ORDER BY doc_id"),
      "x10_text_quality" -> (
        s"SELECT doc_id, ROUND($qualityExpr, 6) AS quality " +
        "FROM documents ORDER BY doc_id"),
      "x15_curation" -> (
        "WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text), " +
        "d AS (SELECT doc.* FROM documents doc JOIN keep USING (doc_id)) " +
        s"SELECT lang, COUNT(*) AS n_docs, CAST(SUM(token_est) AS BIGINT) AS n_tokens FROM " +
        s"(SELECT lang, $qualityExpr AS quality, " +
        s"CASE WHEN length(trim($t)) = 0 THEN 0 ELSE CAST((SELECT SUM(CAST(CEIL(CAST(length(w) AS DOUBLE) / 4.0) AS BIGINT)) FROM (SELECT UNNEST(${duckTokens(t)}) AS w)) AS BIGINT) END AS token_est " +
        "FROM d) WHERE quality >= 0.5 GROUP BY lang ORDER BY lang"),
      "x13_mm_decode" -> (
        "SELECT doc_id AS media_id, " +
        "CASE WHEN doc_id % 3 = 0 THEN 'image/png' WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime, " +
        "CAST(64 + (octet_length(encode(text)) % 960) AS INTEGER) AS width, " +
        "CAST(64 + ((octet_length(encode(text)) * 31) % 960) AS INTEGER) AS height, " +
        "CAST(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END AS INTEGER) AS channels, " +
        "octet_length(encode(text)) > 0 AS ok " +
        "FROM documents ORDER BY media_id"),
      "x17_text_tfidf" -> (
        "WITH toks AS (SELECT doc_id AS id, UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term FROM documents), " +
        "tf AS (SELECT id, term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY id, term), " +
        "dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), " +
        "n AS (SELECT COUNT(*) AS n FROM documents) " +
        "SELECT id, term, tf, ROUND(tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 6) AS tfidf " +
        "FROM tf JOIN dfreq USING (term) CROSS JOIN n WHERE id < 20 ORDER BY id, term"),
      "x14_mm_frames" -> (
        "SELECT doc_id AS media_id, CAST(LEAST(4, octet_length(encode(text))) AS BIGINT) AS n_frames " +
        "FROM documents WHERE octet_length(encode(text)) > 0 ORDER BY media_id"),
      "x18_sample_dialect" -> "SELECT CAST(1 AS BIGINT) AS ok",
      "x19_split_by_hash" ->
        "SELECT CAST(1 AS INTEGER) AS covers_all, CAST(1 AS INTEGER) AS test_in_range"
    )
  }
}
