package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-9 scale proof (VERDICT r8 task #1): synthesize ~sf10 — 100× the
  * bench scale factor (sf0.1) — as 100 KEY-SHIFTED copies of sf0.1, and
  * sweep the heaviest gate families for ~linear growth. Extends the
  * [[ScaleGrowth]] (~sf1 = 10 copies) method; content is PERTURBED per
  * copy so the dup-rate / similarity PROFILE of the base corpus is
  * preserved at 100× the rows instead of manufacturing a 10⁴×-pair
  * content pathology:
  *
  *  - documents: every 3rd token gets a per-copy suffix → every 5-gram
  *    shingle spans ≥1 mutated token → cross-copy Jaccard ≈ 0.
  *  - embeddings: per-copy deterministic ±1 SIGN MASK (murmur3 of
  *    (copy, dim)) — unlike ScaleGrowth's rotate-by-i (which collides at
  *    ≥64 copies: rotations repeat mod dim, minting exact cross-copy
  *    twins), distinct masks keep unit norm and decorrelate cosine
  *    (E[cos] = 0 between copies), so ANN/near-dup candidate structure
  *    matches the base profile.
  *  - events: each copy shifts 31 days later — the timeline EXTENDS
  *    (~8.5 years) the way a real stream grows; per-user density constant.
  *
  * Perf posture only — no oracle at this scale; correctness is gated at
  * sf0.01. Run:
  *   `sbt -batch "Test/runMain graft.ScaleGrowth10 [outDir]"`
  * then sweep with
  *   `SPARK_GRAFT_SF_DIR=<outDir> SPARK_GRAFT_ONLY=<heavy gates>
  *    sbt -batch "runMain graft.Bench"` (ratios recorded in SCALE.md).
  */
object ScaleGrowth10 {
  def main(a: Array[String]): Unit = {
    val out = a.headOption.getOrElse("/tmp/sfsynth10")
    val spark = TestSpark.spark
    val src = GraftSession.forDir(spark, "/root/testdata/sf0.1")
    val copies = 100

    def maxOf(t: String, c: String): Long =
      src.catalog.relation(t).agg(max(col(c))).head().getAs[Number](0).longValue + 1

    val oK = maxOf("orders", "o_orderkey")
    val cK = maxOf("customer", "c_custkey")
    val pK = maxOf("part", "p_partkey")
    val sK = maxOf("supplier", "s_suppkey")
    val dK = maxOf("documents", "doc_id")
    val vK = maxOf("embeddings", "vec_id")
    val eK = maxOf("events", "event_id")
    val uK = maxOf("events", "user_id")

    def shifted(t: String, shifts: Map[String, Long]): DataFrame = {
      val base = src.catalog.relation(t)
      (0 until copies).map { i =>
        shifts.foldLeft(base) { case (df, (c, k)) =>
          df.withColumn(c, col(c) + lit(i * k))
        }
      }.reduce(_ union _)
    }

    def documents100: DataFrame = {
      val base = src.catalog.relation("documents")
      (0 until copies).map { i =>
        if (i == 0) base
        else base
          .withColumn("doc_id", col("doc_id") + lit(i * dK))
          .withColumn("text", array_join(
            transform(split(col("text"), " "),
              (w, j) => when(j % 3 === 0, concat(w, lit("~" + i))).otherwise(w)),
            " "))
          .withColumn("n_chars", length(col("text")))
      }.reduce(_ union _)
    }

    def embeddings100: DataFrame = {
      val base = src.catalog.relation("embeddings")
      (0 until copies).map { i =>
        if (i == 0) base
        else base
          .withColumn("vec_id", col("vec_id") + lit(i * vK))
          .withColumn("embedding",
            transform(col("embedding"),
              (v, j) => when(pmod(hash(lit(i), j), lit(2)) === 0, v).otherwise(-v)))
      }.reduce(_ union _)
    }

    def events100: DataFrame = {
      val base = src.catalog.relation("events")
      (0 until copies).map { i =>
        if (i == 0) base
        else base
          .withColumn("event_id", col("event_id") + lit(i * eK))
          .withColumn("user_id", col("user_id") + lit(i * uK))
          .withColumn("ts", col("ts") + expr(s"interval ${i * 31} day"))
      }.reduce(_ union _)
    }

    val tables: Seq[(String, DataFrame)] = Seq(
      "region"   -> src.catalog.relation("region"),
      "nation"   -> src.catalog.relation("nation"),
      "customer" -> shifted("customer", Map("c_custkey" -> cK)),
      "supplier" -> shifted("supplier", Map("s_suppkey" -> sK)),
      "part"     -> shifted("part", Map("p_partkey" -> pK)),
      "orders"   -> shifted("orders", Map("o_orderkey" -> oK, "o_custkey" -> cK)),
      "lineitem" -> shifted("lineitem", Map("l_orderkey" -> oK,
        "l_partkey" -> pK, "l_suppkey" -> sK)),
      "documents"  -> documents100,
      "embeddings" -> embeddings100,
      "events"     -> events100
    )

    val dir = new java.io.File(out); dir.mkdirs()
    tables.foreach { case (name, df) =>
      val t0 = System.nanoTime
      // `<name>.parquet` is a DIRECTORY of 32 part files (spark.read
      // treats it identically to one file). A single coalesce(1) file
      // compresses small tables (documents = 65 MB) into ONE parquet row
      // group, and a row group is the unit of scan parallelism — every
      // scan then runs on ONE core and the sweep measures single-thread
      // throughput instead of operator growth (x44 read 298x before this
      // change, 12x after). Real 100 TB inputs are millions of row
      // groups; 32 splits is the realistic layout at local[32].
      val dst = new java.io.File(s"$out/$name.parquet")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      if (dst.exists()) rm(dst)
      df.repartition(32).write.mode("overwrite").parquet(dst.getPath)
      println(f"[scale10] wrote $name%-10s rows=${spark.read.parquet(dst.getPath).count()}%10d  ${(System.nanoTime - t0) / 1e9}%6.1f s")
    }
    println(s"[scale10] synthesized ~sf10 at $out")
  }
}
