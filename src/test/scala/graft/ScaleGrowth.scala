package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-6 scale-growth spot check (VERDICT r5 task #4): synthesize a ~sf1
  * TPC-H-shaped dataset as a union of 10 KEY-SHIFTED sf0.1 copies (join
  * relationships preserved — every foreign key shifts by the same per-copy
  * offset), write it as single-file parquet tables the driver contract can
  * read, and print per-canary wall times. Perf posture only — no oracle at
  * this scale; correctness is gated at sf0.01.
  *
  * Run: `sbt -batch "Test/runMain graft.ScaleGrowth [outDir]"`, then
  * `SPARK_GRAFT_SF_DIR=<outDir> SPARK_GRAFT_ONLY=q101,q102,q103,q104,q105,q106
  *  sbt -batch "runMain graft.Bench"` and compare against the same subset
  * at sf0.1 (ratios recorded in SCALE.md).
  */
object ScaleGrowth {
  def main(a: Array[String]): Unit = {
    val out = a.headOption.getOrElse("/tmp/sfsynth1")
    val spark = TestSpark.spark
    val src = GraftSession.forDir(spark, "/root/testdata/sf0.1")
    val copies = 10

    // per-copy key offsets: > max key of the base table, so copies never
    // collide and every FK lands in its own copy's PK range
    def maxOf(t: String, c: String): Long =
      src.catalog.relation(t).agg(max(col(c))).head().getAs[Number](0).longValue + 1

    val oK = maxOf("orders", "o_orderkey")
    val cK = maxOf("customer", "c_custkey")
    val pK = maxOf("part", "p_partkey")
    val sK = maxOf("supplier", "s_suppkey")

    def shifted(t: String, shifts: Map[String, Long]): DataFrame = {
      val base = src.catalog.relation(t)
      (0 until copies).map { i =>
        shifts.foldLeft(base) { case (df, (c, k)) =>
          df.withColumn(c, col(c) + lit(i * k))
        }
      }.reduce(_ union _)
    }

    // ---- round-8: the LLM-pipeline tables, so the x-gate family can be
    // scale-tested too. Content is PERTURBED per copy — plain key-shifted
    // copies would give every document 9 exact/near twins, turning a
    // 10x-rows run into a 100x-candidate-pairs run and measuring a content
    // pathology instead of algorithm growth. Mutating every 3rd token
    // kills every 5-gram shingle across copies (each shingle spans >= 1
    // mutated token), so cross-copy Jaccard ~ 0 and the dup-rate PROFILE
    // of the base corpus is preserved at 10x the rows.
    val dK = maxOf("documents", "doc_id")
    val vK = maxOf("embeddings", "vec_id")
    val eK = maxOf("events", "event_id")
    val uK = maxOf("events", "user_id")

    def documents10: DataFrame = {
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

    // embeddings: rotate the vector by i dims — unit norm is preserved and
    // cross-copy cosine decorrelates, so ANN/near-dup candidate structure
    // matches the base profile instead of exploding
    def embeddings10: DataFrame = {
      val base = src.catalog.relation("embeddings")
      (0 until copies).map { i =>
        if (i == 0) base
        else base
          .withColumn("vec_id", col("vec_id") + lit(i * vK))
          .withColumn("embedding", concat(
            slice(col("embedding"), i + 1, 64 - i),
            slice(col("embedding"), 1, i)))
      }.reduce(_ union _)
    }

    // events: shift each copy 31 days later — the timeline EXTENDS (10
    // months) instead of densifying, matching how a stream actually grows;
    // per-user event density stays constant via shifted user ids
    def events10: DataFrame = {
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
      "documents"  -> documents10,
      "embeddings" -> embeddings10,
      "events"     -> events10
    )

    val dir = new java.io.File(out); dir.mkdirs()
    tables.foreach { case (name, df) =>
      val tmp = s"$out/__tmp_$name"
      val t0 = System.nanoTime
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      // driver-contract layout: one FILE named <table>.parquet
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written for $name"))
      val dst = new java.io.File(s"$out/$name.parquet")
      if (dst.exists()) dst.delete()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
      println(f"[scale] wrote $name%-9s rows=${spark.read.parquet(dst.getPath).count()}%9d  ${(System.nanoTime - t0) / 1e9}%6.1f s")
    }
    println(s"[scale] synthesized ~sf1 at $out")
  }
}
