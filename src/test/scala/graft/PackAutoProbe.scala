package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures packTokenStreamAuto at scale (r11, VERDICT #5 "Done"):
  * auto-derived shard counts must keep per-shard window wall-time ~flat
  * as the target shrinks (more shards → more parallelism at constant
  * per-shard work), matching the round-10 fixed-shard finding (2 shards
  * 357 s vs 8 shards 138 s on the sf10 survivor stream).
  *
  *   sbt "Test/runMain graft.PackAutoProbe /tmp/sfsynth10"
  */
object PackAutoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfsynth10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = GraftSession.forDir(spark, sfDir).catalog.relation("documents")
    // the x98 shape: capped encode of the full corpus into a token stream.
    // DISK_ONLY, not localCheckpoint: 115M rows of MEMORY_AND_DISK blocks
    // inside an 8 GB driver heap left the window sorts one GC stall from
    // OOM (two of three probe attempts died flakily before this change)
    val enc = operators.TextAnalysis.bpeEncode(docs, "text", "doc_id",
      operators.Extensions.X86_MERGES, vocabCap = 12)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val total = enc.count()
    println(s"[packauto] token stream: $total tokens")
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[packauto] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // fixed-8 baseline (the r10 measurement's configuration)
    time("fixed shards=8")(operators.Curation.packTokenStream(enc,
      seqLen = 256, shard = pmod(xxhash64(col("id")), lit(8L))))
    // auto at the same effective shard count: target = total/8
    time(s"auto target=${total / 8} (~8 shards)")(
      operators.Curation.packTokenStreamAuto(enc, seqLen = 256, total / 8,
        estimatedTokens = Some(total)))
    // auto sized for the cluster: target = total/32 (~32 shards)
    time(s"auto target=${total / 32} (~32 shards)")(
      operators.Curation.packTokenStreamAuto(enc, seqLen = 256, total / 32,
        estimatedTokens = Some(total)))

    // ---- the FULL x98 gate pipeline (r14, VERDICT #7): encode + pack +
    // per-sequence md5 digest, pinned 8 shards (the committed envelope's
    // shape) vs the auto-sized path at target = total/32 — the number
    // that shows the 41× envelope is the task-per-shard constant, with
    // shard count as the lever a 100 TB run turns.
    def enc2 = enc
    def x98Digest(packed: org.apache.spark.sql.DataFrame) =
      packed.groupBy(col("shard"), col("seq_id"))
        .agg(count(lit(1)).as("n_tokens"),
          md5(concat_ws(" ", transform(
            array_sort(collect_list(struct(col("offset"), col("token_id")))),
            e => e.getField("token_id").cast("string")))).as("h"))
    def timed(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val pinned = timed(x98Digest(operators.Curation.packTokenStream(enc2,
      seqLen = 256, shard = pmod(
        pmod(col("id"), lit(1000000L)) * lit(2654435761L) % lit(1000000L),
        lit(8L)))))
    val auto = timed(x98Digest(operators.Curation.packTokenStreamAuto(enc2,
      seqLen = 256, total / 32, estimatedTokens = Some(total))))
    val json = f"""{"metric":"x98_pack_pipeline","unit":"sec","sf":"$sfDir","tokens":$total,"pinned8_sec":$pinned%.1f,"auto32_sec":$auto%.1f}"""
    println(s"[packauto] $json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_sf10_packauto.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[packauto] sidecar: $e") }
    spark.stop()
  }
}
