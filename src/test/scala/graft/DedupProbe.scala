package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Ad-hoc wall-clock breakdown of the dedup gate pipelines (not a test —
  * run with Test/runMain graft.DedupProbe [sfDir]). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val g = GraftSession.forDir(TestSpark.spark, dir)
    val docs = g.catalog.relation("documents")
    println(s"docs: ${docs.count()}")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2f  $label"); r
    }

    // warm: run the token explode + an agg once so JIT/codegen caches are hot
    docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .groupBy("t").count().count()

    t("simhash signatures (1st)")(Dedup.simhashSignatures(docs, "text", "doc_id").count())
    t("simhash signatures (2nd)")(Dedup.simhashSignatures(docs, "text", "doc_id").count())
    val sc = t("simhash candidates")(
      Dedup.simhashCandidates(docs, "text", "doc_id", 3).localCheckpoint())
    println(s"  simhash pairs: ${sc.count()}")
    t("simhash verify (ngramJaccard)")(
      Dedup.ngramJaccard(sc.select(col("ida"), col("idb")), docs, "text", "doc_id").count())

    t("minhash signatures")(Dedup.minhashSignatures(docs, "text", "doc_id").count())
    val mc = t("minhash candidates")(
      Dedup.minhashCandidates(docs, "text", "doc_id", threshold = 0.48)
        .select(col("ida"), col("idb")).localCheckpoint())
    println(s"  minhash pairs: ${mc.count()}")
    t("minhash verify")(
      Dedup.ngramJaccard(mc, docs, "text", "doc_id").where(col("jaccard") >= 0.8).count())
    t("components over pairs")(
      Components.connectedComponents(mc).count())
  }
}
