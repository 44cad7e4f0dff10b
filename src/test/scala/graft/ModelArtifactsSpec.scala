package graft

import graft.operators.{Decontaminate, Dedup, Importance}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Save/load round trips for the r15 curation-model artifacts. The
  * lifecycle (CREATE/DROP/serve/wrong-kind/sidecar) is fuzzed in
  * ModelFuzzSpec; these pin the byte-level contracts: bit-identical
  * DSIR log-ratios across the text round trip, and layout validation
  * that rejects wrong-kind artifacts with a naming error. */
class ModelArtifactsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs = new GraftSession(spark).registerDir(TestSpark.sf)
    .catalog.relation("documents")

  test("DSIR model: save/load round-trips log-ratios BIT-identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_")
    val path = dir.resolve("m.tsv").toString
    val model = Importance.dsirModel(docs, "text", "doc_id",
      col("source") === "src0", buckets = 64)
    assert(model.nonEmpty)
    Importance.saveDsirModel(spark, model, 64, path)
    val (loaded, buckets) = Importance.loadDsirModel(spark, path)
    assert(buckets === 64)
    assert(loaded.length === model.length)
    loaded.zip(model.sortBy(_._1)).foreach { case ((lb, llr), (mb, mlr)) =>
      assert(lb === mb)
      assert(java.lang.Double.doubleToRawLongBits(llr) ===
        java.lang.Double.doubleToRawLongBits(mlr),
        s"bucket $mb: $llr is not bit-identical to $mlr")
    }
    // served scores equal the in-memory model's scores exactly
    val a = Importance.applyDsirScore(docs, "text", "doc_id", model, 64)
      .collect().map(_.mkString("|")).sorted
    val b = Importance.applyDsirScore(docs, "text", "doc_id", loaded, buckets)
      .collect().map(_.mkString("|")).sorted
    assert(a.nonEmpty && (a sameElements b))
  }

  test("DSIR loader rejects malformed artifacts with a naming error") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsirbad_")
    val p = dir.resolve("junk.tsv")
    java.nio.file.Files.write(p, "not a header\n3\t0.5\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      Importance.loadDsirModel(spark, p.toString))
    assert(e.getMessage.contains("malformed DSIR header"))
  }

  test("hot-set loaders validate layout: wrong column type/name rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hotset_")
    val spansDir = dir.resolve("spans").toString
    val parasDir = dir.resolve("paras").toString
    Dedup.saveHotSpans(
      Dedup.hotSpans(docs, "text", "doc_id", 8, 2L), spansDir)
    Dedup.saveHotParagraphs(
      Dedup.hotParagraphs(docs, "text", "doc_id", 2L), parasDir)
    // right loader, right artifact: loads
    assert(Dedup.loadHotSpans(spark, spansDir).columns.toSeq === Seq("key"))
    assert(Dedup.loadHotParagraphs(spark, parasDir).columns.toSeq === Seq("key"))
    // spans loader on a paragraphs artifact: type mismatch, named error
    val e = intercept[IllegalArgumentException](
      Dedup.loadHotSpans(spark, parasDir))
    assert(e.getMessage.contains("expected column 'key' of type long"))
    // shingles loader on a spans artifact: column-name mismatch
    val e2 = intercept[IllegalArgumentException](
      Decontaminate.loadBenchShingles(spark, spansDir))
    assert(e2.getMessage.contains("expected a single 'h' column"))
  }
}
