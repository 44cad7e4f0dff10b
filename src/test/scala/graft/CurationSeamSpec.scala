package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fullPipeline parquet-seam option (r15): the two corpus-sized
  * lineage cuts land on parquet with `_COMMITTED` markers instead of
  * session-lifetime localCheckpoints — output identical, and a re-run
  * with the same seamDir resumes from the committed seams WITHOUT
  * executing anything upstream of them (the 100 TB restart posture). */
class CurationSeamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs = new GraftSession(spark).registerDir(TestSpark.sf)
    .catalog.relation("documents")

  private def fingerprint(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("id"), col("rep"), col("split"), col("bucket"),
        col("token_est"), col("shard"), col("bin"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("seamDir: committed markers written, packed output identical to the localCheckpoint path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_seam_").toString
    val base = fingerprint(Curation.fullPipeline(docs))
    val seamed = fingerprint(Curation.fullPipeline(docs,
      seamDir = Some(dir)))
    assert(base.nonEmpty && seamed === base)
    Seq("kept", "pairs").foreach { s =>
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, s, "_COMMITTED")),
        s"seam $s must carry its commit marker")
    }
  }

  test("restart-from-seam: committed seams serve a re-run whose upstream would throw") {
    val dir = java.nio.file.Files.createTempDirectory("graft_seamr_").toString
    val first = fingerprint(Curation.fullPipeline(docs, seamDir = Some(dir)))
    // poisoned input: any executed upstream task would fail loudly
    val boom = udf { (s: String) =>
      if (s != null) throw new RuntimeException("upstream must not run")
      s
    }
    val poisoned = docs.withColumn("text", boom(col("text")))
    // the poison is real: against FRESH seams the pipeline fails…
    val fresh = java.nio.file.Files.createTempDirectory("graft_seamf_").toString
    intercept[Exception](
      Curation.fullPipeline(poisoned, seamDir = Some(fresh)).collect())
    // …but against the COMMITTED seams the re-run never executes the
    // upstream: identical output from the landed parquet alone
    val resumed = fingerprint(
      Curation.fullPipeline(poisoned, seamDir = Some(dir)))
    assert(resumed === first)
  }
}
