package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Scratch: does Spark's session_window split or merge at exactly-gap spacing? */
class ScratchGapSpec extends AnyFunSuite {
  test("batch session_window at exact gap") {
    val spark = TestSpark.spark
    import spark.implicits._
    // events at t=0 and t=3600s, gap=3600s
    val df = Seq(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    ).toDF("ts")
    val n = df.groupBy(session_window(col("ts"), "3600 seconds")).count().count()
    info(s"batch sessions at exact gap: $n")
    // streaming check
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)](spark)
    val sess = graft.streaming.Sessions.aggregate(
      in.toDF().toDF("ts", "k"), "ts", "3600 seconds", Seq("k"),
      (count(lit(1)).as("n"), Nil))
    val q = sess.writeStream.format("memory").queryName("scratch_gap")
      .outputMode("complete").start()
    try {
      in.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"),
        (java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "a"))
      q.processAllAvailable()
      val m = spark.table("scratch_gap").count()
      info(s"stream sessions at exact gap: $m")
      assert(n == m, s"batch $n vs stream $m diverge")
    } finally q.stop()
  }
}
