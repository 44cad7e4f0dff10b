package graft
// Empirical probe: which grouping shapes support append-mode streaming
// aggregation with watermark eviction?
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

object StreamProbe {
  def main(a: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._

    def probe(tag: String)(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val in = MemoryStream[(java.sql.Timestamp, Double)](spark)
      val df = in.toDF().toDF("ts", "value")
      try {
        val agg = build(df)
        val q = agg.writeStream.outputMode(OutputMode.Append())
          .format("memory").queryName(s"probe_$tag".replaceAll("\\W", "_")).start()
        try {
          def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
          in.addData((ts(1, 0), 1.0), (ts(1, 30), 2.0))
          q.processAllAvailable()
          in.addData((ts(5, 0), 9.0)) // advances watermark far past hour 1
          q.processAllAvailable()
          in.addData((ts(6, 0), 9.0))
          q.processAllAvailable()
          val n = spark.table(s"probe_$tag".replaceAll("\\W", "_")).count()
          println(s"[probe] $tag -> OK, emitted=$n (append worked${if (n > 0) ", eviction fired" else " but nothing emitted"})")
        } finally q.stop()
      } catch {
        case e: Exception =>
          println(s"[probe] $tag -> FAIL: ${e.getMessage.linesIterator.next()}")
      }
    }

    probe("A groupBy(window()) canonical") { df =>
      df.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("n"))
    }

    probe("B withColumn window struct, groupBy struct col") { df =>
      df.withWatermark("ts", "1 hour")
        .withColumn("__w", window(col("ts"), "1 hour"))
        .groupBy(col("__w"))
        .agg(count(lit(1)).as("n"))
        .select(col("__w.start").as("w_start"), col("n"))
    }

    probe("C materialized w_start/w_end, groupBy struct + fields") { df =>
      df.withWatermark("ts", "1 hour")
        .withColumn("__w", window(col("ts"), "1 hour"))
        .withColumn("w_start", col("__w.start"))
        .withColumn("w_end", col("__w.end"))
        .groupBy(col("__w"), col("w_start"), col("w_end"))
        .agg(count(lit(1)).as("n"))
        .select(col("w_start"), col("n"))
    }

    probe("D bucket arithmetic (current batch semantics)") { df =>
      val us = unix_micros(col("ts"))
      df.withWatermark("ts", "1 hour")
        .withColumn("w_start", timestamp_micros((us / 3600000000L).cast("long") * 3600000000L))
        .groupBy(col("w_start"))
        .agg(count(lit(1)).as("n"))
    }
  }
}
