package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Detector for executor SPILL — the CodegenGuard discipline applied to
  * the other silent throughput killer (r12).
  *
  * A task that exceeds its execution-memory share spills sorter or
  * aggregation state to disk and keeps going: results stay correct,
  * throughput drops an order of magnitude, and nothing in a wall-clock-
  * only artifact says so. One listener accumulates memory+disk spill
  * bytes across all tasks; the bench snapshots the counter around every
  * gate, so per-gate spill lands in the BENCH_full sidecar next to the
  * codegen-fallback count. Every gate is zero-spill at sf0.1 and the
  * sf10 dress rehearsal (METRICS_x95_sf10.txt); a nonzero entry at a new
  * scale says "shrink partitions / raise parallelism BEFORE trusting the
  * time".
  *
  * Attribution caveat: task-end events arrive on the async listener bus,
  * so a few bytes can land on the FOLLOWING gate's counter under heavy
  * load. Fine for a report-only sidecar — the signal sought is "this
  * gate spilled gigabytes", not exact byte attribution.
  */
object SpillGuard extends SparkListener {
  private val bytes = new AtomicLong(0)
  @volatile private var installed = false

  /** Idempotent; attaches the listener once per JVM. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!installed) {
      spark.sparkContext.addSparkListener(this)
      installed = true
    }
  }

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    val m = ev.taskMetrics
    if (m != null) {
      bytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled): Unit
    }
  }

  def reset(): Unit = bytes.set(0)
  def current: Long = bytes.get
}
