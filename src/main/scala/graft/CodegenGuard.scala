package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Detector for SILENT codegen degradation (round-11 verdict #2).
  *
  * Spark never fails a query when generated Java exceeds Janino's 64 KB
  * method limit — `CodeGenerator.compile` logs "Failed to compile the
  * generated Java code" and the plan falls back to interpreted
  * execution. Correctness survives; throughput silently drops an order
  * of magnitude on the affected operators, and nothing in the bench
  * artifact says so. This class of degradation survived two rounds of
  * IVF/PQ work precisely because it is log-only.
  *
  * The guard attaches one log4j2 appender to the root logger and counts
  * events whose message carries a compile-failure marker. The bench
  * snapshots the counter around every gate (per-gate counts land in the
  * BENCH_full sidecar), and PlanAuditSpec asserts zero across the ANN
  * family that previously regressed.
  */
object CodegenGuard {
  private val hits = new AtomicLong(0)
  private val samples = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  @volatile private var installed = false

  private val markers = Seq(
    "Failed to compile the generated Java code",
    "Whole-stage codegen disabled for plan",
    "grows beyond 64 KB")

  /** Idempotent; safe to call from tests and mains alike. */
  def install(): Unit = synchronized {
    if (installed) return
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val app = new AbstractAppender(
      "graft-codegen-guard", null, null, true, Property.EMPTY_ARRAY) {
      override def append(event: LogEvent): Unit = {
        val msg =
          try event.getMessage.getFormattedMessage
          catch { case _: Throwable => return }
        if (msg != null && markers.exists(msg.contains)) {
          hits.incrementAndGet()
          if (samples.size < 8) samples.add(msg.linesIterator.next().take(240))
        }
      }
    }
    app.start()
    cfg.getRootLogger.addAppender(app, Level.ALL, null)
    ctx.updateLoggers()
    installed = true
  }

  /** Current cumulative fallback count since install/reset. */
  def current: Long = hits.get()

  /** Reset and return the prior count (per-gate snapshot pattern). */
  def reset(): Long = { samples.clear(); hits.getAndSet(0) }

  /** First line of up to 8 matched messages — enough to name the shape. */
  def recentSamples: Seq[String] = {
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq
  }
}
