package graft.streaming

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Progress/feedback stream (P17) — the engine-side analogue of the
  * reference's CoreFeedback.progress_done ticks
  * (collect_plugins.py:41-42,196-212, show_progress.py): a
  * SparkListener aggregating job/stage/task completion, delivered to a
  * caller-supplied sink. Spark's scheduler events replace the
  * reference's hand-rolled per-batch counters.
  */
final class ProgressFeedback(onProgress: ProgressFeedback.Snapshot => Unit)
    extends SparkListener {

  private val jobsStarted = new AtomicInteger(0)
  private val jobsDone = new AtomicInteger(0)
  private val stagesDone = new AtomicInteger(0)
  private val tasksDone = new AtomicLong(0L)
  private val recordsRead = new AtomicLong(0L)

  private def tick(): Unit = onProgress(snapshot)

  def snapshot: ProgressFeedback.Snapshot = ProgressFeedback.Snapshot(
    jobsStarted.get, jobsDone.get, stagesDone.get, tasksDone.get,
    recordsRead.get)

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    jobsStarted.incrementAndGet(); tick()
  }

  override def onJobEnd(e: SparkListenerJobEnd): Unit = {
    jobsDone.incrementAndGet(); tick()
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    stagesDone.incrementAndGet(); tick()
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    tasksDone.incrementAndGet()
    if (e.taskMetrics != null)
      recordsRead.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    tick()
  }
}

object ProgressFeedback {

  final case class Snapshot(
      jobsStarted: Int, jobsDone: Int, stagesDone: Int, tasksDone: Long,
      recordsRead: Long)

  /** Run `body` with progress feedback attached; the listener is always
    * detached afterwards. Returns (result, final snapshot). */
  def withProgress[A](spark: SparkSession)
      (onProgress: Snapshot => Unit = _ => ())(body: => A): (A, Snapshot) = {
    val fb = new ProgressFeedback(onProgress)
    spark.sparkContext.addSparkListener(fb)
    try {
      val out = body
      // Listener delivery is asynchronous; poll until the event stream
      // quiesces (or 10s worst case) before snapshotting.
      var prev = fb.snapshot
      var stable = false
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!stable && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val cur = fb.snapshot
        stable = cur == prev
        prev = cur
      }
      (out, fb.snapshot)
    } finally spark.sparkContext.removeSparkListener(fb)
  }
}
