package graft

import java.util.concurrent.atomic.AtomicInteger
import graft.streaming.ProgressFeedback

/** P17: scheduler-event progress feedback around a real job. */
class ProgressFeedbackSpec extends SparkSpecBase {

  test("progress ticks and final snapshot reflect completed work") {
    val ticks = new AtomicInteger(0)
    val (result, snap) = ProgressFeedback.withProgress(spark)(
      _ => ticks.incrementAndGet()) {
      spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .groupBy("n_regionkey").count().collect().length
    }
    assert(result == 5)
    assert(snap.jobsDone >= 1)
    assert(snap.stagesDone >= 1)
    assert(snap.tasksDone >= 1)
    assert(snap.recordsRead >= 25L)
    assert(ticks.get() > 0)
  }
}
