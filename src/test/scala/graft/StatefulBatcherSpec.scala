package graft

import graft.streaming.StatefulBatcher
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming custom-state batching: conservation across micro-batches,
  * bounded batches, remainder held in state until completed or flushed
  * by the inactivity timeout.
  *
  * NOTE: these tests poll the memory sink with a deadline instead of
  * calling processAllAvailable() — with ProcessingTimeTimeout the
  * engine always schedules another timeout-check batch
  * (FlatMapGroupsWithStateExec.shouldRunAnotherBatch), so
  * processAllAvailable never observes a quiesced query and blocks
  * until the earliest registered timeout fires. */
class StatefulBatcherSpec extends SparkSpecBase {

  private def pollUntil(deadlineMs: Long = 30000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + deadlineMs
    while (!cond && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(cond)
  }

  test("emits complete batches across micro-batches, holds remainder") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val out = StatefulBatcher.batched(input.toDS(), batchSize = 3)
    val qn = "sb_out"
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    def collected = spark.table(qn).as[StatefulBatcher.Batch].collect()
    try {
      // 7 elements for key a, 3 for key b: expect (2,1) full batches.
      input.addData((0L until 7L).map(("a", _)) ++
        Seq(("b", 100L), ("b", 101L), ("b", 102L)): _*)
      pollUntil() { collected.length == 3 }
      val first = collected
      assert(first.count(_.key == "a") == 2)
      assert(first.count(_.key == "b") == 1)
      assert(first.forall(_.elems.length == 3))
      assert(first.filter(_.key == "a").flatMap(_.elems).length == 6)

      // Two more 'a' elements complete the held remainder into a batch.
      input.addData(("a", 7L), ("a", 8L))
      pollUntil() { collected.length == 4 }
      val allA = collected.filter(_.key == "a").flatMap(_.elems).sorted
      assert(allA.toSeq == (0L until 9L)) // conservation: each exactly once
      assert(collected.forall(_.elems.length == 3)) // bound
    } finally q.stop()
  }

  test("flushes a quiet key's remainder after the inactivity timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    // 200ms inactivity flush: a later timeout-check batch fires it.
    val out = StatefulBatcher.batched(input.toDS(), batchSize = 3,
      flushAfterMs = 200L)
    val qn = "sb_flush_out"
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    def aBatches = spark.table(qn).as[StatefulBatcher.Batch].collect()
      .filter(_.key == "a")
    try {
      // 4 'a' elements: one full batch emitted, remainder (3L) held,
      // then flushed as a short batch once 'a' goes quiet past 200ms.
      input.addData(("a", 0L), ("a", 1L), ("a", 2L), ("a", 3L))
      pollUntil() { aBatches.length == 2 }
      assert(aBatches.flatMap(_.elems).sorted.toSeq == (0L until 4L))
      assert(aBatches.map(_.elems.length).sorted.toSeq == Seq(1, 3))
    } finally q.stop()
  }
}
