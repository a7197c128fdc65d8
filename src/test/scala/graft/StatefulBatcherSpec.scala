package graft

import graft.streaming.StatefulBatcher
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming custom-state batching: conservation across micro-batches,
  * bounded batches, remainder held in state until completed. */
class StatefulBatcherSpec extends SparkSpecBase {

  test("emits complete batches across micro-batches, holds remainder") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val out = StatefulBatcher.batched(input.toDS(), batchSize = 3)
    val qn = "sb_out"
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // 7 elements for key a, 3 for key b: expect (2,1) full batches.
      input.addData((0L until 7L).map(("a", _)) ++ Seq(("b", 100L), ("b", 101L), ("b", 102L)): _*)
      q.processAllAvailable()
      val first = spark.table(qn).as[StatefulBatcher.Batch].collect()
      assert(first.count(_.key == "a") == 2)
      assert(first.count(_.key == "b") == 1)
      assert(first.forall(_.elems.length == 3))
      val emittedA = first.filter(_.key == "a").flatMap(_.elems).sorted
      assert(emittedA.length == 6) // 7th held in state

      // Two more 'a' elements complete the held remainder into a batch.
      input.addData(("a", 7L), ("a", 8L))
      q.processAllAvailable()
      val all = spark.table(qn).as[StatefulBatcher.Batch].collect()
      val allA = all.filter(_.key == "a").flatMap(_.elems).sorted
      assert(allA.toSeq == (0L until 9L)) // conservation: each exactly once
      assert(all.forall(_.elems.length == 3)) // bound
    } finally q.stop()
  }
}
