package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Event-time watermark semantics: in append mode a window only emits
  * once the watermark passes its end, and events arriving later than
  * the watermark allows are dropped — the bounded-state guarantee that
  * replaces the reference's manual buffer watermark at scale
  * (batch_stream.py:51-56). */
class WatermarkSpec extends SparkSpecBase {

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("append-mode windows finalize at the watermark and drop late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val qn = "wm_out"
    val agg = input.toDS().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .count()
    val q = agg.writeStream.format("memory").queryName(qn)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // Two events in the 10:00 window.
      input.addData((ts(1), "a"), (ts(5), "a"))
      q.processAllAvailable()
      // Nothing emitted yet: watermark (max ts - 10m) hasn't passed the
      // window end.
      assert(spark.table(qn).count() == 0)

      // Advance event time far past the window end -> 10:00 window final.
      input.addData((ts(40), "a"))
      q.processAllAvailable()
      val emitted = spark.table(qn)
        .select(col("window.start").cast("string"), col("count")).collect()
      assert(emitted.map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("2024-01-01 10:00:00", 2L)))

      // A straggler for the long-finalized 10:00 window is dropped;
      // an event far ahead finalizes the 10:40 window (ts(40)).
      input.addData((ts(2), "a"))
      input.addData((Timestamp.valueOf("2024-01-01 11:30:00"), "a"))
      q.processAllAvailable()
      val all = spark.table(qn)
        .select(col("window.start").cast("string"), col("count")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(all("2024-01-01 10:00:00") == 2L) // late event not counted
      assert(all("2024-01-01 10:40:00") == 1L) // the ts(40) event's window
    } finally q.stop()
  }

  test("late filtering lags one batch: judged by the PREVIOUS watermark") {
    // The q_stream_late gate's load-bearing discovery (probed on this
    // Spark version): the state operator filters late input against
    // the watermark of the batch BEFORE the one it arrives in, while
    // eviction uses the current one. A replay arriving one batch after
    // the watermark passed it is KEPT; one batch later it is DROPPED.
    // If a Spark upgrade tightens this to same-batch filtering, this
    // spec fails before the gate's oracle does — update both together.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val qn = "wm_lag_out"
    val agg = input.toDS().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .count()
    // No-data micro-batches would silently consume the one-batch lag
    // this spec exists to observe (and the gate disables them too).
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.get(noDataKey, "true")
    spark.conf.set(noDataKey, "false")
    val q = agg.writeStream.format("memory").queryName(qn)
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    try {
      def windows: Map[String, Long] = spark.table(qn)
        .select(col("window.start").cast("string"), col("count")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap

      input.addData((ts(0), "a"), (ts(30), "a")) // wm after: 10:20
      q.processAllAvailable()

      // Arrives AFTER the watermark passed 10:00, but only one batch
      // after: judged by the previous (epoch) watermark -> kept.
      input.addData((ts(35), "a"), (ts(1), "a"))
      q.processAllAvailable()
      assert(windows("2024-01-01 10:00:00") == 2L)

      // Two batches after: judged by the post-batch-0 watermark -> the
      // straggler is dropped, the window count does not move.
      input.addData((ts(40), "a"), (ts(2), "a"))
      q.processAllAvailable()
      assert(windows("2024-01-01 10:00:00") == 2L)
      val dropped = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped == 1L, s"expected exactly the one straggler, got $dropped")
    } finally {
      q.stop()
      spark.conf.set(noDataKey, prevNoData)
    }
  }
}
