package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming exact dedup with bounded state: duplicates arriving within
  * the watermark horizon are dropped; state for old keys is reclaimable
  * — the streaming flavor of q_dedup_exact for continuous ingest. */
class StreamDedupSpec extends SparkSpecBase {

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 09:$minute%02d:00")

  test("dropDuplicatesWithinWatermark removes in-horizon duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val qn = "dedup_out"
    val deduped = input.toDS().toDF("doc_key", "ts")
      .withWatermark("ts", "20 minutes")
      .dropDuplicatesWithinWatermark("doc_key")
    val q = deduped.writeStream.format("memory").queryName(qn)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(("a", ts(1)), ("b", ts(2)), ("a", ts(3)))
      q.processAllAvailable()
      input.addData(("a", ts(5)), ("c", ts(6)))
      q.processAllAvailable()
      val keys = spark.table(qn).select("doc_key").as[String]
        .collect().toSeq.sorted
      // Each key exactly once despite three 'a' arrivals.
      assert(keys == Seq("a", "b", "c"))
    } finally q.stop()
  }
}
