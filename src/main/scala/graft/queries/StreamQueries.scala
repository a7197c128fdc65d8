package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables.t

/** q_stream_batch: the Structured Streaming variant of the reference's
  * BatchStream (P6, reference: batch_stream.py:16-64): a micro-batched,
  * key-grouped ingest with bounded state. We reproduce the *observable*
  * contract (grouped counts with conservation — every event counted
  * exactly once), not the eviction heuristic (SURVEY.md §7.4).
  *
  * Tumbling 1-hour event-time windows per event_type over the `events`
  * table read as a file stream; the oracle is the batch equivalent
  * (date_trunc to the hour) — streaming and batch answers must agree.
  *
  * At scale this runs in append mode with `withWatermark` bounding state;
  * here the source is finite (Trigger.AvailableNow) so complete mode
  * against the in-memory sink gives the full deterministic answer.
  */
object StreamQueries {

  import CoreQueries.Q

  def streamCounts(s: SparkSession, d: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
    // reader rejects; re-encode once to a micros staging dir (the shape a
    // real file-stream source directory would have) and stream from it.
    val tag = d.stripSuffix("/").split('/').last
    val srcDir = s"/tmp/graft_stream_src_$tag"
    graft.Tables.events(s, d).write.mode("overwrite").parquet(srcDir)
    val schema = s.read.parquet(srcDir).schema
    val qn = "graft_ev_" + math.abs(d.hashCode).toString
    val stream = s.readStream.schema(schema)
      .parquet(srcDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
    val q = stream.writeStream.format("memory").queryName(qn)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(qn)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"),
        col("count").as("cnt"))
      .orderBy("ws", "event_type")
  }

  val entries: Map[String, (Q, String)] = Map(
    "q_stream_batch" -> ((
      (s: SparkSession, d: String) => streamCounts(s, d),
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
        |event_type, CAST(count(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin))
  )
}
