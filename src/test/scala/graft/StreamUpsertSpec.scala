package graft

import org.apache.spark.sql.functions._

/** q_stream_upsert invariants: the timestamp-guarded MERGE fold is
  * (1) idempotent under foreachBatch replay, (2) tombstone-correct
  * under out-of-order batches (a deleted entity is NOT resurrected by
  * a later-arriving older op), and (3) micro-batch-split independent
  * (any partition of the log folds to the same state). The end-to-end
  * value compare against the LWW snapshot is the DuckDB oracle's job.
  */
class StreamUpsertSpec extends SparkSpecBase {

  import graft.queries.StreamQueries.upsertBatch

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 09:$minute%02d:00")

  private def events(rows: Seq[(Long, Int, Long, Double)]) = {
    import spark.implicits._
    rows.map { case (eid, m, uid, v) => (eid, ts(m), uid, v) }
      .toDF("event_id", "ts", "user_id", "value")
  }

  private def state(base: String) =
    graft.sink.SnapshotSwap.readManifested(spark, base, "state")
      .select("user_id", "us", "event_id", "val_e2", "deleted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet

  test("replayed batch leaves the state unchanged (foreachBatch at-least-once)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    val b0 = events(Seq((1L, 1, 1L, 2.0), (3L, 2, 1L, 3.0),
      (22L, 3, 2L, 9.0))) // 22 % 11 = 0 -> D op for user 2
    upsertBatch(spark, b0, base, "state")
    val s1 = state(base)
    // User 1 holds its latest op; user 2 is a retained tombstone.
    assert(s1.exists(r => r._1 == 1L && r._3 == 3L && r._4 == 300L && !r._5), s1)
    assert(s1.exists(r => r._1 == 2L && r._5), s1)
    upsertBatch(spark, b0, base, "state") // replay
    assert(state(base) == s1)
  }

  test("tombstone beats a later-arriving older op (no resurrection)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    // Batch 0 carries the NEWER delete for user 7 (minute 9).
    upsertBatch(spark, events(Seq((33L, 9, 7L, 1.0))), base, "state")
    // Batch 1 arrives later but holds an OLDER update (minute 2).
    upsertBatch(spark, events(Seq((5L, 2, 7L, 6.0))), base, "state")
    val s = state(base)
    assert(s == Set((7L, ts(9).getTime * 1000L, 33L, 100L, true)), s)
  }

  test("final state is micro-batch-split independent") {
    val log = Seq((1L, 1, 1L, 2.0), (22L, 3, 2L, 9.0), (3L, 2, 1L, 3.0),
      (5L, 4, 3L, 4.0), (44L, 5, 3L, 1.0), (7L, 6, 2L, 8.0))
    val whole = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    upsertBatch(spark, events(log), whole, "state")
    val split = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    // An adversarial split: out-of-time-order slices of size 2.
    log.grouped(2).foreach(b => upsertBatch(spark, events(b), split, "state"))
    assert(state(whole) == state(split))
    // The split run kept one snapshot generation per batch.
    assert(graft.sink.SnapshotSwap.currentVersion(split, "state") == 3L)
  }
}
