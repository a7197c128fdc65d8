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

  test("merge-on-write: a key-local batch rewrites only its buckets") {
    import graft.queries.StreamQueries.{UpsertBuckets, upsertBucket}
    val base = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    // Seed: 200 users span (virtually) all hash buckets.
    upsertBatch(spark,
      events((1L to 200L).map(u => (u * 2 + 1, 1, u, u.toDouble))),
      base, "state")
    val gen1 = graft.sink.SnapshotSwap.currentSnapshot(base, "state").get
    // Batch 2 touches ONE user — one bucket.
    val touchedUser = 42L
    upsertBatch(spark,
      events(Seq((9001L, 5, touchedUser, 7.0))), base, "state")
    val gen2 = graft.sink.SnapshotSwap.currentSnapshot(base, "state").get
    val touchedBucket = spark.range(1)
      .select(upsertBucket(org.apache.spark.sql.functions
        .lit(touchedUser)).as("b")).head().getInt(0)
    // The target-side read is partition-pruned to the touched bucket:
    // the scan plan carries a PartitionFilter on bucket, so untouched
    // buckets never enter the join.
    val p = graft.queries.StreamQueries
      .upsertMerged(spark,
        events(Seq((9003L, 6, touchedUser, 8.0))), base, "state")
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("bucket"), p)
    // Untouched buckets carried into gen2 as HARD LINKS of gen1's
    // files (same inode — zero bytes rewritten); the touched bucket
    // was restated with fresh files.
    import java.nio.file.{Files, Paths}
    def partFiles(gen: String, b: Int): Seq[java.nio.file.Path] = {
      val dir = Paths.get(base, gen, s"bucket=$b")
      if (!Files.isDirectory(dir)) Seq.empty
      else {
        val s = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toSeq
            .filter(_.getFileName.toString.startsWith("part-"))
        } finally s.close()
      }
    }
    val untouched = (0 until UpsertBuckets)
      .filter(b => b != touchedBucket && partFiles(gen1, b).nonEmpty)
    assert(untouched.nonEmpty)
    untouched.foreach { b =>
      val f1 = partFiles(gen1, b); val f2 = partFiles(gen2, b)
      assert(f1.map(_.getFileName) == f2.map(_.getFileName), s"bucket $b")
      f1.zip(f2).foreach { case (a, c) =>
        assert(Files.isSameFile(a, c), s"bucket $b was rewritten")
      }
    }
    val t1 = partFiles(gen1, touchedBucket).map(_.getFileName.toString)
    val t2 = partFiles(gen2, touchedBucket).map(_.getFileName.toString)
    assert(t2.nonEmpty && t1.intersect(t2).isEmpty,
      s"touched bucket not restated: $t1 vs $t2")
    // And the merged STATE is still complete and correct.
    val s2 = state(base)
    assert(s2.exists(r => r._1 == touchedUser && r._3 == 9001L && r._4 == 700L))
    assert(s2.count(_ => true) == 200)
  }

  test("merge-on-write links survive the stale-generation sweep") {
    // gen2 carries gen1's untouched buckets as hard LINKS; committing
    // gen3 sweeps gen1's directory (versions strictly older than the
    // published one). The links must keep the inodes alive: gen2
    // (now HEAD's parent, AS-OF-readable) and gen3 (HEAD) must both
    // read complete state after the sweep.
    import java.nio.file.{Files, Paths}
    val base = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    upsertBatch(spark,
      events((1L to 100L).map(u => (u * 2 + 1, 1, u, u.toDouble))),
      base, "state")
    val gen1 = graft.sink.SnapshotSwap.currentSnapshot(base, "state").get
    upsertBatch(spark, events(Seq((9001L, 5, 42L, 7.0))), base, "state")
    upsertBatch(spark, events(Seq((9005L, 6, 43L, 9.0))), base, "state")
    assert(!Files.exists(Paths.get(base, gen1)),
      "gen1 should have been swept at the third commit")
    val head = state(base)
    assert(head.size == 100)
    assert(head.exists(r => r._1 == 42L && r._3 == 9001L))
    assert(head.exists(r => r._1 == 43L && r._3 == 9005L))
    assert(head.exists(r => r._1 == 7L && r._4 == 700L)) // carried twice
    // AS-OF read of the intermediate generation still works: its
    // carried buckets are links whose inodes outlive gen1's dir.
    val asOf2 = graft.sink.SnapshotSwap
      .readAsOf(spark, base, "state", 2L)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(asOf2.size == 100)
    assert(asOf2(42L) == 9001L)
    assert(asOf2(43L) == 87L) // still the seed op at version 2
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
