package graft

import org.apache.spark.sql.functions._

/** q_stream_upsert invariants under the r14 bounded-write protocol
  * (delta-buffer appends + periodic merge-on-write compaction): the
  * timestamp-guarded LWW fold is (1) idempotent under foreachBatch
  * replay, (2) tombstone-correct under out-of-order batches (a deleted
  * entity is NOT resurrected by a later-arriving older op), (3)
  * micro-batch-split independent (any partition of the log folds to
  * the same state); and the WRITE side is bounded: (4) a delta commit
  * carries EVERY base bucket by hard link (zero data bytes) and only
  * appends a batch-sized `_delta` entry, while (5) a compaction
  * restates ONLY the buckets touched by the buffered ops and drops the
  * buffer, (6) with carried links surviving the stale-generation
  * sweep so AS-OF folds of past generations stay readable. The
  * end-to-end value compare against the LWW snapshot is the DuckDB
  * oracle's job. */
class StreamUpsertSpec extends SparkSpecBase {

  import graft.queries.StreamQueries.{upsertBatch, upsertState, upsertStateAt}

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 09:$minute%02d:00")

  private def events(rows: Seq[(Long, Int, Long, Double)]) = {
    import spark.implicits._
    rows.map { case (eid, m, uid, v) => (eid, ts(m), uid, v) }
      .toDF("event_id", "ts", "user_id", "value")
  }

  private def state(base: String) =
    upsertState(spark, base, "state")
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
    // The replay lands as a DELTA append (the first commit wrote base
    // state): its rows tie the base rows on (us, event_id) with
    // identical payloads, so the fold is unchanged.
    upsertBatch(spark, b0, base, "state") // replay
    assert(state(base) == s1)
    // And a replay that lands as a COMPACTION (cadence boundary) folds
    // the duplicate into the merge, where the strict guard carries
    // the target — also unchanged.
    upsertBatch(spark, b0, base, "state", cadence = 2)
    assert(state(base) == s1)
  }

  test("tombstone beats a later-arriving older op (no resurrection)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    // Batch 0 carries the NEWER delete for user 7 (minute 9).
    upsertBatch(spark, events(Seq((33L, 9, 7L, 1.0))), base, "state")
    // Batch 1 arrives later but holds an OLDER update (minute 2) — a
    // delta append; the read fold must keep the tombstone.
    upsertBatch(spark, events(Seq((5L, 2, 7L, 6.0))), base, "state")
    val s = state(base)
    assert(s == Set((7L, ts(9).getTime * 1000L, 33L, 100L, true)), s)
    // Still true after the buffer compacts into the base.
    upsertBatch(spark, events(Seq.empty), base, "state", cadence = 2)
    assert(state(base) == s)
  }

  test("delta commit carries ALL buckets by link; compaction restates only touched ones") {
    import graft.queries.StreamQueries.{UpsertBuckets, upsertBucket}
    import java.nio.file.{Files, Paths}
    val base = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    // Seed: 200 users span (virtually) all hash buckets — the first
    // commit writes the bucketed base.
    upsertBatch(spark,
      events((1L to 200L).map(u => (u * 2 + 1, 1, u, u.toDouble))),
      base, "state")
    val gen1 = graft.sink.SnapshotSwap.currentSnapshot(base, "state").get
    // Batch 2 touches ONE user -> a DELTA commit: every base bucket
    // carries as a hard link, and _delta/d=0 holds the compacted batch.
    val touchedUser = 42L
    upsertBatch(spark,
      events(Seq((9001L, 5, touchedUser, 7.0))), base, "state")
    val gen2 = graft.sink.SnapshotSwap.currentSnapshot(base, "state").get
    def partFiles(gen: String, sub: String): Seq[java.nio.file.Path] = {
      val dir = Paths.get(base, gen, sub)
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
    val seeded = (0 until UpsertBuckets)
      .filter(b => partFiles(gen1, s"bucket=$b").nonEmpty)
    assert(seeded.size > UpsertBuckets / 2)
    seeded.foreach { b =>
      val f1 = partFiles(gen1, s"bucket=$b")
      val f2 = partFiles(gen2, s"bucket=$b")
      assert(f1.map(_.getFileName) == f2.map(_.getFileName), s"bucket $b")
      f1.zip(f2).foreach { case (a, c) =>
        assert(Files.isSameFile(a, c), s"bucket $b was rewritten on a delta commit")
      }
    }
    assert(partFiles(gen2, "_delta/d=0").nonEmpty, "delta entry missing")
    // The compaction merge's base-state read is partition-pruned to
    // the touched buckets: the scan plan carries a PartitionFilter on
    // bucket, so untouched buckets never enter the join.
    val p = graft.queries.StreamQueries
      .upsertMerged(spark,
        events(Seq((9003L, 6, touchedUser, 8.0))), base, "state")
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("bucket"), p)
    // Batch 3 at cadence=2 forces a COMPACTION: the buffered delta
    // (user 42) and the batch (user 43) fold into the base — only
    // their buckets restate, the rest carry by link, the buffer drops.
    val otherUser = 43L
    upsertBatch(spark, events(Seq((9005L, 6, otherUser, 8.0))),
      base, "state", cadence = 2)
    val gen3 = graft.sink.SnapshotSwap.currentSnapshot(base, "state").get
    assert(!Files.isDirectory(Paths.get(base, gen3, "_delta")),
      "compaction must drop the delta buffer")
    val touchedBuckets = spark.range(1).select(
      upsertBucket(lit(touchedUser)).as("a"),
      upsertBucket(lit(otherUser)).as("b")).head()
    val restated = Set(touchedBuckets.getInt(0), touchedBuckets.getInt(1))
    seeded.foreach { b =>
      val f2 = partFiles(gen2, s"bucket=$b")
      val f3 = partFiles(gen3, s"bucket=$b")
      if (restated.contains(b)) {
        assert(f3.nonEmpty && f2.map(_.getFileName.toString)
          .intersect(f3.map(_.getFileName.toString)).isEmpty,
          s"touched bucket $b not restated")
      } else {
        assert(f2.map(_.getFileName) == f3.map(_.getFileName), s"bucket $b")
        f2.zip(f3).foreach { case (a, c) =>
          assert(Files.isSameFile(a, c), s"bucket $b was rewritten")
        }
      }
    }
    // And the merged STATE is complete and correct at every step.
    val s3 = state(base)
    assert(s3.exists(r => r._1 == touchedUser && r._3 == 9001L && r._4 == 700L))
    assert(s3.exists(r => r._1 == otherUser && r._3 == 9005L && r._4 == 800L))
    assert(s3.size == 200)
  }

  test("merge-on-read fold is bucket-pruned: cold buckets pass through scan-only") {
    import graft.queries.StreamQueries.upsertStateOf
    val base = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    upsertBatch(spark,
      events((1L to 200L).map(u => (u * 2 + 1, 1, u, u.toDouble))),
      base, "state")
    upsertBatch(spark, events(Seq((9001L, 5, 42L, 7.0))), base, "state")
    val snap = graft.sink.SnapshotSwap.currentSnapshot(base, "state").get
    val plan = upsertStateOf(spark, s"$base/$snap")
      .queryExecution.executedPlan.toString
    // Both base branches are partition-pruned on bucket; the max_by
    // aggregate (one partial+final pair) sits over the HOT slice only,
    // so the cold branch contributes a bare scan to the union.
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("Union"), plan)
    assert("HashAggregate".r.findAllIn(plan).length <= 4, plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Join"), plan)
    // And the pruned fold is still the complete state.
    assert(upsertState(spark, base, "state").count() == 200)
  }

  test("carried links survive the stale-generation sweep (AS-OF folds stay readable)") {
    // gen2/gen3 are delta commits carrying gen1's buckets as hard
    // LINKS; committing gen3 sweeps gen1's directory (versions
    // strictly older than the published one). The links must keep the
    // inodes alive: gen2 (now HEAD's parent, AS-OF-readable) and gen3
    // (HEAD) must both fold complete state after the sweep.
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
    // AS-OF fold of the intermediate generation still works: its
    // carried buckets and carried delta entries are links whose
    // inodes outlive gen1's dir.
    val asOf2 = upsertStateAt(spark, base, "state", 2L)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(asOf2.size == 100)
    assert(asOf2(42L) == 9001L)
    assert(asOf2(43L) == 87L) // still the seed op at version 2
  }

  test("bytes rule: a buffer outgrowing the state compacts; small deltas append") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    // Seed: a small base state.
    upsertBatch(spark, events(Seq((1L, 1, 1L, 2.0), (3L, 2, 2L, 3.0))),
      base, "state")
    assert(graft.sink.SnapshotSwap.bufferedDeltaCount(base, "state") == 0)
    // A FAT batch (10k distinct users) lands as a delta append
    // (buffer was empty when judged) ...
    val fat = events((0 until 10000).map(i =>
      (1000L + i, 3, 100L + i, i.toDouble)))
    upsertBatch(spark, fat, base, "state")
    assert(graft.sink.SnapshotSwap.bufferedDeltaCount(base, "state") == 1)
    assert(graft.sink.SnapshotSwap.bufferedDeltaBytes(base, "state") >
      2L * graft.sink.SnapshotSwap.stateDataBytes(base, "state"))
    // The cadence signal is MANIFEST-CARRIED (O(1) `_STATS` marker per
    // generation, derived incrementally on delta appends), and the
    // marker agrees byte-for-byte with the repair/audit walk.
    val snapB = graft.sink.SnapshotSwap.currentSnapshot(base, "state").get
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(base, snapB, "_STATS")))
    val (walkState, walkDelta) =
      graft.sink.SnapshotSwap.walkedBytes(base, "state")
    assert(graft.sink.SnapshotSwap.stateDataBytes(base, "state") == walkState)
    assert(graft.sink.SnapshotSwap.bufferedDeltaBytes(base, "state") == walkDelta)
    // ... and the NEXT commit sees buffered bytes >= frac x state
    // bytes and compacts — no fixed cadence involved (depth is far
    // below the backstop).
    upsertBatch(spark, events(Seq((5L, 4, 1L, 7.0))), base, "state")
    assert(graft.sink.SnapshotSwap.bufferedDeltaCount(base, "state") == 0)
    // The COMPACTION (merge-on-write) generation's marker is exact
    // too: its incremental derivation (parent marker adjusted by the
    // restated partitions) must equal the audit walk byte-for-byte.
    val (mowState, mowDelta) =
      graft.sink.SnapshotSwap.walkedBytes(base, "state")
    assert(graft.sink.SnapshotSwap.cadenceBytes(base, "state") ==
      ((mowState, mowDelta)))
    assert(mowDelta == 0L)
    val s = state(base)
    assert(s.size == 10002, s.size)
    assert(s.exists(r => r._1 == 1L && r._3 == 5L && r._4 == 700L))
  }

  test("final state is micro-batch-split independent") {
    val log = Seq((1L, 1, 1L, 2.0), (22L, 3, 2L, 9.0), (3L, 2, 1L, 3.0),
      (5L, 4, 3L, 4.0), (44L, 5, 3L, 1.0), (7L, 6, 2L, 8.0))
    val whole = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    upsertBatch(spark, events(log), whole, "state")
    val split = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    // An adversarial split: out-of-time-order slices of size 2 —
    // under the adaptive bytes rule the tiny slices rival the tiny
    // state, so some commits append and some compact; the state
    // equality below holds EITHER way (the algebra, not the cadence,
    // is the exactly-once protocol).
    log.grouped(2).foreach(b => upsertBatch(spark, events(b), split, "state"))
    assert(state(whole) == state(split))
    // The split run kept one snapshot generation per batch.
    assert(graft.sink.SnapshotSwap.currentVersion(split, "state") == 3L)
    // A split whose cadence forces a mid-stream compaction folds to
    // the same state too.
    val split2 = java.nio.file.Files
      .createTempDirectory("graft_supsert_spec").toString
    log.grouped(2).foreach(b =>
      upsertBatch(spark, events(b), split2, "state", cadence = 2))
    assert(state(whole) == state(split2))
  }
}
