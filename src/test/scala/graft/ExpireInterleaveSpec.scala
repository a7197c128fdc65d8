package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicBoolean
import graft.sink.SnapshotSwap

/** Maintenance-vs-writer interleaving (r16 verdict ask #6): the
  * individually-tested pieces (`expireSnapshots`, `removeOrphans`,
  * racing writers, `_STATS`/`_PARENT` markers) meet here — maintenance
  * runs WHILE a delta-append commit is in flight on the same table.
  *
  * The hazard: a delta-append stages its new generation dir (with hard
  * links to the parent's entire base) BEFORE it takes the commit lock,
  * so maintenance that runs in that window observes an unreferenced
  * dir carrying the next version number. The protocol's protections,
  * each asserted at the exact worst point via the `beforeCommit` seam:
  *  - expire keeps the staged dir because its version is in the
  *    newest-retainLast set, and keeps the published HEAD by name even
  *    when retainLast=1 would version-evict it;
  *  - the orphan scan sees the staged dir as unreferenced but the
  *    GRACE PERIOD retains it (it is seconds old by construction);
  *  - markers (`_STATS`, `_PARENT`) live inside generation dirs, so
  *    neither op can strip a marker without deleting the whole
  *    generation — which the two rules above forbid for live ones.
  */
class ExpireInterleaveSpec extends SparkSpecBase {

  import graft.queries.StreamQueries.{upsertBatch, upsertState}

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

  test("expire + orphan scan at the staged-but-uncommitted point delete nothing live") {
    val base = Files.createTempDirectory("graft_expint").toString
    upsertBatch(spark,
      events((1L to 50L).map(u => (u * 2 + 1, 1, u, u.toDouble))),
      base, "state")
    val gen1 = SnapshotSwap.currentSnapshot(base, "state").get
    val seamRan = new AtomicBoolean(false)
    SnapshotSwap.beforeCommit = () => {
      // Only the TABLE commit matters here (ref commits share the
      // seam); the staged next generation is the one whose version
      // exceeds HEAD's.
      if (!seamRan.getAndSet(true)) {
        val stagedNow = Files.list(Paths.get(base))
        val staged = try {
          import scala.jdk.CollectionConverters._
          stagedNow.iterator().asScala.map(_.getFileName.toString)
            .filter(n => n.startsWith("_snap_state-") && n != gen1).toList
        } finally stagedNow.close()
        assert(staged.nonEmpty, "seam fired before the stager ran?")
        // Worst-point maintenance: aggressive retention + the default
        // grace period, exactly what a scheduled maintenance job runs.
        val expired = SnapshotSwap.expireSnapshots(base, "state",
          retainLast = 1)
        val orphaned = SnapshotSwap.removeOrphans(base, "state")
        assert(expired.isEmpty,
          s"expire at the staged point deleted versions $expired — " +
            "HEAD must be name-protected and the staged version kept")
        assert(!orphaned.exists(_.startsWith("_snap_")),
          s"orphan scan deleted generation dirs $orphaned under grace")
        assert(Files.exists(Paths.get(base, gen1)),
          "published HEAD deleted while its successor was uncommitted")
        staged.foreach { n =>
          assert(Files.exists(Paths.get(base, n)),
            s"staged in-flight generation $n deleted by maintenance")
        }
      }
    }
    try upsertBatch(spark,
      events(Seq((9001L, 5, 42L, 7.0))), base, "state")
    finally SnapshotSwap.beforeCommit = () => ()
    assert(seamRan.get(), "the commit seam never fired")

    // The append committed over the interleaved maintenance: pointer
    // advanced, markers intact (the O(1) cadence read equals the audit
    // walk), fold serves base ∪ delta.
    val gen2 = SnapshotSwap.currentSnapshot(base, "state").get
    assert(gen2 != gen1)
    assert(Files.exists(Paths.get(base, gen2, "_STATS")))
    assert(Files.exists(Paths.get(base, gen2, "_PARENT")))
    assert(SnapshotSwap.cadenceBytes(base, "state") ==
      SnapshotSwap.walkedBytes(base, "state"))
    val s = state(base)
    assert(s.size == 50)
    assert(s.exists(r => r._1 == 42L && r._3 == 9001L && r._4 == 700L))

    // AFTER the commit the same expire MAY reclaim gen1 (normal
    // retention); the carried links must keep HEAD's fold complete.
    SnapshotSwap.expireSnapshots(base, "state", retainLast = 1)
    assert(!Files.exists(Paths.get(base, gen1)),
      "post-commit expire should reclaim the old generation")
    assert(state(base) == s,
      "HEAD fold changed after expiring its parent — links broken")
  }

  test("a maintenance loop racing a stream of append/compact commits corrupts nothing") {
    // The nondeterministic companion of the seam test: maintenance
    // (expire retainLast=2 + orphan scan under default grace) loops on
    // its own thread while the writer lands 12 commits under the
    // adaptive cadence (some append, some compact). The same batch
    // sequence into a quiet base is the ground truth.
    val loud = Files.createTempDirectory("graft_expint_loud").toString
    val quiet = Files.createTempDirectory("graft_expint_quiet").toString
    val batches = (0 until 12).map { i =>
      events((1L to 30L).map { u =>
        (i * 1000L + u * 2 + 1, 1 + i, u, (u + i).toDouble)
      })
    }
    val stop = new AtomicBoolean(false)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val maint = new Thread(() => {
      while (!stop.get()) {
        try {
          SnapshotSwap.expireSnapshots(loud, "state", retainLast = 2)
          SnapshotSwap.removeOrphans(loud, "state")
          Thread.sleep(1)
        } catch { case t: Throwable => errors.add(t) }
      }
    }, "graft-maintenance-loop")
    maint.setDaemon(true)
    maint.start()
    try batches.foreach(b => upsertBatch(spark, b, loud, "state"))
    finally { stop.set(true); maint.join(30000) }
    assert(errors.isEmpty,
      s"maintenance loop threw: ${Option(errors.peek()).map(_.toString)}")

    batches.foreach(b => upsertBatch(spark, b, quiet, "state"))
    assert(state(loud) == state(quiet),
      "state under racing maintenance diverged from the quiet run")
    assert(SnapshotSwap.cadenceBytes(loud, "state") ==
      SnapshotSwap.walkedBytes(loud, "state"),
      "byte-total marker desynced from the audit walk under racing maintenance")
  }
}
