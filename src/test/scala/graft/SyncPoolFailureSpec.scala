package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.functions._

/** Failure injection for the pooled sync front door
  * (TableSink.forEachTable): one table's write fails mid-sync while
  * sibling writes are in flight on the pool. The contract under test is
  * the one a caller that catches-and-retries depends on — by the time
  * the failure surfaces, the job group is cancelled and the pool is
  * DRAINED, so no zombie Spark job is still landing part- files into
  * any staging dir, and a retry of the same sync into the same base
  * succeeds cleanly (reference anchor: the one-transaction-per-sync
  * atomicity contract, collect_plugins.py:193-194).
  */
class SyncPoolFailureSpec extends SparkSpecBase {

  /** Every regular file under `base` with its size — the zombie probe.
    * Stable census ⇒ nothing is still writing. */
  private def census(base: String): Map[String, Long] = {
    val root = Paths.get(base)
    if (!Files.isDirectory(root)) return Map.empty
    val walk = Files.walk(root)
    try {
      val b = Map.newBuilder[String, Long]
      walk.forEach { p =>
        if (Files.isRegularFile(p))
          b += (root.relativize(p).toString ->
            (try Files.size(p) catch { case _: java.io.IOException => -1L }))
      }
      b.result()
    } finally walk.close()
  }

  test("a failing table write cancels siblings, drains the pool, and the retry succeeds") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_syncpool_fail").toString
    // Slow sibling tables: per-row sleep keeps their write JOBS in
    // flight on the pool when the bad table throws.
    val slowRow = udf { (i: Long) => Thread.sleep(2L); i }
    val siblings = (1 to 4).map { k =>
      s"t$k" -> spark.range(0, 800, 1, 8).select(slowRow($"id").as("v"))
    }.toMap
    // The bad table fails once some rows have flowed (a mid-write
    // failure, not a planning failure).
    val boom = udf { (i: Long) =>
      if (i >= 100) throw new RuntimeException("injected sync failure"); i
    }
    val bad = spark.range(0, 800, 1, 8).select(boom($"id").as("v"))

    graft.sink.TableSink.poolOverride = Some(8)
    try {
      val thrown = intercept[Throwable] {
        graft.sink.TableSink.writeAll(siblings + ("bad" -> bad), base)
      }
      // The ROOT failure is reachable from what surfaced (the first
      // rethrow may be a sibling's cancellation error only if drain
      // ordering broke — the injected boom must be in the chain).
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else t.getMessage +: (messages(t.getCause) ++
          t.getSuppressed.toSeq.flatMap(messages))
      assert(messages(thrown).exists(m =>
        m != null && m.contains("injected sync failure")), thrown.toString)

      // (a) No zombie writes: by rethrow time the pool has drained and
      // the job group is cancelled, so the on-disk census is STABLE —
      // no part- file appears or grows afterwards.
      val before = census(base)
      Thread.sleep(3000)
      val after = census(base)
      assert(after == before,
        s"files changed after the sync failure surfaced: " +
          s"${(after.toSet diff before.toSet) ++ (before.toSet diff after.toSet)}")
      // The FAILED table itself is never published (its swap never
      // ran); siblings that completed before the failure MAY be — each
      // table's staging->prod swap is atomic and independent by design.
      assert(!Files.isDirectory(Paths.get(base, "bad")),
        "the failed table must not have been promoted to prod")

      // (b) A retry of the same sync (bad table fixed) succeeds into
      // the same base, proving the failed attempt left no poisoned
      // staging state behind.
      val fixed = siblings + ("bad" ->
        spark.range(0, 800, 1, 8).select($"id".as("v")))
      val paths = graft.sink.TableSink.writeAll(fixed, base)
      assert(paths.keySet == fixed.keySet)
      paths.foreach { case (_, p) =>
        assert(spark.read.parquet(p).count() == 800L)
      }
    } finally graft.sink.TableSink.poolOverride = None
  }
}
