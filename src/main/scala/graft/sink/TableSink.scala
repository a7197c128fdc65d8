package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Per-table batch file sink (P10/P14/P15): each table written as a
  * partitioned parquet or CSV directory, routed through the staging→prod
  * snapshot swap so a sync is all-or-nothing per table (reference:
  * arrow/writer.py:222-309 lazily creates one writer per table;
  * sql.py:245-261 chunks inserts — in Spark both collapse into the
  * DataFrame writer, with file sizing governed by partitioning).
  *
  * Cloud paths (s3a://, gs://) work through the same API via Hadoop FS
  * connectors (reference's boto3/GCS upload, arrow/writer.py:187-219) —
  * swap semantics degrade to best-effort on object stores (SURVEY §7.4).
  */
object TableSink {

  /** Sync-write concurrency (SPARK_GRAFT_SYNC_POOL, default 8, 1 =
    * sequential). A real resoto model has hundreds of kinds, and N
    * sequential per-table write JOBS serialize cluster utilization at
    * the sync front door: each small table's write occupies a handful
    * of task slots while every other slot idles. Spark's scheduler is
    * thread-safe, so submitting the per-table jobs from a bounded pool
    * keeps ~pool jobs in flight — wall clock approaches
    * max(largest table, total work / slots) instead of sum(per-table
    * latency). Bounded (not tables.size) so a 500-kind model doesn't
    * enqueue 500 concurrent jobs' worth of driver/backend bookkeeping. */
  private[graft] def syncPool: Int = poolOverride.getOrElse(math.max(1,
    sys.env.getOrElse("SPARK_GRAFT_SYNC_POOL", "8").toInt))

  /** In-JVM A/B seam (tools.SyncPoolProbe) — env is fixed per JVM. */
  @volatile private[graft] var poolOverride: Option[Int] = None

  /** Run `f` over the table map on a bounded worker pool, preserving
    * per-table failure (first exception rethrown after the pool
    * drains). The staging reads feeding each `df` are isolated by
    * construction (Sync's two staging scans), so concurrent per-table
    * writes never race on input. */
  private[graft] def forEachTable[A, B](tables: Map[String, A],
      session: Option[SparkSession] = None,
      poolSize: Option[Int] = None)(
      f: (String, A) => B): Map[String, B] = {
    val items = tables.toSeq
    val bound = math.min(poolSize.getOrElse(syncPool), math.max(1, items.size))
    if (bound <= 1) return items.map { case (n, a) => n -> f(n, a) }.toMap
    val pool = java.util.concurrent.Executors.newFixedThreadPool(bound,
      r => { val t = new Thread(r, "graft-sync-write"); t.setDaemon(true); t })
    // One job group for the whole sync (thread-local, set per worker):
    // cancellation must stop the SPARK JOBS, not just interrupt the
    // submitting threads — an interrupted thread returns while its
    // already-scheduled job keeps writing part- files into staging.
    // The session is resolved ONCE on the calling thread (getActiveSession
    // is thread-local and would be None inside the pool workers); callers
    // that hold DataFrames pass their own session so cancellation works
    // even when no default session is set.
    val groupId = s"graft-sync-write-${java.util.UUID.randomUUID()}"
    val sess = session
      .orElse(org.apache.spark.sql.SparkSession.getActiveSession)
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    if (sess.isEmpty)
      System.err.println("graft-sync-write: no SparkSession available; " +
        "failure-path job cancellation is disabled for this sync")
    try {
      // Completion-ordered observation (ExecutorCompletionService), not
      // submission-ordered gets: the FIRST failing table surfaces as
      // soon as it fails, so cancellation reaches still-running sibling
      // writes — with in-order gets, a failure in table k would go
      // unobserved until tables 1..k-1 finished, and a 500-kind sync
      // would run hundreds of doomed writes to completion first.
      val ecs = new java.util.concurrent.ExecutorCompletionService[
        (String, B)](pool)
      val futures = items.map { case (n, a) =>
        ecs.submit(new java.util.concurrent.Callable[(String, B)] {
          override def call(): (String, B) = {
            sess.foreach(_.sparkContext.setJobGroup(groupId,
              s"sync write $n", interruptOnCancel = true))
            try n -> f(n, a)
            finally sess.foreach(_.sparkContext.clearJobGroup())
          }
        })
      }
      try {
        val out = Map.newBuilder[String, B]
        var taken = 0
        while (taken < items.size) {
          val fu = ecs.take(); taken += 1
          out += (try fu.get()
                  catch { case e: java.util.concurrent.ExecutionException =>
                    throw e.getCause })
        }
        out.result()
      } catch { case t: Throwable =>
        // A failed sync must not keep writing OTHER tables in the
        // background: cancel the group's running AND FUTURE Spark jobs
        // first (cancelJobGroupAndFutureJobs — plain cancelJobGroup
        // only kills jobs active at call time, so a worker that was
        // BETWEEN actions, e.g. sleeping in a JDBC retry backoff,
        // would submit fresh jobs under the dead group and run its
        // whole write to completion), then drop queued work, and DRAIN
        // the pool before surfacing the first failure. Workers blocked
        // inside a write action are NOT thread-interrupted
        // (cancel(false)): they must stay blocked until their Spark
        // job actually terminates with the cancellation error, so pool
        // drain is equivalent to job termination and a caller that
        // catches and cleans/retries the base dir never races a zombie
        // write. Tables that COMPLETED before the failure surfaced
        // stay published — each table's staging->prod swap is atomic
        // and independent by design.
        sess.foreach(_.sparkContext.cancelJobGroupAndFutureJobs(groupId))
        futures.foreach(_.cancel(false))
        pool.shutdown()
        // A failed/interrupted drain must NEVER report "drained": the
        // caller would clean/retry the base dir while sibling writes
        // are still landing part- files.
        val drained =
          try pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
          catch { case _: InterruptedException =>
            Thread.currentThread().interrupt(); false }
        if (!drained) {
          val e = new IllegalStateException(
            "graft-sync-write pool failed to drain (timeout or caller " +
              "interrupt) after job-group cancellation; staging dirs may " +
              "still be receiving writes — do NOT clean/retry the base dir")
          e.addSuppressed(t)
          throw e
        }
        throw t
      }
    } finally pool.shutdown()
  }

  /** Write every table through the snapshot-swap protocol; returns the
    * prod path per table. Per-table writes are submitted concurrently
    * (bounded pool; each table's staging->prod swap stays atomic and
    * independent — distinct dirs per table). */
  def writeAll(tables: Map[String, DataFrame], base: String): Map[String, String] =
    forEachTable(tables, tables.values.headOption.map(_.sparkSession)) {
      (name, df) => SnapshotSwap.write(df, base, name)
    }

  /** CSV parity for nested data (the reference's CSV converter maps
    * complex kinds to JSON text, arrow/type_converter.py:35-55, and its
    * normalizer json-stringifies non-strings under string leaves,
    * arrow/writer.py:124-168): every array/map/struct column becomes a
    * to_json string column; atomic columns pass through. */
  def stringifyNested(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: MapType | _: StructType =>
          to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** CSV variant (header, explicit layout — reference
    * arrow/writer.py:245-249). Nested columns are stringified to JSON
    * text automatically. */
  def writeAllCsv(tables: Map[String, DataFrame], base: String): Unit = {
    forEachTable(tables, tables.values.headOption.map(_.sparkSession)) {
      (name, df) =>
        stringifyNested(df).write.mode("overwrite").option("header", "true")
          .csv(s"$base/$name")
    }
    ()
  }

  /** Catalog repoint (the "view" half of the swap contract): register
    * each prod dir as a temp view so spark.sql sees the last completed
    * sync (P16 over the synced layout). */
  def registerProd(spark: SparkSession, paths: Map[String, String]): Unit =
    paths.foreach { case (name, path) =>
      spark.read.parquet(path).createOrReplaceTempView(name)
    }

  /** Stale-table sweep — the parquet analogue of the reference's
    * `drop_existing_tables` swap option (sql.py:150-151): remove prod
    * table dirs, and manifest pointers with their snapshot dirs, for
    * tables absent from the current sync (`keep`), and deregister
    * their temp views — a kind that left the model must not keep
    * serving a previous sync's data forever. Internal dirs
    * (`_staging_*`, `_old_*`, `_ingest_*`, `_snap_*`) are never prod
    * tables and are skipped. */
  def dropStaleProd(spark: SparkSession, base: String,
      keep: Set[String]): Unit = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(base)
    if (!Files.exists(dir)) return
    val names = {
      val children = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        children.iterator().asScala.map(_.getFileName.toString).toList
      } finally children.close()
    }
    names.filterNot(_.startsWith("_")).foreach { n =>
      if (n.endsWith(".manifest")) {
        val table = n.stripSuffix(".manifest")
        if (!keep.contains(table)) {
          // EVERY snapshot version, not just the published one: the
          // deferred-retention protocol keeps the predecessor dir
          // alive, and with the manifest gone nothing would ever sweep
          // it.
          names.filter(_.startsWith(s"_snap_$table-"))
            .foreach(snap => SnapshotSwap.rm(Paths.get(base, snap)))
          SnapshotSwap.rm(dir.resolve(n))
          spark.catalog.dropTempView(table)
        }
      } else if (Files.isDirectory(dir.resolve(n)) && !keep.contains(n)) {
        SnapshotSwap.rm(dir.resolve(n))
        spark.catalog.dropTempView(n)
      }
    }
  }
}
