package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic staging→prod snapshot swap (P12) — the Spark-native analogue of
  * the reference's temp-table rename protocol (reference: sql.py:129-159:
  * write `tmp_*`, then ALTER TABLE RENAME into place inside one sync).
  *
  * Protocol: write the new snapshot to `<base>/_staging_<table>`, then
  * atomically move it to `<base>/<table>` (previous snapshot moved aside
  * and dropped only after the new one is in place). Readers that resolve
  * the prod path before the swap keep reading the old files (parquet
  * readers hold file handles); readers after the swap see the complete
  * new snapshot — never a mix.
  *
  * Directory rename is atomic on local/HDFS filesystems; on object stores
  * you would repoint a view/manifest instead (same contract, documented
  * limitation — SURVEY.md §7.4).
  */
object SnapshotSwap {

  private[sink] def rm(p: Path): Unit = {
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(rm(_))
        finally children.close() // unclosed list() leaks a dir handle
      }
      Files.deleteIfExists(p)
    }
  }

  /** Stage `df` as parquet at `dir`, guaranteeing the dir is
    * self-describing: a zero-partition input (e.g. a
    * declared-but-unobserved link table filtered from an empty edge
    * stage) writes only _SUCCESS, and read-back would fail schema
    * inference — materialize the schema as a single empty part file. */
  private def stageParquet(df: DataFrame, dir: Path): Unit = {
    df.write.mode("overwrite").parquet(dir.toString)
    val wrotePart = {
      val children = Files.list(dir)
      try children.anyMatch(p => p.getFileName.toString.startsWith("part-"))
      finally children.close()
    }
    if (!wrotePart) {
      val spark = df.sparkSession
      spark.createDataFrame(
          spark.sparkContext.parallelize(
            Seq.empty[org.apache.spark.sql.Row], 1), df.schema)
        .write.mode("overwrite").parquet(dir.toString)
    }
  }

  /** Write df as the new snapshot of `table` under `base`; returns the
    * prod path. */
  def write(df: DataFrame, base: String, table: String): String = {
    val staging = Paths.get(base, s"_staging_$table")
    val prod = Paths.get(base, table)
    val old = Paths.get(base, s"_old_$table")
    Files.createDirectories(Paths.get(base))
    rm(staging)
    stageParquet(df, staging)
    rm(old)
    if (Files.exists(prod))
      Files.move(prod, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, prod, StandardCopyOption.ATOMIC_MOVE)
    rm(old)
    prod.toString
  }

  // ---- Manifest variant: swap without directory renames --------------
  //
  // Object stores (S3/GCS — the reference's upload targets,
  // arrow/writer.py:187-219) have no atomic directory rename; the
  // industry-standard protocol (Iceberg/Delta-style) publishes an
  // immutable snapshot dir and then atomically swaps a single small
  // POINTER object naming it. Data dirs are never renamed: each sync
  // writes a fresh versioned dir, the manifest repoint IS the commit,
  // and readers resolve through the manifest — they either see the old
  // complete snapshot or the new complete snapshot, never a mix.

  private def manifestPath(base: String, table: String): Path =
    Paths.get(base, s"$table.manifest")

  /** Race-injection seam for tests: invoked after a writer has staged
    * its snapshot dir but before it attempts the pointer commit. */
  private[graft] var beforeCommit: () => Unit = () => ()

  /** Parse the version component out of a snapshot dir name
    * (`_snap_<table>-<version>[-<uniq>]`). */
  private def versionOf(table: String, name: String): Option[Long] = {
    val re = ("^" + java.util.regex.Pattern.quote(s"_snap_$table-") +
      "(\\d+)").r
    re.findFirstMatchIn(name).map(_.group(1).toLong)
  }

  /** The currently published snapshot dir name, if any. */
  def currentSnapshot(base: String, table: String): Option[String] = {
    val m = manifestPath(base, table)
    if (Files.exists(m)) Some(Files.readString(m).trim) else None
  }

  /** Write df as a fresh immutable versioned dir and atomically repoint
    * the manifest at it. Returns the new snapshot path.
    *
    * Cleanup is DEFERRED, not done in the commit path: the
    * currently-published snapshot is retained through this commit (an
    * in-flight reader that resolved the old pointer just before the
    * repoint can still finish its read — the Iceberg-style retention
    * the protocol is modeled on); snapshots older than that are swept
    * here, at the START of the next sync.
    *
    * Concurrency (optimistic, Iceberg-style — the reference sidesteps
    * this by pinning the whole sync in one DB transaction,
    * collect_plugins.py:193-194): every writer stages into a dir whose
    * name carries a writer-unique suffix, so racing syncs can never
    * write into each other's snapshot; the sweep only removes versions
    * strictly OLDER than the published one, so it can never delete a
    * competing in-flight dir from the same generation; and the pointer
    * commit is a compare-and-swap — if the manifest no longer names the
    * snapshot this sync started from, the writer removes its own dir
    * and throws ConcurrentModificationException for the caller to retry
    * from the new snapshot. The commit critical section is serialized
    * by an O_EXCL lock file (the object-store analogue is a
    * conditional/If-Match PUT of the pointer object). */
  def writeManifested(df: DataFrame, base: String, table: String): String = {
    Files.createDirectories(Paths.get(base))
    val prev = currentSnapshot(base, table)
    val pubVersion = prev.flatMap(versionOf(table, _)).getOrElse(0L)
    val version = pubVersion + 1
    val uniq = java.lang.Long.toHexString(
      System.nanoTime() ^ Thread.currentThread().getId << 48)
    val dataDir = Paths.get(base, s"_snap_$table-$version-$uniq")
    // Sweep snapshots strictly older than the published one (retained
    // across the previous commit for its in-flight readers, now
    // unreachable for any reader that resolves the pointer from here
    // on). Same-generation dirs — lost-race leftovers or a competitor
    // staging right now — are left alone until the version advances.
    // Before the FIRST commit there is no published version at all, so
    // nothing is provably stale: every dir is either a crashed first
    // sync's leftover (swept one generation later) or a competitor
    // staging right now — sweeping here would delete an in-flight
    // writer's dir out from under it.
    val prefix = s"_snap_$table-"
    val stale = {
      val children = Files.list(Paths.get(base))
      try {
        import scala.jdk.CollectionConverters._
        children.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.startsWith(prefix) && prev.nonEmpty &&
            !prev.contains(n) &&
            versionOf(table, n).exists(_ < pubVersion))
          .toList
      } finally children.close()
    }
    stale.foreach(n => rm(Paths.get(base, n)))
    stageParquet(df, dataDir)
    beforeCommit()
    // Single-object atomic publish (the local analogue of an atomic
    // object PUT): re-check the pointer under the lock, stage the new
    // pointer, move it over the manifest.
    val lock = Paths.get(base, s"_commit_lock_$table")
    var acquired = false
    var tries = 0
    while (!acquired) {
      try { Files.createFile(lock); acquired = true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // A crashed writer must not wedge every future commit: the
          // critical section is microseconds, so a lock older than 30 s
          // is abandoned — break it and retry (the object-store
          // analogue is a lease-expiring lock entry).
          try {
            if (Files.getLastModifiedTime(lock).toMillis <
                System.currentTimeMillis() - 30000)
              Files.deleteIfExists(lock)
          } catch { case _: java.io.IOException => () }
          tries += 1
          if (tries > 2500) sys.error(s"commit lock stuck: $lock")
          Thread.sleep(2)
      }
    }
    try {
      if (currentSnapshot(base, table) != prev) {
        rm(dataDir)
        throw new java.util.ConcurrentModificationException(
          s"snapshot of '$table' advanced past " +
            s"${prev.getOrElse("<none>")} during this sync; retry from " +
            "the new snapshot")
      }
      val tmp = Paths.get(base, s"_manifest_tmp_${table}_$uniq")
      Files.writeString(tmp, dataDir.getFileName.toString)
      Files.move(tmp, manifestPath(base, table),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(lock)
    dataDir.toString
  }

  /** Reader half of the manifest protocol: resolve the pointer, read
    * the snapshot it names. */
  def readManifested(spark: SparkSession, base: String,
      table: String): DataFrame = {
    val snap = currentSnapshot(base, table).getOrElse(
      sys.error(s"no published snapshot for $table under $base"))
    spark.read.parquet(Paths.get(base, snap).toString)
  }

  /** Swap + read back: the consumer-visible contract (a query against
    * prod sees exactly the last completed sync). */
  def writeAndRead(spark: SparkSession, df: DataFrame, base: String,
      table: String): DataFrame =
    spark.read.parquet(write(df, base, table))
}
