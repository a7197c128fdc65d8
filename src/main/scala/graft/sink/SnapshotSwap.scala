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

  private def rm(p: Path): Unit = {
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(rm(_))
        finally children.close() // unclosed list() leaks a dir handle
      }
      Files.deleteIfExists(p)
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
    df.write.mode("overwrite").parquet(staging.toString)
    rm(old)
    if (Files.exists(prod))
      Files.move(prod, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, prod, StandardCopyOption.ATOMIC_MOVE)
    rm(old)
    prod.toString
  }

  /** Swap + read back: the consumer-visible contract (a query against
    * prod sees exactly the last completed sync). */
  def writeAndRead(spark: SparkSession, df: DataFrame, base: String,
      table: String): DataFrame =
    spark.read.parquet(write(df, base, table))
}
