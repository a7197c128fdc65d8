package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Schemas are fixed by the generator; we read them as-is (parquet is
  * self-describing) and rely on Catalyst column pruning + filter pushdown
  * reaching the scan. At 100 TB these would be partitioned/bucketed dirs;
  * the API shape (dir + logical name) stays the same.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val all = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so `spark.sql` works over the
    * synced catalog — the Spark analogue of the reference's execute_sql
    * passthrough (reference: collect_plugins.py:220-228). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
