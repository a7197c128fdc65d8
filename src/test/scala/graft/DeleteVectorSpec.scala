package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q_delete_vectors' protocol half (the DV-applied ANSWER is the
  * DuckDB oracle's job): merge-on-read equals copy-on-write, the DV
  * references only files that actually hold deleted rows, and the
  * delete touches no data file. */
class DeleteVectorSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  private def paths(tag: String) = {
    val root = s"${graft.Tables.scratchRoot}/graft_dv_$tag"
    (root, s"$root/data", s"$root/dv")
  }

  test("merge-on-read read equals the copy-on-write rewrite") {
    SparkEntry.queries("q_delete_vectors")(spark, dir).collect()
    val (_, dataDir, dvDir) = paths(graft.Tables.dirTag(dir))
    def posed = spark.read.parquet(dataDir)
      .withColumn("file", input_file_name())
      .withColumn("pos", row_number().over(
        Window.partitionBy("file").orderBy("o_orderkey")))
    val mor = posed
      .join(spark.read.parquet(dvDir), Seq("file", "pos"), "left_anti")
      .select("o_orderkey", "o_orderstatus", "cents")
    // Copy-on-write: rewrite with the predicate applied directly.
    val cow = spark.read.parquet(dataDir)
      .filter(!(col("o_orderstatus") === "F" &&
        col("o_orderkey") % 13 === 0))
      .select("o_orderkey", "o_orderstatus", "cents")
    assert(mor.exceptAll(cow).isEmpty && cow.exceptAll(mor).isEmpty)
    // The DV marks exactly the predicate's rows.
    val nDv = spark.read.parquet(dvDir).count()
    val nPred = spark.read.parquet(dataDir)
      .filter(col("o_orderstatus") === "F" &&
        col("o_orderkey") % 13 === 0).count()
    assert(nDv == nPred && nDv > 0, s"dv=$nDv pred=$nPred")
  }

  test("the DV references only files holding deleted rows; data files untouched") {
    SparkEntry.queries("q_delete_vectors")(spark, dir).collect()
    val (_, dataDir, dvDir) = paths(graft.Tables.dirTag(dir))
    def census() = new java.io.File(dataDir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(f => f.getName -> (f.length, f.lastModified)).toMap
    val before = census()
    // Re-running the DELETE (a second writer pass) must rewrite only
    // the sidecar, never the data.
    val dvFiles = spark.read.parquet(dvDir)
      .select("file").distinct().count()
    assert(dvFiles >= 1 && dvFiles <= before.size)
    SparkEntry.queries("q_delete_vectors")(spark, dir).collect()
    assert(census() == before)
  }
}
