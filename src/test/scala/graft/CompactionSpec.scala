package graft

import org.apache.spark.sql.functions._

/** Layout half of q_compact_files (the correctness half — rewrite
  * preserves every row — is the driver gate's oracle compare): the
  * kernel must bin-pack to exactly the planned file count, and the plan
  * must be a narrow coalesce, never a shuffle. */
class CompactionSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def partFiles(p: String): Array[java.io.File] =
    Option(new java.io.File(p).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.startsWith("part-"))

  test("compaction reduces the file census to the size-derived plan") {
    SparkEntry.queries("q_compact_files")(spark, dir).count()
    val tag = Tables.dirTag(dir)
    val frag = s"${graft.Tables.scratchRoot}/graft_frag_orders_$tag"
    val compacted = s"${graft.Tables.scratchRoot}/graft_compact_orders_$tag"
    val nFrag = partFiles(frag).length
    val nCompact = partFiles(compacted).length
    assert(nFrag == 64)
    // The kernel clamps the plan at the input partition count (coalesce
    // can only merge, never split) — mirror the clamp here so the
    // assertion stays true if a fixture ever plans past 64 inputs.
    val planned = math.min(graft.queries.FnQueries
      .compactionFileCount(frag, 32L << 20), nFrag)
    assert(nCompact == planned, s"compacted=$nCompact planned=$planned")
    assert(nCompact < nFrag)
    // No row lost or duplicated by the rewrite.
    assert(spark.read.parquet(compacted).count() ==
      spark.read.parquet(frag).count())
  }

  test("file-count plan is ceil(bytes/target), floored at 1") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_census_")
    def put(name: String, bytes: Int): Unit =
      java.nio.file.Files.write(tmp.resolve(name), new Array[Byte](bytes))
    put("part-00000", 10 << 20)
    put("part-00001", 10 << 20)
    put("part-00002", 5 << 20)
    put("_SUCCESS", 0) // ignored: not a part file
    val n = graft.queries.FnQueries.compactionFileCount(
      tmp.toString, 8L << 20)
    assert(n == 4) // ceil(25MB / 8MB)
    assert(graft.queries.FnQueries.compactionFileCount(
      tmp.toString, 1L << 30) == 1)
  }

  test("the compaction read+coalesce plan has no shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_narrow_")
      .toString
    Tables.t(spark, dir, "nation").repartition(8)
      .write.mode("overwrite").parquet(tmp)
    val p = spark.read.parquet(tmp).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(p.contains("Coalesce"), p)
    assert(!p.contains("Exchange"), p)
  }
}
