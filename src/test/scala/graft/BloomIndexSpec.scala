package graft

import org.apache.spark.sql.functions._

/** q_point_lookup's layout half (the answer itself is the DuckDB
  * oracle's job): the per-file bloom index must actually SKIP files on
  * a point lookup, and the pruned read must equal the full scan — the
  * no-false-negatives contract. */
class BloomIndexSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  test("bloom index skips files and the pruned answer equals the full scan") {
    // Run the gate once so the derived layout + index exist.
    SparkEntry.queries("q_point_lookup")(spark, dir).collect()
    val tag = graft.Tables.dirTag(dir)
    val root = s"${graft.Tables.scratchRoot}/graft_bloomidx_$tag"
    val idx = spark.read.parquet(s"$root/idx").select("file", "bf").collect()
    val key = graft.Tables.t(spark, dir, "orders")
      .agg(max("o_custkey")).head().getLong(0) / 3L
    val hashed = spark.range(1).select(expr(s"xxhash64(${key}L)"))
      .head().getLong(0)
    val selected = idx.filter { r =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bf")))
        .mightContainLong(hashed)
    }.map(_.getString(0)).toSeq
    assert(selected.nonEmpty)
    assert(selected.size < idx.length,
      s"no skipping: ${selected.size} of ${idx.length} files selected")
    val pruned = spark.read.parquet(selected: _*)
      .filter(col("o_custkey") === key).agg(count(lit(1)), sum("cents"))
      .head()
    val full = spark.read.parquet(s"$root/data")
      .filter(col("o_custkey") === key).agg(count(lit(1)), sum("cents"))
      .head()
    assert(pruned == full, s"pruned=$pruned full=$full")
    assert(full.getLong(0) > 0L) // the probe key actually exists
  }

  test("an absent key returns an empty (or FP-only) file set, never a wrong row") {
    SparkEntry.queries("q_point_lookup")(spark, dir).collect()
    val tag = graft.Tables.dirTag(dir)
    val root = s"${graft.Tables.scratchRoot}/graft_bloomidx_$tag"
    val idx = spark.read.parquet(s"$root/idx").select("file", "bf").collect()
    val absent = graft.Tables.t(spark, dir, "orders")
      .agg(max("o_custkey")).head().getLong(0) + 1000000L
    val hashed = spark.range(1).select(expr(s"xxhash64(${absent}L)"))
      .head().getLong(0)
    val selected = idx.filter { r =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bf")))
        .mightContainLong(hashed)
    }.map(_.getString(0)).toSeq
    val n =
      if (selected.isEmpty) 0L
      else spark.read.parquet(selected: _*)
        .filter(col("o_custkey") === absent).count()
    assert(n == 0L)
  }
}
