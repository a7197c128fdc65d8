package graft

import java.nio.file.{Files, Paths}
import graft.sink.{SnapshotSwap, TableSink}

/** Mirrors the reference's swap behavior test (tests/sql_test.py:54-67):
  * after a swap, prod contains exactly the new sync; staging is gone. */
class SnapshotSwapSpec extends SparkSpecBase {

  test("staging -> prod swap replaces the previous snapshot atomically") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_swap").toString
    val v1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val v2 = Seq((3, "c")).toDF("id", "v")

    val p1 = SnapshotSwap.write(v1, base, "t")
    assert(spark.read.parquet(p1).count() == 2)

    val p2 = SnapshotSwap.write(v2, base, "t")
    assert(p1 == p2)
    val rows = spark.read.parquet(p2).as[(Int, String)].collect().toSeq
    assert(rows == Seq((3, "c")))
    assert(!Files.exists(Paths.get(base, "_staging_t")))
    assert(!Files.exists(Paths.get(base, "_old_t")))
  }

  test("manifest swap commits without renaming any data directory") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_swap_manifest").toString
    val v1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val v2 = Seq((3, "c")).toDF("id", "v")

    // v1 publish: data dir written once, pointer names it.
    val p1 = SnapshotSwap.writeManifested(v1, base, "t")
    assert(SnapshotSwap.currentSnapshot(base, "t")
      .contains(Paths.get(p1).getFileName.toString))
    assert(SnapshotSwap.readManifested(spark, base, "t").count() == 2)

    // v2 publish: NEW immutable dir (no rename of p1 — rename-less
    // object-store semantics), manifest repointed. The v1 dir is
    // RETAINED through this commit: a reader that resolved the old
    // pointer just before the repoint can finish its read
    // (Iceberg-style snapshot retention; cleanup is deferred to the
    // next sync).
    val p2 = SnapshotSwap.writeManifested(v2, base, "t")
    assert(p2 != p1)
    val rows = SnapshotSwap.readManifested(spark, base, "t")
      .as[(Int, String)].collect().toSeq
    assert(rows == Seq((3, "c")))
    assert(Files.exists(Paths.get(p1))) // retained for in-flight readers
    assert(Files.exists(Paths.get(p2)))

    // v3 publish: v1 (now unreachable by any resolve-then-read) is
    // swept at the start of this sync; v2 is the retained predecessor.
    val v3 = Seq((4, "d")).toDF("id", "v")
    val p3 = SnapshotSwap.writeManifested(v3, base, "t")
    assert(!Files.exists(Paths.get(p1)))
    assert(Files.exists(Paths.get(p2)))
    assert(Files.exists(Paths.get(p3)))

    // An unpublished table fails loudly, not with a half-read.
    intercept[RuntimeException] {
      SnapshotSwap.readManifested(spark, base, "missing")
    }
  }

  test("manifest swap survives an empty snapshot (schema preserved)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_swap_empty").toString
    val empty = Seq.empty[(Int, String)].toDF("id", "v")
    SnapshotSwap.writeManifested(empty, base, "t")
    val back = SnapshotSwap.readManifested(spark, base, "t")
    assert(back.count() == 0)
    assert(back.columns.toSeq == Seq("id", "v"))
  }

  test("stale-table sweep removes every retained snapshot version") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_swap_sweep").toString
    val df = Seq((1, "a")).toDF("id", "v")
    // Two publishes: deferred retention keeps BOTH snapshot dirs.
    val p1 = SnapshotSwap.writeManifested(df, base, "t")
    val p2 = SnapshotSwap.writeManifested(df, base, "t")
    assert(Files.exists(Paths.get(p1)) && Files.exists(Paths.get(p2)))
    // Table leaves the sync: manifest AND all versions must go — with
    // the manifest gone, nothing would ever sweep the predecessor.
    TableSink.dropStaleProd(spark, base, keep = Set.empty)
    assert(!Files.exists(Paths.get(p1)))
    assert(!Files.exists(Paths.get(p2)))
    assert(SnapshotSwap.currentSnapshot(base, "t").isEmpty)
  }

  test("stringifyNested maps complex columns to JSON text for CSV") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, Seq("a", "b"), Map("k" -> 2)))
      .toDF("id", "arr", "m")
      .withColumn("st", struct(col("id").as("x")))
    val flat = graft.sink.TableSink.stringifyNested(df)
    assert(flat.schema.fields.map(_.dataType.typeName).toSeq ==
      Seq("integer", "string", "string", "string"))
    val row = flat.collect().head
    assert(row.getString(1) == """["a","b"]""")
    assert(row.getString(2) == """{"k":2}""")
    assert(row.getString(3) == """{"x":1}""")
  }

  test("writeAll + registerProd: catalog sees the last completed sync") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sink").toString
    val tables = Map(
      "ka" -> Seq(("x", 1)).toDF("id", "n"),
      "kb" -> Seq(("y", 2), ("z", 3)).toDF("id", "n"))
    val paths = TableSink.writeAll(tables, base)
    TableSink.registerProd(spark, paths)
    assert(spark.sql("SELECT count(*) FROM kb").collect().head.getLong(0) == 2)
    assert(spark.sql("SELECT n FROM ka").collect().head.getInt(0) == 1)
  }
}
