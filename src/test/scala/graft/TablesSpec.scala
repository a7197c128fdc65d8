package graft

/** Catalog registration (P16 passthrough surface): every fixture table —
  * including nanosecond-timestamped events — is queryable via spark.sql
  * after registerAll. */
class TablesSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("registerAll exposes every table to SQL, events included") {
    Tables.registerAll(spark, dir)
    val counts = Tables.all.map { t =>
      t -> spark.sql(s"SELECT count(*) AS c FROM $t").collect().head.getLong(0)
    }.toMap
    assert(counts("region") == 5L)
    assert(counts("nation") == 25L)
    assert(counts("events") == 1000L)
    assert(counts.values.forall(_ > 0))
    // The nanos->micros conversion really landed: hour-level grouping
    // works through SQL on the registered view.
    val hours = spark.sql(
      "SELECT count(DISTINCT date_trunc('hour', ts)) FROM events")
      .collect().head.getLong(0)
    assert(hours > 0)
  }

  test("executeSql binds parameters as typed literals (P16 bind vars)") {
    Tables.registerAll(spark, dir)
    // The reference's own execute_sql test shape: a projection filtered
    // by a bind variable (tests/collect_plugins_test.py:83-96 passes
    // {"parallel": parallel}).
    val rows = Tables.executeSql(spark,
      "SELECT n_name FROM nation WHERE n_nationkey = :key",
      Map("key" -> 3)).collect()
    assert(rows.length == 1)
    // A hostile bind value stays a literal — no injection through binds.
    val none = Tables.executeSql(spark,
      "SELECT n_name FROM nation WHERE n_name = :v",
      Map("v" -> "x' OR '1'='1")).collect()
    assert(none.isEmpty)
    // No binds: plain passthrough.
    assert(Tables.executeSql(spark, "SELECT 1 AS one")
      .collect().head.getInt(0) == 1)
  }

  test("events refuses a non-UTC session instead of shifting instants") {
    // The NTZ->timestamp cast is instant-preserving only under UTC; a
    // non-UTC session must fail loudly, not shift silently (both the
    // Spark side and a DuckDB oracle would shift together, so the
    // correctness gate could never catch it).
    val key = "spark.sql.session.timeZone"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "America/New_York")
    try {
      val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set(key, prev)
  }

  test("events rejects an unexpected ts physical type") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_badts_")
      .toString
    // A string-typed ts is none of the three known fixture generations
    // (INT64 nanos / TIMESTAMP_NTZ micros / TIMESTAMP) — error, don't guess.
    spark.range(3).select(col("id"), lit("2024-01-01").as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, tmp))
    assert(e.getMessage.contains("unexpected type"))
  }

  test("dirTag distinguishes same-basename dirs and normalizes slashes") {
    assert(Tables.dirTag("/root/testdata/sf0.01") ==
      Tables.dirTag("/root/testdata/sf0.01/"))
    assert(Tables.dirTag("/root/testdata/sf0.01") !=
      Tables.dirTag("/some/other/sf0.01"))
    assert(Tables.dirTag("/root/testdata/sf0.01")
      .startsWith("sf0.01_"))
  }

  test("content mode catches a same-size timestamp-preserving swap") {
    // The documented contract limitation, and its paid escape hatch:
    // default fingerprints key on path:size:mtime (a cp -p-style swap
    // is invisible); graft.fp.content=1 folds file SHA-256s in.
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_fp_spec")
    val f = dir.resolve("src.bin")
    Files.write(f, "AAAA".getBytes)
    val t0 = Files.getLastModifiedTime(f)
    def fp() = Tables.sourceFingerprint(Seq(f), "spec")
    val before = fp()
    val beforeContent =
      try { sys.props("graft.fp.content") = "1"; fp() }
      finally sys.props.remove("graft.fp.content")
    // Same-size swap, mtime restored.
    Files.write(f, "BBBB".getBytes)
    Files.setLastModifiedTime(f, t0)
    assert(fp() == before, "default mode should NOT see the swap")
    val afterContent =
      try { sys.props("graft.fp.content") = "1"; fp() }
      finally sys.props.remove("graft.fp.content")
    assert(afterContent != beforeContent, "content mode must see it")
    // Both modes differ from each other (a mode flip also rebuilds).
    assert(before != beforeContent)
  }
}
