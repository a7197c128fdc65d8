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

  test("dirTag distinguishes same-basename dirs and normalizes slashes") {
    assert(Tables.dirTag("/root/testdata/sf0.01") ==
      Tables.dirTag("/root/testdata/sf0.01/"))
    assert(Tables.dirTag("/root/testdata/sf0.01") !=
      Tables.dirTag("/some/other/sf0.01"))
    assert(Tables.dirTag("/root/testdata/sf0.01")
      .startsWith("sf0.01_"))
  }
}
