package graft

import org.apache.spark.sql.functions._

/** q_time_fill semantic invariants — the gate's oracle hash-verifies the
  * values; these pin the CONTRACT (dense grid, conservation, LOCF) so a
  * refactor can't satisfy the fixture by accident. */
class TimeSeriesFillSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  // NOT cached: the shared session's cache manager would substitute an
  // InMemoryRelation into PlanQualitySpec's identical plan and mask the
  // very shapes that gate asserts.
  private lazy val out =
    SparkEntry.queries("q_time_fill")(spark, dir)

  test("grid is dense: consecutive days, one row per (user, day)") {
    val gaps = out
      .withColumn("prev", lag("day", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("day")))
      .filter(col("prev").isNotNull &&
        datediff(col("day"), col("prev")) =!= 1)
      .count()
    assert(gaps == 0)
    val dup = out.groupBy("user_id", "day").count()
      .filter(col("count") > 1).count()
    assert(dup == 0)
  }

  test("fill conserves the event count and spans min..max per user") {
    val total = graft.Tables.events(spark, dir).count()
    val summed = out.agg(sum("n_events")).first().getLong(0)
    assert(summed == total, s"filled sum $summed != events $total")
    // First grid day per user is an OBSERVED day (span starts at min),
    // so its n_events > 0 and last_type is non-null from row one.
    val firsts = out
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("day")))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("n_events") === 0).count() == 0)
    assert(firsts.filter(col("last_type").isNull).count() == 0)
  }

  test("LOCF: gap rows carry the previous observed closing type") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    val bad = out
      .withColumn("prev_type", lag("last_type", 1).over(w))
      .filter(col("n_events") === 0 &&
        col("last_type") =!= col("prev_type"))
      .count()
    assert(bad == 0, "a zero-event day changed the carried type")
    // And the fixture actually exercises gaps (otherwise this spec
    // would vacuously pass on a dense-by-chance fixture).
    assert(out.filter(col("n_events") === 0).count() > 0)
  }
}
