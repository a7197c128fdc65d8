package graft

import org.apache.spark.sql.functions._

/** q_stream_sliding invariants: the epoch-aligned sliding-window
  * assignment rule — every event lands in EXACTLY length/slide open
  * windows, windows are slide-aligned and length-long, and the
  * aggregate totals conserve the event stream under the overlap
  * factor. The end-to-end value compare against the cross-joined
  * batch twin is the DuckDB oracle's job. */
class StreamSlidingSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("sliding windows conserve events at the overlap factor and stay aligned") {
    val out = SparkEntry.queries("q_stream_sliding")(spark, dir)
      .localCheckpoint()
    val events = Tables.events(spark, dir).localCheckpoint()
    val nEvents = events.count()

    // Overlap factor 2h/1h = 2: per-type window counts sum to 2x the
    // type's event count — no event dropped, none triple-assigned.
    val perType = out.groupBy("event_type").agg(sum("n").as("sn"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perTypeEv = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perType.keySet == perTypeEv.keySet)
    perTypeEv.foreach { case (t, n) =>
      assert(perType(t) == 2 * n, s"type $t: ${perType(t)} != 2*$n")
    }

    // Every window is exactly 2h long with an hour-aligned start, and
    // id extrema sit inside the corpus range.
    val bad = out.filter(
      col("win_end_us") - col("win_start_us") =!= lit(7200000000L) ||
        col("win_start_us") % 3600000000L =!= 0 ||
        col("min_ev") > col("max_ev")).count()
    assert(bad == 0)

    // Each event's timestamp falls inside both of its two windows:
    // equivalently, for every (window, type) group some event of that
    // type has trunc_h(ts) == win_start or win_start + 1h. Spot-check
    // via the reverse derivation: regenerate the assignment in batch
    // and compare group counts.
    val twin = events
      .select(col("event_type"), col("event_id"),
        expr("date_trunc('hour', ts)").as("h"))
      .select(col("event_type"), col("event_id"),
        explode(array(
          unix_micros(col("h")),
          unix_micros(col("h")) - 3600000000L)).as("win_start_us"))
      .groupBy("win_start_us", "event_type")
      .agg(count(lit(1)).as("n"))
    val mismatches = out.select("win_start_us", "event_type", "n")
      .exceptAll(twin).count() +
      twin.exceptAll(out.select("win_start_us", "event_type", "n")).count()
    assert(mismatches == 0)
  }
}
