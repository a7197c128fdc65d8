package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The layout half of q_sink_sorted (the value half is the driver
  * gate's oracle): a narrow time slice against the range-sorted event
  * log must MATERIALIZE only the row groups whose stats intersect the
  * slice — the INT96→INT64 writer default (SparkEnv) is what makes
  * the stats exist at all. */
class SortedSinkSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("time slice materializes a fraction of the sorted event log") {
    // Build the sorted sink exactly as the gate does.
    SparkEntry.queries("q_sink_sorted")(spark, dir).count()
    val sorted = s"${graft.Tables.scratchRoot}/graft_sorted_events_${Tables.dirTag(dir)}"
    val total = spark.read.parquet(sorted).count()
    val ev = Tables.events(spark, dir)
    val t0 = ev.agg(min("ts")).head().getTimestamp(0).toInstant
    val lo = java.sql.Timestamp.from(
      t0.plus(7, java.time.temporal.ChronoUnit.DAYS))
    val hi = java.sql.Timestamp.from(
      t0.plus(10, java.time.temporal.ChronoUnit.DAYS))
    val df = spark.read.parquet(sorted)
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
    val plan = df.queryExecution.executedPlan
    plan.execute().count()
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(leaves)
    }
    val scanned = leaves(plan).map(_.metrics("numOutputRows").value).sum
    val matched = df.count()
    assert(scanned >= matched) // reader can only over-materialize
    // A ~3-day slice of a ~30-day log sorted into 8 ranges: the scan
    // must touch well under half the rows. If this reverts to `total`,
    // the writer lost its stats (e.g. the INT96 default came back).
    assert(scanned < total / 2,
      s"scanned $scanned of $total — row-group stats not pruning")
  }
}
