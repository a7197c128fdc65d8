package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Read-side payoff of layout work (q_zorder / sorted compaction):
  * the same pushed date-slice predicate against the same rows, written
  * once in random layout and once range-sorted by the filter key. The
  * parquet reader's row-group statistics pruning can only skip groups
  * whose min/max excludes the slice — random layout smears the slice
  * across every group (scan materializes ~everything), sorted layout
  * concentrates it (scan materializes ~the slice). Reports the scan's
  * numOutputRows for both. Diagnostic main, not part of the driver
  * contract. */
object LayoutSkipProbe {

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // The fixture's o_orderdate is TIMESTAMP_NTZ; Spark's ParquetFilters
    // builds row-group predicates for TimestampType (LTZ) but not NTZ,
    // so normalize on write (instant-preserving under the UTC session)
    // — the same reason Tables.events normalizes its ts column.
    val orders = spark.read.parquet(s"$d/orders.parquet")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val total = orders.count()
    val unsorted = s"${graft.Tables.scratchRoot}/graft_layout_unsorted"
    val sorted = s"${graft.Tables.scratchRoot}/graft_layout_sorted"
    // Same rows, two layouts, identical file counts.
    orders.repartition(8).write.mode("overwrite").parquet(unsorted)
    orders.repartitionByRange(8, col("o_orderdate"))
      .sortWithinPartitions("o_orderdate")
      .write.mode("overwrite").parquet(sorted)

    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("o_orderdate") >= lit("1997-06-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-08-01").cast("timestamp"))
      // Execute THIS plan's RDD directly (a write/count would build a
      // fresh QueryExecution whose metrics we couldn't see).
      val plan = df.queryExecution.executedPlan
      if (sys.env.contains("SPARK_GRAFT_DEBUG_PLAN")) println(plan.toString)
      plan.execute().count()
      def leaves(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(leaves)
      }
      leaves(plan).map(_.metrics("numOutputRows").value).sum
    }

    val u = scanRows(unsorted)
    val s = scanRows(sorted)
    println(f"table_rows=$total slice_scan_unsorted=$u slice_scan_sorted=$s " +
      f"skip_factor=${u.toDouble / math.max(1, s)}%.1f")

    // Control experiment on an integer key (isolates timestamp-specific
    // pushdown behavior from the row-group-skip machinery itself).
    val sortedInt = s"${graft.Tables.scratchRoot}/graft_layout_sorted_int"
    orders.repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(sortedInt)
    val dfInt = spark.read.parquet(sortedInt)
      .filter(col("o_orderkey") >= 10000L && col("o_orderkey") < 20000L)
    val planInt = dfInt.queryExecution.executedPlan
    planInt.execute().count()
    def leavesI(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => leavesI(a.executedPlan)
      case sc: FileSourceScanExec => Seq(sc)
      case other => other.children.flatMap(leavesI)
    }
    val si = leavesI(planInt).map(_.metrics("numOutputRows").value).sum
    println(s"int_slice_scan_sorted=$si (of $total)")
    spark.stop()
  }
}
