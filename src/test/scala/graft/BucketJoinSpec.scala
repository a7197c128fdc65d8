package graft

import org.apache.spark.sql.functions._

/** Bucketing as the co-location strategy for repeated fact-fact joins:
  * two tables bucketed+sorted on the join key must hash-join with NO
  * shuffle exchange on either side — the layout that turns the 100 TB
  * lineitem⋈orders join into a local merge per bucket. */
class BucketJoinSpec extends SparkSpecBase {

  test("join of co-bucketed tables plans without a shuffle") {
    // Below the broadcast threshold a broadcast join would hide the
    // point; force the join to prove co-location.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.t(spark, "/root/testdata/sf0.001", "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
      assert(joined.collect().map(_.getLong(1)).sum == 6000L)

      val plan = joined.queryExecution.executedPlan.toString
      val shufflesBeforeAgg = plan.linesIterator
        .filter(_.contains("Exchange hashpartitioning"))
        .filterNot(_.contains("o_orderstatus")) // the agg's own exchange
        .size
      assert(shufflesBeforeAgg == 0, plan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
