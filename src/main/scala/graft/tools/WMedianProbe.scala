package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interleaved A/B for q_agg_weighted_median (not part of the driver
  * contract): the shipped two-window shape (cumulative sum + a second
  * unbounded-frame window for the per-group total, both over the
  * 3-partition grp layout) vs computing the total as a 3-row
  * aggregate broadcast back onto the histogram — one window pass
  * instead of two over the ~|domain| histogram. */
object WMedianProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))

    def li = graft.Tables.t(s, d, "lineitem").select(
      col("l_returnflag").as("grp"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"),
      expr("CAST(l_quantity AS BIGINT)").as("wt"))
    def hist = li.groupBy("grp", "v").agg(sum("wt").as("w"))
    val cw = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def cur: DataFrame = hist
      .withColumn("cum", sum("w").over(cw))
      .withColumn("tot", sum("w").over(Window.partitionBy("grp")))
      .filter(col("cum") * 2L >= col("tot"))
      .groupBy("grp")
      .agg(min("v").as("wmedian_e2"), max("tot").as("total_wt"))
      .orderBy("grp")

    def joined: DataFrame = {
      val tot = hist.groupBy("grp").agg(sum("w").as("tot"))
      hist
        .withColumn("cum", sum("w").over(cw))
        .join(broadcast(tot), "grp")
        .filter(col("cum") * 2L >= col("tot"))
        .groupBy("grp")
        .agg(min("v").as("wmedian_e2"), max("tot").as("total_wt"))
        .orderBy("grp")
    }

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[wm] $label%-7s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    println("[wm] equal: " + (cur.collect().toSeq == joined.collect().toSeq))
    time("warm-c")(cur); time("warm-j")(joined)
    for (_ <- 1 to 3) { time("cur")(cur); time("joined")(joined) }
    s.stop()
  }
}
