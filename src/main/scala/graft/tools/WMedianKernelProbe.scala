package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r19 interleaved A/B: q_agg_weighted_median's former domain-window
  * shape vs the weighted Selection bucket-narrowing kernel. Storm-safe
  * (same JVM, alternating runs). */
object WMedianKernelProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val runs = sys.env.get("PROBE_RUNS").flatMap(_.toIntOption).getOrElse(5)
    def li = graft.Tables.t(s, d, "lineitem").select(
      col("l_returnflag").as("grp"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"),
      expr("CAST(l_quantity AS BIGINT)").as("wt"))
    def windowShape: DataFrame = {
      val hist = li.groupBy("grp", "v").agg(sum("wt").as("w"))
      val cw = Window.partitionBy("grp").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cum", sum("w").over(cw))
        .withColumn("tot", sum("w").over(Window.partitionBy("grp")))
        .filter(col("cum") * 2L >= col("tot"))
        .groupBy("grp")
        .agg(min("v").as("wmedian_e2"), max("tot").as("total_wt"))
        .orderBy("grp")
    }
    def kernelShape: DataFrame =
      graft.SparkEntry.queries("q_agg_weighted_median")(s, d)
    val stages = Seq(
      "window_shape" -> (() => windowShape),
      "kernel_shape" -> (() => kernelShape))
    stages.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save() }
    val best = collection.mutable.Map.empty[String, Double]
    (1 to runs).foreach { _ =>
      stages.foreach { case (nm, f) =>
        s.catalog.clearCache()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        best(nm) = math.min(best.getOrElse(nm, 1e9), dt)
        println(f"$nm,run=$dt%.3f")
      }
    }
    println(best.toSeq.sortBy(_._1)
      .map { case (n, v) => f"$n=min $v%.3f" }.mkString("  "))
    s.stop()
  }
}
