package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing probe for q_assoc_pairs (r13 diagnostic): which
  * leg pays at scale — the basket build (collect_set exchange), the
  * exploded-pair aggregate, or the metric tail? */
object AssocProbe {
  private def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"$label,${(System.nanoTime() - t0) / 1e9}%.2f,$n")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_soak_x10")
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    println("stage,sec,rows")
    time("scan")(li.count())
    val baskets = li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("its"))
      .localCheckpoint()
    time("basket_build")(baskets.count())
    val pairs = baskets.select(explode(expr(
      """flatten(transform(its, (x, i) ->
        |  transform(slice(its, i + 2, size(its)),
        |    y -> named_struct('a', x, 'b', y))))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    time("pair_explode_only")(pairs.count())
    val co = pairs.groupBy("a", "b").agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
    time("pair_agg")(co.count())
    // Packed single-long key: same pairs, k = a << 32 | b (ids fit).
    val packedPairs = baskets.select(explode(expr(
      """flatten(transform(its, (x, i) ->
        |  transform(slice(its, i + 2, size(its)),
        |    y -> x * 4294967296L + y)))""".stripMargin)).as("k"))
    val co2 = packedPairs.groupBy("k").agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
      .select(expr("k div 4294967296L").as("a"),
        expr("k % 4294967296L").as("b"), col("co"))
    time("pair_agg_packed")(co2.count())
    // Repartition on k first: partial agg then fully combines in-place
    // (exchange satisfied), no second map build.
    val co3 = packedPairs.repartition(col("k"))
      .groupBy("k").agg(count(lit(1)).as("co")).filter(col("co") >= 2)
    time("pair_agg_repart")(co3.count())
    // Sort + streaming window: no hash maps at all.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k")
    val co4 = packedPairs.repartition(col("k"))
      .withColumn("co", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(w.orderBy("k")))
      .filter(col("rn") === 1 && col("co") >= 2)
    time("pair_agg_window")(co4.count())
    val itemCnt = baskets.select(explode(col("its")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("cnt")).localCheckpoint()
    time("item_cnt")(itemCnt.count())
    val out = co
      .join(broadcast(itemCnt.select(col("item").as("a"), col("cnt").as("ca"))), "a")
      .join(broadcast(itemCnt.select(col("item").as("b"), col("cnt").as("cb"))), "b")
      .orderBy("a", "b")
    time("metric_tail")(out.count())
    spark.stop()
  }
}
