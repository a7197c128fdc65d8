package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r19 decomposition of q_graph_triangle: edge build (self-join +
  * distinct) vs the packed-long-key distinct (the q_assoc_pairs r13
  * trick — primitive-long HashAggregate fast path instead of 2-column
  * UnsafeRow keys) vs the wedge phase vs the result round-trip.
  * Interleaved min-of-N in one JVM. */
object TriStageProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val runs = sys.env.get("PROBE_RUNS").flatMap(_.toIntOption).getOrElse(4)
    def li = graft.Tables.t(s, d, "lineitem")
      .filter(col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    def edgesStruct: DataFrame =
      li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("s"), col("b.pk").as("t"))
        .distinct()
    def edgesPacked: DataFrame =
      li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select((col("a.pk") * lit(4294967296L) + col("b.pk")).as("k"))
        .distinct()
        .select(expr("k div 4294967296L").as("s"),
          expr("k % 4294967296L").as("t"))
    def gate: DataFrame = graft.SparkEntry.queries("q_graph_triangle")(s, d)
    // The r18 gate shape (eager counts + lazy deg), inline, for an
    // interleaved A/B against the committed r19 shape.
    def gateOld: DataFrame = {
      val e = edgesStruct
        .repartition(s.sparkContext.defaultParallelism, col("s")).persist()
      val out = s"${graft.Tables.scratchRoot}/graft_triprobe_old"
      try {
        e.count()
        val deg = graft.queries.GraphQueries.degreesOf(e)
        val o = graft.queries.GraphQueries.orientByDegree(e, deg).persist()
        try {
          o.count()
          graft.queries.GraphQueries.triCountsOriented(e, deg, o)
            .write.mode("overwrite").parquet(out)
        } finally o.unpersist(blocking = true)
      } finally e.unpersist(blocking = true)
      s.read.parquet(out)
    }
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "edges_struct" -> (() => edgesStruct),
      "edges_packed" -> (() => edgesPacked),
      "gate_old" -> (() => gateOld),
      "full_gate" -> (() => gate))
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
    // Wedge phase over a prepared persisted oriented set (the gate's
    // shape post-edge-build): timed separately, once.
    val e = edgesStruct
      .repartition(s.sparkContext.defaultParallelism, col("s")).persist()
    e.count()
    val deg = graft.queries.GraphQueries.degreesOf(e)
    val o = graft.queries.GraphQueries.orientByDegree(e, deg).persist()
    o.count()
    val t0 = System.nanoTime()
    graft.queries.GraphQueries.triCountsOriented(e, deg, o)
      .write.format("noop").mode("overwrite").save()
    println(f"wedge_phase,run=${(System.nanoTime() - t0) / 1e9}%.3f")
    println(best.toSeq.sortBy(_._1)
      .map { case (n, v) => f"$n=min $v%.3f" }.mkString("  "))
    s.stop()
  }
}
