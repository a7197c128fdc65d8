package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for q_graph_diameter's cost structure (not part of the
  * driver contract): per-round wall time of the double-sweep BFS at a
  * given SF, plus shape variants — the shipped frontier protocol vs
  * explicit broadcast hints on the frontier join and the settled
  * anti-join (with AQE off inside the loop, join strategy comes from
  * static size estimates over checkpointed RDDs; if the planner picks
  * SMJ anywhere, a round pays sorts+exchanges it doesn't need). */
object DiameterProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))

    val e = graft.queries.GraphQueries.copurchaseEdges(s, d, "1997-07-01")
    val adj = e.select(col("s").as("n"), col("t").as("nb"))
      .unionByName(e.select(col("t").as("n"), col("s").as("nb")))
      .localCheckpoint()
    val mm = adj.agg(min("n"), count(lit(1))).head()
    val s0 = mm.getLong(0)
    println(s"[diam] adj rows=${mm.getLong(1)} s0=$s0")

    def bfs(src: Long, hinted: Boolean, verbose: Boolean): Long = {
      var dist = s.range(1).select(lit(src).as("node"), lit(0L).as("d"))
        .localCheckpoint()
      var frontier = dist
      var round = 1L
      var drained = false
      while (!drained) {
        val t0 = System.nanoTime()
        val joined =
          if (hinted)
            broadcast(frontier).join(adj, frontier("node") === adj("n"))
          else frontier.join(adj, frontier("node") === adj("n"))
        val dedup = joined
          .select(col("nb").as("node"), lit(round).as("d"))
          .distinct()
        val cand =
          (if (hinted) dedup.join(broadcast(dist), Seq("node"), "left_anti")
           else dedup.join(dist, Seq("node"), "left_anti"))
          .localCheckpoint(eager = false)
        if (verbose && round == 3 &&
            sys.env.contains("DIAM_PROBE_EXPLAIN")) {
          println(s"[diam] ROUND-3 PLAN (hinted=$hinted):")
          // Re-derive the round plan WITHOUT the checkpoint wrapper —
          // a lazily-checkpointed DataFrame explains as its RDD scan.
          val joined2 =
            if (hinted)
              broadcast(frontier).join(adj, frontier("node") === adj("n"))
            else frontier.join(adj, frontier("node") === adj("n"))
          joined2.select(col("nb").as("node"), lit(round).as("d"))
            .distinct()
            .join(if (hinted) broadcast(dist) else dist,
              Seq("node"), "left_anti")
            .explain("formatted")
        }
        val n = cand.count()
        drained = n == 0L
        if (verbose) println(f"[diam] round=$round%2d frontier=$n%6d " +
          f"ms=${(System.nanoTime() - t0) / 1e6}%8.1f")
        if (!drained) {
          dist = dist.unionByName(cand)
          frontier = cand
          round += 1
        }
      }
      round
    }

    val conf = Seq(
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "4",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = conf.map { case (k, _) => k -> s.conf.getOption(k) }
    conf.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // Warm both shapes once, then interleave timed passes.
      bfs(s0, hinted = false, verbose = true); if (sys.env.contains("DIAM_PROBE_EXPLAIN")) bfs(s0, hinted = true, verbose = true)
      for (i <- 1 to 3) {
        var t0 = System.nanoTime()
        val r1 = bfs(s0, hinted = false, verbose = false)
        val cur = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val r2 = bfs(s0, hinted = true, verbose = false)
        val hint = (System.nanoTime() - t0) / 1e9
        println(f"[diam] pass=$i rounds=$r1/$r2 cur=$cur%6.3f hint=$hint%6.3f")
      }
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
    s.stop()
  }
}
