package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B for the graph fixpoint loops' join-strategy choice
  * (not part of the driver contract). Cross-window bench comparisons
  * on this box drift ±50% with clean steal/calib counters, so the
  * only trustworthy receipt is hint-on vs hint-off alternating inside
  * ONE JVM: cc (label state = all nodes) and kcore (alive set) at a
  * given SF dir. */
object GraphLoopProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkEnv.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))

    val conf = Seq(
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "4",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = conf.map { case (k, _) => k -> s.conf.getOption(k) }

    // --- cc over the FK edge set (the q_graph_cc fixture) ---
    val e = {
      val base = graft.queries.GraphQueries.edges(s, d)
      base.unionByName(
        base.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
    }
    val nNodes = e.select(col("src")).distinct().count()
    println(s"[gl] cc edges=${e.count()} nodes=$nNodes")

    def ccLoopX(hint: Boolean, iters: Int): Long = {
      def hb(df: DataFrame) = if (hint) broadcast(df) else df
      var labels = e.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node"))
        .localCheckpoint()
      var round = 0
      var converged = false
      while (round < iters && !converged) {
        val nbrMin = e
          .join(hb(labels.withColumnRenamed("node", "src")), "src")
          .select(col("dst").as("node"), col("lbl"))
          .groupBy("node").agg(min("lbl").as("nl"))
        val m = labels.join(hb(nbrMin), Seq("node"), "left")
          .select(col("node"),
            least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"),
            (col("nl").isNotNull && col("nl") < col("lbl")).as("chg"))
          .localCheckpoint(eager = false)
        converged = m.filter(col("chg")).count() == 0L
        labels = m.select("node", "lbl")
        round += 1
      }
      round
    }

    // --- kcore over the sparsified co-purchase set ---
    val ke = {
      val canon = graft.queries.GraphQueries.sparseCoEdges(s, d)
      canon.unionByName(
        canon.select(col("t").as("s"), col("s").as("t")))
        .localCheckpoint()
    }
    println(s"[gl] kcore edges=${ke.count()}")

    def kcoreX(hint: Boolean, k: Int, iters: Int): Long = {
      def hb(df: DataFrame) = if (hint) broadcast(df) else df
      def restrict(alive: DataFrame): DataFrame = ke
        .join(hb(alive.withColumnRenamed("n", "s")), Seq("s"), "left_semi")
        .join(hb(alive.withColumnRenamed("n", "t")), Seq("t"), "left_semi")
      if (sys.env.contains("GL_EXPLAIN")) {
        val alive0 = ke.select(col("s").as("n")).distinct().localCheckpoint()
        println(s"[gl] KCORE ROUND PLAN (hinted=$hint):")
        restrict(alive0).groupBy("s").agg(count(lit(1)).as("dg"))
          .filter(col("dg") >= k).select(col("s").as("n"))
          .explain("formatted")
      }
      var alive = ke.select(col("s").as("n")).distinct().localCheckpoint()
      var nAlive = alive.count()
      var round = 0
      var stable = false
      while (round < iters && !stable) {
        val next = restrict(alive)
          .groupBy("s").agg(count(lit(1)).as("dg"))
          .filter(col("dg") >= k).select(col("s").as("n"))
          .localCheckpoint(eager = false)
        val n2 = next.count()
        stable = n2 == nAlive
        alive = next
        nAlive = n2
        round += 1
      }
      round
    }

    conf.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      ccLoopX(hint = false, 20); ccLoopX(hint = true, 20) // warm
      for (i <- 1 to 4) {
        var t0 = System.nanoTime()
        val r1 = ccLoopX(hint = false, 20)
        val off = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val r2 = ccLoopX(hint = true, 20)
        val on = (System.nanoTime() - t0) / 1e9
        println(f"[gl] cc pass=$i rounds=$r1/$r2 off=$off%6.3f on=$on%6.3f")
      }
      kcoreX(hint = false, 3, 30); kcoreX(hint = true, 3, 30) // warm
      for (i <- 1 to 4) {
        var t0 = System.nanoTime()
        val r1 = kcoreX(hint = false, 3, 30)
        val off = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val r2 = kcoreX(hint = true, 3, 30)
        val on = (System.nanoTime() - t0) / 1e9
        println(f"[gl] kcore pass=$i rounds=$r1/$r2 off=$off%6.3f on=$on%6.3f")
      }
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
    s.stop()
  }
}
