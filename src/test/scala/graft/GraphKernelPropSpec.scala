package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Property tests for the iterative graph kernels against imperative
  * references on random graphs (seeded — deterministic runs):
  *
  *  - the SSSP round kernel driven to fixpoint equals single-source
  *    Dijkstra on random weighted digraphs;
  *  - the k-core peeling loop equals imperative peeling on random
  *    undirected graphs.
  *
  * Both go through the REAL distributed kernels (ssspRound /
  * kcoreLoop), not reimplementations, so the properties cover the
  * join/aggregate plumbing, not just the math.
  */
class GraphKernelPropSpec extends SparkSpecBase {

  private def ssspFixpoint(edges: Seq[(String, String, Long)],
      source: String): Map[String, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst", "w").localCheckpoint()
    var dist = spark.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist"))
    var frontier = dist
    var drained = false
    var round = 0
    while (round < 50 && !drained) {
      val m = graft.queries.GraphQueries.ssspRound(frontier, dist, e)
        .localCheckpoint()
      frontier = m.filter(col("imp")).select("node", "dist")
      dist = m.select("node", "dist")
      drained = frontier.isEmpty
      round += 1
    }
    dist.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def dijkstra(edges: Seq[(String, String, Long)],
      source: String): Map[String, Long] = {
    val adj = edges.groupBy(_._1).view
      .mapValues(_.map(e => (e._2, e._3))).toMap
    val dist = scala.collection.mutable.Map(source -> 0L)
    val pq = scala.collection.mutable.PriorityQueue(
      (0L, source))(Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (du, u) = pq.dequeue()
      if (dist(u) == du)
        adj.getOrElse(u, Nil).foreach { case (v, w) =>
          if (dist.get(v).forall(_ > du + w)) {
            dist(v) = du + w
            pq.enqueue((du + w, v))
          }
        }
    }
    dist.toMap
  }

  test("sssp fixpoint equals Dijkstra on random weighted digraphs") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(10)
      val nodes = (0 until n).map(i => s"v$i")
      val edges = for {
        a <- nodes; b <- nodes
        if a != b && rnd.nextDouble() < 0.25
      } yield (a, b, 1L + rnd.nextInt(9).toLong)
      val got = ssspFixpoint(edges, "v0")
      val want = dijkstra(edges, "v0")
      assert(got == want, s"trial $trial: $got vs $want (edges $edges)")
    }
  }

  private def peelRef(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    edges.foreach { case (s, t) =>
      adj(s) = adj.getOrElse(s, Set()) + t
      adj(t) = adj.getOrElse(t, Set()) + s
    }
    var alive = adj.keySet.toSet
    var changed = true
    while (changed) {
      val drop = alive.filter(n => (adj(n) & alive).size < k)
      changed = drop.nonEmpty
      alive = alive -- drop
    }
    alive.map(n => n -> (adj(n) & alive).size).toMap
  }

  test("k-core loop equals imperative peeling on random graphs") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val n = 10 + rnd.nextInt(15)
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.2
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val got = graft.queries.GraphQueries
          .kcoreLoop(spark, edges.toDF("s", "t"), 3, 50)
          .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
        val want = peelRef(edges, 3)
        assert(got == want, s"trial $trial: $got vs $want (edges $edges)")
      }
    }
  }
}
