package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Bounded graph traversal — the Spark analogue of the remote source's
  * default search `is(graph_root) -[2:]->` (reference:
  * remote_graph.py:62): nodes reachable from the roots at depth >= 2,
  * bounded above by maxDepth.
  *
  * Implementation: iterative frontier self-join on the edge table. Each
  * step is one shuffle join on `src`; the frontier is re-used, never
  * collected to the driver. At 100 TB you would pre-partition `edges` by
  * `src` once (bucketing) so every iteration co-locates without a new
  * shuffle, and checkpoint the frontier every few levels to truncate
  * lineage — the testdata graph is depth-2, so 3 iterations suffice.
  */
object GraphQueries {

  import CoreQueries.Q

  /** Edge list derived from the star-schema FKs, node ids prefixed by
    * type: R=region, N=nation, C=customer, S=supplier. */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val n = t(s, d, "nation").select(
      concat(lit("R"), col("n_regionkey")).as("src"),
      concat(lit("N"), col("n_nationkey")).as("dst"))
    val c = t(s, d, "customer").select(
      concat(lit("N"), col("c_nationkey")).as("src"),
      concat(lit("C"), col("c_custkey")).as("dst"))
    val su = t(s, d, "supplier").select(
      concat(lit("N"), col("s_nationkey")).as("src"),
      concat(lit("S"), col("s_suppkey")).as("dst"))
    n.unionByName(c).unionByName(su)
  }

  def reach(s: SparkSession, d: String, maxDepth: Int): DataFrame = {
    val roots = t(s, d, "region")
      .select(concat(lit("R"), col("r_regionkey")).as("node"),
        lit(0).as("depth"))
    var frontier = roots
    var reached = roots
    for (depth <- 1 to maxDepth) {
      // Fresh edge lineage per step — re-using one DataFrame across a
      // self-referencing iteration makes its attributes ambiguous.
      val e = edges(s, d)
      // distinct per level: on graphs with converging paths the
      // per-path frontier multiplies exponentially with depth.
      frontier = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"), lit(depth).as("depth"))
        .distinct()
      reached = reached.unionByName(frontier)
    }
    reached.groupBy("node").agg(min("depth").as("depth"))
      .filter(col("depth") >= 2)
      .orderBy("node")
  }

  /** Fixed-point integer PageRank (damping 0.85, `iters` rounds) over
    * the FK edge graph. Every step is the Pregel shape: join ranks to
    * edges on src (at scale: edges bucketed by src so iterations
    * co-locate), integer-divide each node's rank across its out-edges,
    * sum contributions per dst (partial+final agg), re-damp. All
    * arithmetic is exact long math — floor divisions and exact sums —
    * so the result is bit-identical in any engine and any partition
    * order, where a double PageRank would drift by summation order.
    * Rank unit: 1e6 = 1.0. */
  def pagerank(s: SparkSession, d: String, iters: Int): DataFrame = {
    val e = edges(s, d)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("od"))
    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      val contribs = e.join(deg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank div od").as("c")) // long div: exact floor, no double
        .groupBy("node").agg(sum("c").as("cs"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          expr("150000L + (85L * coalesce(cs, 0L)) div 100L").as("rank"))
    }
    ranks.orderBy("node")
  }

  val entries: Map[String, (Q, String)] = Map(

    // Integer PageRank, 3 rounds. The oracle unrolls the same three
    // Pregel steps; exact long arithmetic keeps both engines
    // bit-identical (see pagerank()).
    "q_graph_pagerank" -> ((
      (s: SparkSession, d: String) => pagerank(s, d, 3),
      """WITH e AS (
        |  SELECT 'R' || n_regionkey AS src, 'N' || n_nationkey AS dst FROM nation
        |  UNION ALL SELECT 'N' || c_nationkey, 'C' || c_custkey FROM customer
        |  UNION ALL SELECT 'N' || s_nationkey, 'S' || s_suppkey FROM supplier),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |deg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
        |c1 AS (SELECT e.dst AS node, sum(r.rank // d.od) AS cs
        |       FROM e JOIN deg d USING (src) JOIN r0 r ON r.node = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT n.node,
        |         CAST(150000 + (85 * coalesce(c.cs, 0)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c1 c USING (node)),
        |c2 AS (SELECT e.dst AS node, sum(r.rank // d.od) AS cs
        |       FROM e JOIN deg d USING (src) JOIN r1 r ON r.node = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT n.node,
        |         CAST(150000 + (85 * coalesce(c.cs, 0)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c2 c USING (node)),
        |c3 AS (SELECT e.dst AS node, sum(r.rank // d.od) AS cs
        |       FROM e JOIN deg d USING (src) JOIN r2 r ON r.node = e.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT n.node,
        |         CAST(150000 + (85 * coalesce(c.cs, 0)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c3 c USING (node))
        |SELECT node, rank FROM r3 ORDER BY node""".stripMargin)),

    "q_graph_reach" -> ((
      (s: SparkSession, d: String) => reach(s, d, 3),
      """WITH RECURSIVE edges AS (
        |  SELECT 'R' || n_regionkey AS src, 'N' || n_nationkey AS dst FROM nation
        |  UNION ALL
        |  SELECT 'N' || c_nationkey, 'C' || c_custkey FROM customer
        |  UNION ALL
        |  SELECT 'N' || s_nationkey, 'S' || s_suppkey FROM supplier
        |), reach(node, depth) AS (
        |  SELECT 'R' || r_regionkey, 0 FROM region
        |  UNION ALL
        |  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.node
        |  WHERE r.depth < 3
        |)
        |SELECT node, CAST(min(depth) AS INT) AS depth FROM reach
        |GROUP BY node HAVING min(depth) >= 2 ORDER BY node""".stripMargin))
  )
}
