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

  val entries: Map[String, (Q, String)] = Map(
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
