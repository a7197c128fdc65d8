package graft

import org.apache.spark.sql.functions._

/** Hub-skew fixture for the compact-forward (degree, id) orientation in
  * q_graph_triangle (GraphQueries.orientByDegree / triCounts).
  *
  * Graph: a celebrity hub (vertex 0) adjacent to every spoke 1..100,
  * plus a path 1-2-...-100 among the spokes. The hub sits in 100 of the
  * 199 edges (>50% of baskets' pair mass). Under naive id-orientation
  * the hub (lowest id) keeps out-degree 100 and the wedge join fans out
  * C(100,2) = 4950 candidates at one vertex; under (degree, id)
  * orientation every hub edge points INTO the hub, so per-vertex wedge
  * fan-out is bounded by the spoke out-degree (≤ 3 here) regardless of
  * hub size — the property that keeps the wedge stream bounded under
  * celebrity skew at 100 TB.
  */
class TriangleSkewSpec extends SparkSpecBase {

  import spark.implicits._

  // Canonical s < t undirected edge set.
  private lazy val edges = {
    val star = (1L to 100L).map(i => (0L, i))
    val path = (1L to 99L).map(i => (i, i + 1))
    (star ++ path).toDF("s", "t")
  }

  private lazy val degrees = edges.select(col("s").as("n"))
    .unionByName(edges.select(col("t").as("n")))
    .groupBy("n").agg(count(lit(1)).as("dg"))

  test("degree orientation bounds per-vertex wedge fan-out under hub skew") {
    val o = queries.GraphQueries.orientByDegree(edges, degrees)
    val outDeg = o.groupBy("src").agg(count(lit(1)).as("od"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // The hub must emit NO out-edges: all 100 star edges point into it.
    assert(!outDeg.contains(0L), s"hub kept out-edges: ${outDeg.get(0L)}")
    // Every spoke's out-degree ≤ its total degree ≤ 3, so the wedge
    // join generates at most C(3,2) = 3 candidates per vertex — id
    // orientation would generate C(100,2) = 4950 at the hub.
    val maxOd = outDeg.values.max
    assert(maxOd <= 3L, s"orientation leaked a fat vertex: max out-degree $maxOd")
    // Orientation preserves the edge set: 199 oriented edges.
    assert(outDeg.values.sum == 199L)
  }

  test("triangle count is exact on the skewed fixture") {
    val r = queries.GraphQueries.triCounts(edges).head()
    // Triangles are {hub, i, i+1} for each path edge: 99 of them.
    assert(r.getAs[Long]("n_edges") == 199L)
    assert(r.getAs[Long]("n_triangles") == 99L)
    // Open wedges Σ d(d-1)/2: hub 100·99/2 = 4950; spokes 1 and 100
    // have degree 2 (1 wedge each); spokes 2..99 degree 3 (3 each).
    assert(r.getAs[Long]("n_wedges") == 4950L + 1 + 1 + 98 * 3)
  }

  test("orientation is unnecessary-shuffle-free: degree joins broadcast") {
    val p = queries.GraphQueries.triCounts(edges)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }
}
