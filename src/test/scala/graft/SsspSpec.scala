package graft

import org.apache.spark.sql.functions._

/** q_graph_sssp invariants — the three properties that together
  * CHARACTERIZE exact shortest-path distances, asserted without
  * re-deriving any distance (that independent derivation is the
  * DuckDB oracle's bounded-walk job):
  *
  *   1. dist(source) = 0;
  *   2. relaxation fixpoint — no edge (u,v,w) with dist(v) > dist(u)+w;
  *   3. witness — every non-source node's distance is ACHIEVED by some
  *      incoming edge: dist(v) = dist(u)+w for at least one in-edge.
  *
  * (2) gives dist(v) <= d*(v) by induction along any optimal path;
  * (3) chains each dist back to an actual walk, so dist(v) >= d*(v);
  * with (1) the labeling is therefore exactly d*.
  */
class SsspSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  // NOT cached — a cached identical plan would mask PlanQualitySpec's
  // shape asserts via InMemoryRelation reuse.
  private lazy val dist = SparkEntry.queries("q_graph_sssp")(spark, dir)

  private def edges = graft.queries.GraphQueries.weightedEdges(spark, dir)

  test("source is at distance zero and all suppliers are reached") {
    val rows = dist.filter(col("node") === "N0").collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 0L)
    // 25 nations + every supplier (leaf edges exist per supplier row).
    val nSupp = Tables.t(spark, dir, "supplier").count()
    assert(dist.count() == 25 + nSupp)
  }

  test("no edge is still relaxable (fixpoint)") {
    val du = dist.withColumnRenamed("node", "src")
      .withColumnRenamed("dist", "d_src")
    val dv = dist.withColumnRenamed("node", "dst")
      .withColumnRenamed("dist", "d_dst")
    val relaxable = edges.join(du, "src").join(dv, "dst")
      .filter(col("d_dst") > col("d_src") + col("w")).count()
    assert(relaxable == 0, "an edge can still improve a distance")
  }

  test("every non-source distance is witnessed by a tight in-edge") {
    val du = dist.withColumnRenamed("node", "src")
      .withColumnRenamed("dist", "d_src")
    val dv = dist.withColumnRenamed("node", "dst")
      .withColumnRenamed("dist", "d_dst")
    val witnessed = edges.join(du, "src").join(dv, "dst")
      .filter(col("d_dst") === col("d_src") + col("w"))
      .select(col("dst").as("node")).distinct()
    val orphan = dist.filter(col("node") =!= "N0")
      .join(witnessed, Seq("node"), "left_anti").count()
    assert(orphan == 0, "a distance has no achieving in-edge")
  }

  test("extra iterations do not change the fixpoint") {
    val more = graft.queries.GraphQueries.sssp(spark, dir, "N0", 15)
    assert(more.exceptAll(dist).count() == 0)
    assert(dist.exceptAll(more).count() == 0)
  }
}
