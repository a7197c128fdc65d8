package graft

import org.apache.spark.sql.functions._

/** q_graph_kcore invariants — the two properties that CHARACTERIZE the
  * k-core (k=3), asserted structure-agnostically (the DuckDB oracle's
  * unrolled peeling is the independent derivation):
  *
  *   1. membership — every output node's degree WITHIN the output is
  *      >= k (the output is a min-degree-k subgraph);
  *   2. maximality — no peeled node has >= k neighbors in the core
  *      (adding it would extend the subgraph, contradicting the core's
  *      maximality).
  *
  * Plus fixpoint stability: extra peeling rounds change nothing.
  */
class KcoreSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val core = SparkEntry.queries("q_graph_kcore")(spark, dir)

  /** The same sparsified undirected co-purchase edge list the operator
    * peels — THE operator's own builder (sparseCoEdges), so the
    * invariants can never silently validate a different graph. */
  private def edges = {
    val canon = graft.queries.GraphQueries.sparseCoEdges(spark, dir)
    canon.unionByName(canon.select(col("t").as("s"), col("s").as("t")))
  }

  test("every core node keeps degree >= k inside the core") {
    // Non-trivial fixture first: an empty core (or a graph nothing was
    // peeled FROM) would make every invariant below vacuously true.
    assert(core.count() > 0, "fixture 3-core is empty — invariants vacuous")
    assert(edges.select(col("s")).distinct().count() > core.count(),
      "nothing was peeled — the maximality test has no subjects")
    assert(core.filter(col("deg") < 3).count() == 0)
    // And the reported degree really is the within-core degree.
    val members = core.select(col("node"))
    val inCore = edges
      .join(members.withColumnRenamed("node", "s"), Seq("s"), "left_semi")
      .join(members.withColumnRenamed("node", "t"), Seq("t"), "left_semi")
      .groupBy(col("s").as("node")).agg(count(lit(1)).as("true_deg"))
    val wrong = core.join(inCore, "node")
      .filter(col("deg") =!= col("true_deg")).count()
    assert(wrong == 0, "reported degree is not the within-core degree")
  }

  test("no peeled node could rejoin (maximality)") {
    val members = core.select(col("node"))
    val peeled = edges.select(col("s").as("node")).distinct()
      .join(members, Seq("node"), "left_anti")
    // Degree of each peeled node counted toward CORE members only.
    val towardCore = edges
      .join(peeled.withColumnRenamed("node", "s"), Seq("s"), "left_semi")
      .join(members.withColumnRenamed("node", "t"), Seq("t"), "left_semi")
      .groupBy("s").agg(count(lit(1)).as("dg"))
    assert(towardCore.filter(col("dg") >= 3).count() == 0,
      "a peeled node has k neighbors in the core — core not maximal")
  }

  test("extra peeling rounds do not change the fixpoint") {
    val more = graft.queries.GraphQueries.kcore(spark, dir, 3, 20)
    assert(more.exceptAll(core).count() == 0)
    assert(core.exceptAll(more).count() == 0)
  }
}
