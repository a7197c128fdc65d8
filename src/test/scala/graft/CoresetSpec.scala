package graft

/** q_sample_coreset invariants of the greedy farthest-point traversal
  * (the exact selection values are the DuckDB oracle's job): picks
  * are distinct, the selection distances are non-increasing (each
  * pick can only shrink every point's running min-distance), and the
  * final coverage radius is bounded by the last pick's distance —
  * the monotonicity that gives Gonzalez's 2-approximation. */
class CoresetSpec extends SparkSpecBase {

  test("greedy selection distances are monotone and bound the radius") {
    val rows = SparkEntry.queries("q_sample_coreset")(
      spark, "/root/testdata/sf0.01").collect()
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length)
    val d2s = rows.sortBy(_.getAs[Long]("sel_order"))
      .map(_.getAs[Long]("d2_at_selection")).drop(1) // seed is 0
    assert(d2s.zip(d2s.tail).forall { case (a, b) => a >= b }, d2s.toSeq)
    val radius = rows.head.getAs[Long]("radius")
    assert(radius <= d2s.last, s"radius=$radius last=${d2s.last}")
    assert(radius >= 0L)
  }
}
