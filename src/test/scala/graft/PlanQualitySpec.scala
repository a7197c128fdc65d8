package graft

/** Plan-shape regression gates: the scale-critical plan properties
  * (pushdown, pruning, top-N, broadcast, no cartesian shapes) asserted
  * against the actual optimized plans so a refactor can't silently
  * regress them. */
class PlanQualitySpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q_filter pushes predicates into the parquet scan") {
    val p = planOf("q_filter")
    assert(p.contains("PushedFilters"), p)
    // (toString truncates long filter lists; match untruncated prefixes)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.contains("GreaterThan(l_quantity"), p)
  }

  test("q_project prunes the read schema to selected columns") {
    val p = planOf("q_project")
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>"), p)
  }

  test("q_sort_limit compiles to per-partition top-N") {
    val p = planOf("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_join_link broadcasts the dimension side") {
    val p = planOf("q_join_link")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("no unintended cartesian shapes in the bucketed similarity ops") {
    Seq("q_dedup_minhash", "q_dedup_ngram", "q_embed_ann", "q_embed_ivf")
      .foreach { q =>
        val p = planOf(q)
        assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      }
  }

  test("aggregation is partial+final (map-side combine present)") {
    val p = planOf("q_agg_group")
    // Two HashAggregate operators around one exchange.
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }
}
