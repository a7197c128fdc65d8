package graft

/** Driver smoke contract: the flagship entry returns rows at sf0.001,
  * and every declared oracle key has a matching query. */
class EntrySpec extends SparkSpecBase {

  test("entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries; inventory is complete") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    // §2.2 contract keys all present.
    val contract = Set(
      "q_scan_parquet", "q_scan_csv", "q_project", "q_project_pad",
      "q_filter", "q_flatten_struct", "q_join_link", "q_join_semi",
      "q_join_anti", "q_agg_group", "q_agg_distinct", "q_topk_group",
      "q_sort_limit", "q_union", "q_dates", "q_string_fns", "q_hash",
      "q_map_to_entries", "q_json_str", "q_array_fns", "q_graph_reach",
      "q_swap_snapshot", "q_stream_batch")
    assert(contract.subsetOf(qs), (contract -- qs).toString)
  }
}
