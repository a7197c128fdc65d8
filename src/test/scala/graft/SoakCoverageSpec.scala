package graft

/** Ratchet for the per-gate soak rule ("every new operator gets a
  * SoakX10 Family entry + 10x/100x rows in PLANS.md"): every `q_*`
  * key in SparkEntry.queries must be in SoakX10.Family, except the
  * FROZEN baseline below — pre-rule keys that are either scale-
  * invariant by construction (dimension-table scans/projections,
  * snapshot pointer ops whose cost is the pointer protocol, search
  * gates over dimension-sized graphs) or row-local variants of a
  * soaked sibling (q_text_lang vs q_text_quality family). A NEW gate
  * landing without a soak entry fails this test; widening the
  * baseline is a conscious, reviewable act. Shrink-only. */
class SoakCoverageSpec extends SparkSpecBase {

  // Frozen at r16 (58 keys); r17 moved the window/rollup tranche +
  // q_asof_join/q_set_ops/q_time_fill/q_session_window/q_stream_late
  // INTO the family (50), then a second r17 tranche moved the graph
  // kernels, corpus-vocab stats, the composed cleaner, benchmark
  // decon, the sampling family, and the fact-table sketch aggs (34
  // remain — every survivor is a dimension-sized scan/projection, a
  // row-local variant of a soaked sibling, a pointer-protocol
  // snapshot op, or a search gate over a dimension-sized graph). Do
  // NOT add entries for new gates — add the soak family entry instead.
  private val frozenBaseline: Set[String] = Set(
    "q_array_fns",
    "q_dates", "q_flatten_struct",
    "q_hash",
    "q_join_bucketed", "q_json_str",
    "q_map_to_entries", "q_multimodal_decode",
    "q_multimodal_dedup", "q_multimodal_frames", "q_multimodal_meta",
    "q_pii_mask", "q_pipeline_e2e", "q_pivot", "q_profile", "q_project",
    "q_project_pad",
    "q_scan_csv", "q_scan_parquet",
    "q_snapshot_branch", "q_snapshot_diff", "q_snapshot_orphans",
    "q_snapshot_restore", "q_source_search", "q_source_search_agg",
    "q_source_search_chain", "q_source_search_depth",
    "q_string_fns", "q_swap_snapshot", "q_text_boilerplate",
    "q_text_classify",
    "q_text_lang", "q_text_quality", "q_text_repetition")

  test("every gate outside the frozen baseline is in the SoakX10 family") {
    val keys = SparkEntry.queries.keySet
    val fam = graft.tools.SoakX10.familyKeys
    val unsoaked = keys.diff(fam).diff(frozenBaseline)
    assert(unsoaked.isEmpty,
      s"new gate(s) without a SoakX10 family entry: " +
        s"${unsoaked.toSeq.sorted.mkString(", ")} — add the soak entry " +
        "and record 10x/100x rows in PLANS.md (do not extend the " +
        "frozen baseline)")
    val stale = frozenBaseline.diff(keys)
    assert(stale.isEmpty,
      s"baseline names gates that no longer exist: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
    // Family entries must be real gates (a typo'd entry would silently
    // soak nothing).
    val phantom = fam.diff(keys)
    assert(phantom.isEmpty,
      s"soak family names unknown gates: " +
        s"${phantom.toSeq.sorted.mkString(", ")}")
  }
}
