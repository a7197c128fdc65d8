package graft

/** Ratchet for the per-gate plan-quality rule ("every new operator
  * ships with a PlanQualitySpec gate" — the r15 verdict flagged the
  * round's one miss): every `q_*` key in SparkEntry.queries must be
  * mentioned in PlanQualitySpec.scala, except the FROZEN baseline
  * below — keys that predate the rule and are either covered
  * indirectly (planProbe families, operator-specific specs like
  * SketchExprSpec/KmeansSpec/SnapshotSwapSpec) or are trivially
  * row-local scans/aggregations where a plan gate pins nothing the
  * oracle doesn't. A NEW gate landing without a plan-gate mention
  * fails this test; widening the baseline is a conscious, reviewable
  * act. The baseline may only shrink.
  */
class PlanCoverageSpec extends SparkSpecBase {

  // Frozen at r16 (112 keys; the last four were vacuously
  // prefix-matched by a longer sibling's mention until the
  // word-boundary check landed — their actual coverage is the
  // planProbe no-cartesian sweeps). Do NOT add entries for new gates —
  // write the plan gate instead.
  private val frozenBaseline: Set[String] = Set(
    "q_embed_ann", "q_dedup_minhash", "q_profile", "q_stream_dedup",
    "q_agg_approx_quantile", "q_agg_cube", "q_agg_distinct",
    "q_agg_grouping_sets", "q_agg_list", "q_agg_rollup", "q_agg_stats",
    "q_agg_weighted_median", "q_approx_distinct", "q_array_fns",
    "q_asof_join", "q_audience_overlap", "q_compact_files",
    "q_corpus_clean", "q_dates", "q_dedup_cluster", "q_dedup_ngram",
    "q_dedup_simhash", "q_dedup_spans", "q_dedup_substr",
    "q_embed_centroid", "q_embed_cosine", "q_embed_dup", "q_embed_ivf",
    "q_embed_ivfpq", "q_embed_matryoshka", "q_embed_pq",
    "q_embed_quality", "q_eval_winrate", "q_flatten_struct",
    "q_graph_diameter", "q_graph_hits", "q_graph_pagerank",
    "q_graph_reach", "q_hash", "q_ingest_quarantine", "q_join_anti",
    "q_join_salted", "q_join_semi", "q_json_extract", "q_json_str",
    "q_map_to_entries", "q_multimodal_cluster", "q_multimodal_decode",
    "q_multimodal_dedup", "q_multimodal_frames", "q_multimodal_meta",
    "q_multimodal_neardup", "q_multimodal_pair", "q_multimodal_resize",
    "q_optimize_snapshot", "q_outlier_mad", "q_pipeline_e2e", "q_pivot",
    "q_project_pad", "q_replace_where", "q_retention",
    "q_sample_coreset", "q_scan_csv", "q_scan_jsonl", "q_scan_orc",
    "q_scan_parquet", "q_session_window", "q_set_ops", "q_sink_sorted",
    "q_skew_census", "q_snapshot_branch", "q_snapshot_diff",
    "q_snapshot_expire", "q_snapshot_history", "q_snapshot_orphans",
    "q_snapshot_restore", "q_snapshot_tag", "q_source_report",
    "q_source_search", "q_source_search_agg", "q_source_search_chain",
    "q_source_search_depth", "q_stream_ann_inc", "q_stream_assoc",
    "q_stream_batch", "q_stream_cdc", "q_stream_join", "q_stream_late",
    "q_stream_quantile", "q_stream_session", "q_stream_sliding",
    "q_stream_topk", "q_stream_zonemap", "q_string_fns",
    "q_swap_snapshot", "q_text_boilerplate", "q_text_containment",
    "q_text_decontaminate", "q_text_feature_hash", "q_text_fingerprint",
    "q_text_lang", "q_text_quality", "q_text_repetition",
    "q_text_stopwords", "q_text_tokens", "q_text_winnow",
    "q_time_changepoint", "q_tokenize_apply", "q_topk_group", "q_union",
    "q_window_frames", "q_window_ntile")

  test("every gate outside the frozen baseline is mentioned in PlanQualitySpec") {
    // FAIL (not cancel) if the source isn't where we expect: a
    // silently-canceled ratchet protects nothing. Resolve relative to
    // the sbt working dir with a user.dir fallback.
    val candidates = Seq(
      new java.io.File("src/test/scala/graft/PlanQualitySpec.scala"),
      new java.io.File(sys.props.getOrElse("user.dir", "."),
        "src/test/scala/graft/PlanQualitySpec.scala"))
    val specFile = candidates.find(_.isFile).getOrElse(
      fail(s"PlanQualitySpec source not found from cwd " +
        s"${sys.props.get("user.dir")} — fix the path, do not skip " +
        "the ratchet"))
    val spec = new String(
      java.nio.file.Files.readAllBytes(specFile.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val keys = SparkEntry.queries.keySet
    // Word-boundary match, not raw substring: gate names are
    // prefix-nested (q_source_search vs q_source_search_agg), so a
    // bare contains() would count a new key as covered whenever a
    // longer sibling is mentioned.
    def mentioned(key: String): Boolean =
      ("(?<![a-z0-9_])" + java.util.regex.Pattern.quote(key) +
        "(?![a-z0-9_])").r.findFirstIn(spec).isDefined
    val uncovered = keys.filterNot(mentioned).diff(frozenBaseline)
    assert(uncovered.isEmpty,
      s"new gate(s) without a PlanQualitySpec mention: " +
        s"${uncovered.toSeq.sorted.mkString(", ")} — write the plan " +
        "gate (do not extend the frozen baseline)")
    // The baseline may only shrink: stale entries (renamed/removed
    // gates) must be dropped, not accumulated.
    val stale = frozenBaseline.diff(keys)
    assert(stale.isEmpty,
      s"baseline names gates that no longer exist: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }
}
