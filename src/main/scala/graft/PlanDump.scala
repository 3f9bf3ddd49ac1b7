package graft

/** Dev tool: dump formatted physical plans for representative queries
  * (regenerates PLANS.md content). Optional second arg: a file of
  * `[bench] <name> ... jobs=...` detail lines (Bench stderr) — the
  * matching counter line is printed above each plan so the section
  * carries the execution shape alongside the static plan. Optional
  * third arg: the provenance label for those lines (round + scale,
  * e.g. "r7 counters (sf0.1, min pass)") so a regeneration can never
  * stamp data with a stale round/scale claim.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val counters: Map[String, String] =
      if (args.length > 1)
        scala.util.Using.resource(scala.io.Source.fromFile(args(1))) { src =>
          src.getLines()
            .filter(_.contains("[bench]"))
            .flatMap { l =>
              l.split("\\s+").find(_.startsWith("q"))
                .map(_ -> l.dropWhile(_ != '[').trim)
            }.toMap
        }
      else Map.empty
    val label = if (args.length > 2) args(2) else "bench counters (min pass)"
    // optional 4th arg: comma-separated subset of the list to dump
    // (incremental regeneration — splice the sections into PLANS.md)
    val onlyNames = if (args.length > 3)
      Some(args(3).split(",").map(_.trim).toSet) else None
    val qs = Seq("q01_pricing_summary", "q02_filter_project",
      "q10_join_revenue_by_nation", "q12_anti_join", "q21_sort_limit",
      "q51_dedup_minhash_lsh", "q52_dedup_ngram_jaccard",
      "q54_ann_brute_topk",
      "q55_embedding_neardup", "q56_ann_lsh_topk", "q57_ann_ivf_topk",
      "q65_dedup_ensemble", "q67_neardup_lsh_banded",
      "q68_dedup_components", "q72_curation_neardup",
      "q73_events_sliding",
      "q75_stratified_sample", "q77_vocab_topk", "q80_incremental_dedup",
      "q89_repetition_stats", "q90_dup_ngrams", "q91_embedding_outliers",
      "q92_mix_weights", "q93_event_funnel", "q94_dup_source_matrix",
      "q95_length_strata", "q96_token_fertility", "q97_source_hhi",
      "q98_length_quantiles", "q99_value_hour_corr",
      "q100_incremental_minhash", "q101_band_index_probe",
      "q102_multimodal_decode", "q103_salted_join", "q104_pii_scrub",
      "q105_dedup_keep_best", "q106_ivf_index_append", "q107_corpus_split",
      "q108_leakage_safe_split", "q109_rare_token_gate",
      "q110_stream_curate", "q111_sql_pii_registry",
      "q112_band_index_append", "q113_frame_sample",
      "q114_source_quota", "q115_train_order",
      "q116_ann_ivf_pq_topk", "q117_bloom_gated_dedup",
      "q118_bloom_index_probe", "q119_pq_index_append",
      "q120_bloom_stream_ingest", "q121_pq_refined_topk",
      "q122_simhash_index_append", "q123_band_stream_ingest",
      "q124_bm25_topk", "q125_quantile_sketch", "q126_interval_join",
      "q127_good_turing", "q128_weighted_sample",
      "q129_pq_filtered_topk", "q130_sketch_stream",
      "q131_incremental_components", "q132_countmin_tokens",
      "q133_media_neardup", "q134_ann_lsh_multiprobe",
      "q135_strip_dup_spans", "q136_simhash_stream_ingest",
      "q137_token_budget_mix", "q138_robust_outliers",
      "q139_bm25_index_serve", "q140_label_stream_ingest",
      "q141_interval_overlap", "q142_bm25_stream_serve",
      "q143_incremental_agg", "q144_kmv_source_overlap",
      "q145_editdist_neardup", "q146_bigram_surprisal",
      "q147_contamination_frac", "q148_agg_stream", "q149_heavy_tokens",
      "q150_pq_stream_serve", "q151_ivf_stream_serve",
      "q152_bm25_absorb_serve", "q153_semdedup", "q154_diverse_sample",
      "q155_hll_distinct", "q156_dsir_weights", "q157_bm25_log_topk",
      "q158_bm25_delete_serve", "q159_pq_delete_serve",
      "q160_band_delete_probe", "q161_hll_stream", "q162_label_delete",
      "q163_bm25_snapshot_serve", "q164_bm25_time_travel",
      "q165_pq_snapshot_serve", "q166_bm25_expand", "q167_phrase_match",
      "q168_pca_project", "q169_temperature_mix",
      "q170_phrase_index_serve", "q171_rollup", "q172_pivot",
      "q173_phrase_delete_serve", "q174_doremi_weights",
      "q175_phrase_stream_serve", "q176_pca_stream_fit",
      "q177_rank_agreement", "q178_hybrid_rrf", "q179_result_dedup",
      "q180_kwic_snippets", "q181_agg_retract_serve", "q182_mmr_rerank",
      "q183_hard_negatives", "q184_search_stack", "q185_source_drift",
      "q186_cube", "q188_unpivot", "q190_pagerank",
      "q191_ridge_residuals", "q192_nb_language", "q193_postings_changes",
      "q195_grouped_median", "q196_drift_stream", "q197_hits",
      "q198_bfs_hops", "q199_triangles", "q200_cohort_retention",
      "q201_exact_quantiles", "q203_rank_features", "q204_scd2_history",
      "q205_cdc_apply", "q206_collocations", "q207_bpe_train",
      "q208_band_snapshot_serve", "q209_phrase_time_travel",
      "q210_dup_spans", "q211_winnow_fingerprints", "q212_span_trim",
      "q213_bpe_fertility", "q214_winnow_index_serve",
      "q215_winnow_stream_ingest", "q216_winnow_delete_probe",
      "q217_kcore", "q218_ndcg_eval", "q219_kneser_ney",
      "q220_cm_stream", "q221_spell_correct", "q222_roc_auc",
      "q223_ann_ivf_sq8_topk", "q224_pr_curve", "q225_span_corruption",
      "q226_rendezvous_shards", "q227_confusion",
      "q228_postings_l0_compact", "q229_calibration_bins",
      "q230_containment_dedup", "q231_bpe_train_batched",
      "q232_ndcg_eval_full", "q233_auto_compact_policy",
      "q234_bpe_vocab_scale", "q235_sequence_packing",
      "q236_bpe_encode_ids", "q237_decontaminate",
      "q238_committed_stream_ingest", "q239_bin_packing",
      "q240_zonemap_range_serve", "q241_committed_postings_ingest",
      "q242_committed_winnow_ingest", "q243_bpe_32k_merges",
      "q244_curation_capstone", "q245_pq_auto_retrain",
      "q246_suffix_dup_spans", "q247_pq_zonemap_range_serve",
      "q248_committed_ivf_ingest", "q249_committed_pq_ingest",
      "q250_suffix_trim", "q251_boilerplate_report",
      "q252_committed_agg_ingest", "q253_suffix_keep_first",
      "q254_suffix_clean_text", "q255_capstone_exact_trim",
      "q256_docstore_source_serve", "q257_suffix_ranged_audit",
      "q258_committed_doc_ingest", "q259_suffix_rebuild_policy",
      "q260_lineage_pinned_build", "q261_semantic_decontam",
      "q262_quality_distill", "q263_distill_auc",
      "q264_semantic_gated_ingest", "q265_trustrank")
    for (q <- qs if onlyNames.forall(_.contains(q))) {
      println(s"\n## $q\n")
      counters.get(q).foreach(l => println(s"$label: `$l`\n"))
      println("```")
      println(SparkEntry.queries(q)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
      println("```")
    }
    spark.stop()
  }
}
