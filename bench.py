"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop write (full materialization, no
sink cost) and measured at STEADY STATE: one untimed warmup execution of
the same plan, then the timed run. At sf0.1 a single local JVM spends more
wall-clock janino-compiling and JIT-ing each query's generated code than
executing it (measured: 10-50s cold vs 1-3s warm, with huge run-to-run
variance from compiler-queue contention) — on a real cluster that cost
amortizes over hours of a 100 TB job, so cold numbers would grade compiler
luck, not plans. The per-query cold time is still reported under
"cold_queries" for transparency.
"""

from __future__ import annotations

import json
import os
import sys
import time

from mariadb_postgres_migration_spark.registry import REGISTRY, load_all_query_modules
from mariadb_postgres_migration_spark.session import get_session

#: Headliners: reference-surface flagship + threading, TPC-H-style heavies,
#: and (as they land) the extension heavies. Names must exist in REGISTRY.
HEADLINE = [
    "op18_flagship_group_concat",
    "op20_backref_threading",
    "op20_backref_threading_hof",
    "op20_backref_threading_grouped",
    "op15_three_way_join",
    "op31_normalize_text",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume_flow",
    "q10_returned_item_revenue",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_predicate_join",
    "j1_asof_join",
    "j2_interval_join",
    "w1_topk_per_group",
    "p1_percentiles_by_flag",
    "p2_percentile_disc_distributed",
    "x02_dedup_ngram_jaccard",
    "x03_dedup_minhash_lsh",
    "x04_dedup_simhash",
    "x05_dedup_embedding_cosine",
    "x06_knn_bruteforce",
    "x07_knn_ivf",
    "x25_knn_hyperplane_lsh",
    "x09_quality_score",
    "x08_11_text_profile",
    "x12_winnow_fingerprints",
    "x15_window_tumbling",
    "x27_dedup_connected_components",
    "x28_term_doc_freq",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    # r5: the driver-window consolidation suites — between them they bench
    # every extension operator added since r4 (x32-x37 and x39-x53 run as
    # suite members, so their standalone rows were dropped as double counts)
    "x42_pipeline_suite",
    "x49_dedup_quality_suite",
    "x50_scale_analysis_suite",
    # r5: composed end-to-end curation chain
    "c1_curation_pipeline",
    # r5: pipeline-health suite (expectations audit + SCD2 + exact heavy
    # hitters + corpus drift + checksum/diff + pagerank + IVM + streamed
    # checksum as members)
    "x65_health_suite",
    # r6: driver-window consolidation suites for the r5 tail — x54/x55/x58
    # /x60/x72/x56 run inside x76 and x71/x73/x74/x75/c2/c3/x57 inside x77,
    # so their r5 standalone rows were dropped as double counts (the same
    # consolidation x42/x49/x50 applied to x32-x53)
    "x76_retrieval_suite",
    "x77_behavioral_suite",
    # r6 tail: CDC repair loop, BPE train/encode, streamed anomaly,
    # incremental near-dup — consolidated same-round; r7 split the
    # 35-member suite in two for attribution and blast-radius
    "x84a_sketch_stream_suite",
    "x84b_graph_pipeline_suite",
    # r7 tail: sessionize, autocorrelation, Benford, integer-exact HLL
    # (batch + streamed), PMI collocations, TF-IDF cosine — consolidated
    # same-round; q15 is the TPC-H q7+q10 consolidation that funds it
    "q15_joins_suite",
    "x123_r7_ops_suite",
    # r8 tail: CUSUM changepoint, label propagation, Spearman daily,
    # KS source drift — consolidated same-round; q16 is the TPC-H q1+q3
    # consolidation that funds it (q1/q3 stay above as standalones for
    # the frozen r4/r6 series)
    "q16_core_agg_suite",
    "x128_r8_ops_suite",
    # r8 second wave: Mann-Kendall, Theil-Sen, Gini, vocab richness —
    # consolidated same-round; w4 is the w1+w2_3 consolidation that funds
    # it (w1/w2_3 stay above as standalones for the frozen series)
    "w4_window_suite",
    "x133_r8b_ops_suite",
    # r8 third wave: cluster-size histogram, burstiness, Zipf profile —
    # consolidated same-round; s2 is the set_operations+g_grouping
    # consolidation that funds it
    "s2_setgroup_suite",
    "x137_r8c_ops_suite",
    # r8 fourth wave: split manifest + rendezvous shards — consolidated
    # same-round; t2 is the q18+t1 consolidation that funds it
    "t2_aggstress_suite",
    "x140_r8d_ops_suite",
    # r9: ANN tiers + measured recall@5 as one driver row — s4 is the
    # x07+x25 consolidation that funds it (both stay above as standalones
    # for the frozen r4 series) — and the composed pretraining endgame
    # pipeline (curate -> split -> shard -> pack)
    "s4_ann_suite",
    "c7_pretraining_pipeline",
    # r9 second wave: pack utilization + cross-split leakage (the c7
    # audit half) — st3 is the x18+x19 streaming-window consolidation
    # that funds it (both stay above as standalones for the frozen
    # r4 series)
    "st3_stream_window_suite",
    "x145_r9b_ops_suite",
    # r9 third wave: shingle novelty + seq-len histogram — st4 is the
    # x20+x22 stateful-streaming consolidation that funds it (both stay
    # above as standalones for the frozen r4 series)
    "st4_stream_pair_suite",
    "x148_r9c_ops_suite",
    # r9 fourth wave: runs test + ordinal patterns — d2 is the x03+x04
    # signature-dedup consolidation that funds it (both stay above as
    # standalones for the frozen r4 series)
    "d2_signature_suite",
    "x151_r9d_ops_suite",
    # r9 fifth wave: the per-source curation funnel — m2 is the x14+x26
    # multimodal consolidation that funds it (both stay above as
    # standalones for the frozen r4 series)
    "m2_multimodal_suite",
    "x152_curation_funnel",
    # r10: the composed multimodal curation pipeline (decode gate ->
    # payload-hash dedup -> dimension gate -> c7 split/shard pairing) —
    # d3 is the x01+x02 dedup consolidation that funds it (x02 stays
    # above as a standalone for the frozen r4 series)
    "d3_dedup_core_suite",
    "c8_multimodal_pipeline",
    # r10 second wave: the multimodal funnel + paired-dataset profile
    # (the c8 audit half) — s5 is the x05+x06 embedding consolidation
    # that funds it (both stay above as standalones for the frozen r4
    # series)
    "s5_embcore_suite",
    "x156_r10b_ops_suite",
    # r10 third wave: image aHash + banded hamming near-dup (perceptual
    # image dedup over the REAL pixel decoders) — d4 is the x27+x28
    # consolidation that funds it (both stay above as standalones for
    # the frozen r4 series)
    "d4_cc_term_suite",
    "x159_r10c_ops_suite",
    # r10 fourth wave: permutation entropy + curriculum phases — w5 is
    # the x15_16+x24 consolidation that funds it (neither member was a
    # HEADLINE standalone; the r4 series' window row is
    # x15_window_tumbling, which stays above untouched)
    "w5_windowthread_suite",
    "x162_r10d_ops_suite",
    # r10 fifth wave: image dedup keep-one + dHash companion signature —
    # j13 is the p2+j12 consolidation that funds it (p2 stays above as a
    # standalone for the frozen r4 series)
    "j13_order_temporal_suite",
    "x165_r10e_ops_suite",
    # r10 sixth wave: GIF-decoded aHash + dual-hash verified pairs — t3
    # is the q15+t2 suite-of-suites consolidation that funds it (q15/t2
    # and all THEIR members stay benched; frozen series untouched)
    "t3_tpch_join_agg_suite",
    "x168_r10f_ops_suite",
    # r10 seventh wave: incremental image dedup + per-source image
    # profile — s6 is the s2+w4 suite-of-suites consolidation that funds
    # it (s2/w4 and all THEIR members stay benched; frozen series
    # untouched)
    "s6_setwindow_suite",
    "x171_r10g_ops_suite",
    # r10 eighth wave: caption-image rank correlation + curriculum/split
    # mix audit — t4 is the x08_11+q_scalar consolidation that funds it
    # (x08_11 stays above as a standalone for the frozen r4 series)
    "t4_profile_scalar_suite",
    "x174_r10h_ops_suite",
    # r11: the perceptual-dedup composed multimodal pipeline (decode gate
    # -> aHash/banded-LSH/keep-one dedup -> dim gate -> c7 pairing — the
    # c8 skeleton with the dedup tier swapped) — m3 is the x156+x159
    # suite-of-suites consolidation that funds it (x156/x159 and all
    # THEIR members stay benched; frozen series untouched)
    "m3_r10bc_suite",
    "c9_multimodal_lsh",
    # r11 second wave: MJPEG-in-AVI frame decode (the last stub modality
    # made real) + measured banded image near-dup recall — m4 is the
    # x162+x165 suite-of-suites consolidation that funds it (x162/x165
    # and all THEIR members stay benched; frozen series untouched)
    "m4_r10de_suite",
    "x177_r11b_ops_suite",
    # r11 third wave: JPEG decode-validity funnel (progressive counted
    # distinctly from corrupt) + video perceptual dedup — m5 is the
    # x168+x171 suite-of-suites consolidation that funds it (x168/x171
    # and all THEIR members stay benched; frozen series untouched)
    "m5_r10fg_suite",
    "x180_r11c_ops_suite",
    # r11 fourth wave: video header profile (no-decode metadata screen)
    # + scene-change deltas over the sampled frames — m6 is the x145+x148
    # suite-of-suites consolidation that funds it (x145/x148 and all
    # THEIR members stay benched; frozen series untouched)
    "m6_r9bc_suite",
    "x183_r11d_ops_suite",
    # r11 fifth wave: incremental video ingest dedup + audio energy
    # screening — m7 is the x151+x174 suite-of-suites consolidation that
    # funds it (x151/x174 and all THEIR members stay benched; frozen
    # series untouched)
    "m7_r9d10h_suite",
    "x186_r11e_ops_suite",
    # r11 sixth wave: c10, the composed video curation pipeline (decode
    # gate -> frame-0 signature dedup -> duration gate -> c7 pairing),
    # completing the composed family across modalities — d5 is the d3+d4
    # suite-of-suites consolidation that funds it (d3/d4 and all THEIR
    # members stay benched; frozen series untouched)
    "d5_dedup_agg_suite",
    "c10_video_pipeline",
    # r11 seventh wave: cross-modal pairing audit (c9 ∩ c10 per split) +
    # per-source video capacity profile — w6 is the w5+j13
    # suite-of-suites consolidation that funds it (w5/j13 and all THEIR
    # members stay benched; frozen series untouched)
    "w6_windowtemporal_suite",
    "x189_r11f_ops_suite",
    # r12: video near-dup keep-one (banded hamming over frame-0
    # signatures) + measured video near-dup recall — m8 is the x177+x180
    # suite-of-suites consolidation that funds it (x177/x180 and all
    # THEIR members stay benched; frozen series untouched)
    "m8_r11bc_suite",
    "x192_r12a_ops_suite",
    # r12 second wave: progressive-JPEG pixel stats (the multi-scan
    # Annex-G decode made real) + the decode funnel v2 whose progressive
    # queue drains to pixels — m9 is the x183+x186 suite-of-suites
    # consolidation that funds it (x183/x186 and all THEIR members stay
    # benched; frozen series untouched)
    "m9_r11de_suite",
    "x195_r12b_ops_suite",
    # r12 third wave: cross-path decode parity canary + per-source video
    # near-dup sheet — m10 is the x128+x133 suite-of-suites consolidation
    # that funds it (x128/x133 and all THEIR members stay benched; frozen
    # series untouched)
    "m10_r8ab_suite",
    "x198_r12c_ops_suite",
    # r12 fourth wave: audio near-dup keep-one (banded hamming over the
    # PCM energy-envelope fingerprint) + measured audio near-dup recall —
    # m11 is the x137+x140 suite-of-suites consolidation that funds it
    # (x137/x140 and all THEIR members stay benched; frozen series
    # untouched)
    "m11_r8cd_suite",
    "x201_r12d_ops_suite",
    # r12 fifth wave: c11, the composed audio curation pipeline (decode
    # gate -> VAD silence gate -> envelope near-dup keep-one -> duration
    # gate -> c7 pairing), completing the composed family across every
    # decoded modality — m12 is the s5+s6 suite-of-suites consolidation
    # that funds it (s5/s6 and all THEIR members stay benched; frozen
    # series untouched)
    "m12_embsetwin_suite",
    "c11_audio_pipeline",
    # r12 sixth wave: audio onset screening (the scene-change device on
    # the energy envelope) + per-source audio near-dup sheet — m13 is the
    # t3+t4 suite-of-suites consolidation that funds it (t3/t4 and all
    # THEIR members stay benched; frozen series untouched)
    "m13_joinprofile_suite",
    "x204_r12f_ops_suite",
    # r12 seventh wave: incremental audio ingest probe + the tri-modal
    # pairing audit (c9 ∩ c10 ∩ c11 Venn per split, fed by the session
    # manifest memos) — m14 is the d2+m2 suite-of-suites consolidation
    # that funds it (d2/m2 and all THEIR members stay benched; frozen
    # series untouched)
    "m14_sigmodal_suite",
    "x207_r12g_ops_suite",
    # r12 eighth wave: the audio delta-fingerprint (sign-of-energy-delta)
    # + dual-fingerprint verified pairs — m15 is the st3+st4
    # suite-of-suites consolidation that funds it (st3/st4 and all THEIR
    # members stay benched; frozen series untouched)
    "m15_streaming_suite",
    "x210_r12h_ops_suite",
    # r12 ninth wave: the dual-keyframe video verification device (last-
    # frame aHash + frame-0-banded pairs re-scored by the independent
    # last-frame distance) — m16 is the m3+m4 suite-of-suites
    # consolidation that funds it (m3/m4 and all THEIR members stay
    # benched; frozen series untouched)
    "m16_r10bcde_suite",
    "x213_r12i_ops_suite",
    # r12 tenth wave: the dual-VERIFIED dedup decisions (video pairs
    # confirmed by both keyframes, audio pairs confirmed by both bit
    # rules, then CC keep-one) — m17 is the m5+m6 suite-of-suites
    # consolidation that funds it
    "m17_r10fg9bc_suite",
    "x216_r12j_ops_suite",
    # r12 eleventh wave: the composed pipelines on the dual-verified
    # dedup tier (c12 video, c13 audio — the c9 tier-swap proof at the
    # VERIFY level) — m18 is the m7+m8 suite-of-suites consolidation
    # that funds it
    "c12_video_dual_pipeline",
    "c13_audio_dual_pipeline",
    "m18_r9d10h11bc_suite",
    "x217_r12k_ops_suite",
    # r12 twelfth wave: the dual-vs-single per-source capacity sheets
    # (n_protected = clips the verification tier keeps that single-
    # signature banding would collapse) — m19 is the m9+m10
    # suite-of-suites consolidation that funds it
    "x218_video_dual_source_sheet",
    "x219_audio_dual_source_sheet",
    "m19_r8ab11de_suite",
    "x220_r12l_ops_suite",
]

#: The queries ALSO present in round 4's HEADLINE (x32-x37 ran standalone
#: there; they live inside x42/x50 now, so the comparable set is the rest).
#: Summed separately in the final line (`value_r4set`) so round-over-round
#: totals compare equal work — the full-suite total keeps absorbing every
#: new operator and is NOT an apples-to-apples series.
#: FROZEN as an explicit list (r6): the r5 prefix-based exclusion would
#: silently eject any future query whose name starts x4/x5/x6/x7/c and
#: shrink the series by accident — membership changes must now be a
#: reviewed diff of this literal.
R4_COMPARABLE = [
    "op18_flagship_group_concat",
    "op20_backref_threading",
    "op20_backref_threading_hof",
    "op20_backref_threading_grouped",
    "op15_three_way_join",
    "op31_normalize_text",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume_flow",
    "q10_returned_item_revenue",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_predicate_join",
    "j1_asof_join",
    "j2_interval_join",
    "w1_topk_per_group",
    "p1_percentiles_by_flag",
    "p2_percentile_disc_distributed",
    "x02_dedup_ngram_jaccard",
    "x03_dedup_minhash_lsh",
    "x04_dedup_simhash",
    "x05_dedup_embedding_cosine",
    "x06_knn_bruteforce",
    "x07_knn_ivf",
    "x25_knn_hyperplane_lsh",
    "x09_quality_score",
    "x08_11_text_profile",
    "x12_winnow_fingerprints",
    "x15_window_tumbling",
    "x27_dedup_connected_components",
    "x28_term_doc_freq",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
]

#: The r6-comparable series (frozen at r7): the r4 set PLUS the stable
#: consolidation suites. x84a/x84b jointly run the exact member set the
#: r6 x84_r6_ops_suite ran (split for attribution in r7), so their sum is
#: comparable to r6's x84 row; x50 absorbed x12 in r7 (x12 also stays
#: standalone in the r4 set, so the r6set double-counts its ~0.3s — the
#: freeze keeps the series consistent from here forward rather than
#: perfectly disjoint). Emitted as `value_r6set` on the final line.
R6_COMPARABLE = R4_COMPARABLE + [
    "x42_pipeline_suite",
    "x49_dedup_quality_suite",
    "x50_scale_analysis_suite",
    "x65_health_suite",
    "c1_curation_pipeline",
    "x76_retrieval_suite",
    "x77_behavioral_suite",
    "x84a_sketch_stream_suite",
    "x84b_graph_pipeline_suite",
]

#: Frozen host-speed reference for the calibrated series (VERDICT r8 #1):
#: the r7 recording's `calib.jvm` probe (0.462s for the fixed 20M-row
#: shuffle agg). `value_r4set_cal` / `value_r6set_cal` divide the raw
#: frozen-series totals by (calib.jvm / JVM_CALIB_REF), so a round recorded
#: on a 1.5x-slower host (r8: jvm 0.677) reports a comparable number
#: without a manual worktree A/B. r7 is the anchor because it is the first
#: round where BOTH frozen series exist alongside the calib probes.
#: Calibrated values are the cross-round SERIES signal; raw values remain
#: the ground truth for same-host comparisons.
JVM_CALIB_REF = 0.462

#: A suite warm time above this multiple of its members' individual warm-time
#: sum (same process, measured right after the suite) AND above the absolute
#: overhead floor is flagged on the final line as `suites_inflated` — the r7
#: x77 eviction defect would have tripped this at 2.05x / +17.9s. The floor
#: exists because sub-second suites carry fixed per-action costs (scheduler,
#: noop-commit, plan construction) that dominate their ratio without meaning
#: anything: w4 measured 0.59s vs a 0.38s member sum — a 1.5x "inflation"
#: of 0.2 seconds is not the eviction defect class this flag hunts.
SUITE_INFLATION_RATIO = 1.5
SUITE_INFLATION_MIN_SECONDS = 2.0

#: Consolidation suites → their member queries, benched individually (warm
#: only) AFTER the suite itself so a member regression is attributable
#: without de-consolidating the driver row. Member times appear on the
#: suite_member_timings detail line, NOT in the final-line totals (the
#: suite already counts that work once).
SUITE_MEMBERS = {
    "x42_pipeline_suite": [
        "x35_pii_scrub", "x36_sequence_pack", "x37_mix_resample",
        "x39_chunk_overlap", "x40_decontaminate",
    ],
    "x49_dedup_quality_suite": [
        "x41_dedup_cc_star", "x45_incremental_dedup", "x46_best_per_source",
        "x47_dedup_keep_best", "x43_stream_pii_scrub",
    ],
    "x50_scale_analysis_suite": [
        "x32_gopher_repetition", "x33_stratified_sample",
        "x34_ivf_train_kmeans", "x38_embedding_quantize_int8",
        "x44_bpe_pair_counts", "x48_knn_multiprobe_lsh", "x51_semdedup",
        "x52_unigram_logprob", "x53_bm25_topk",
        "x12_winnow_fingerprints",  # folded in r7 (standalone → tier 1)
    ],
    "x65_health_suite": [
        "x61_expectations_audit", "x62_scd2_intervals", "x63_frequent_terms",
        "x64_corpus_drift", "x66_migration_checksum", "x67_snapshot_diff",
        "x68_pagerank", "x69_incremental_agg_maintenance",
        "x70_stream_checksum",
    ],
    "x76_retrieval_suite": [
        "x54_pq_encode", "x55_knn_ivfpq", "x58_pq_train_codebooks",
        "x60_multimodal_pixel_stats", "x78_gif_pixel_stats",
        "x115_jpeg_pixel_stats",  # r7: the JPEG decode path
        "x72_bloom_incremental_dedup", "x56_substring_dedup_spans",
    ],
    "x84a_sketch_stream_suite": [
        "x80_bpe_train_merges", "x81_bpe_encode_topk",
        "x87_kmv_distinct_sketch", "x89_cms_point_frequency",
        "x91_stream_cms_counters", "x92_exact_quantiles",
        "x93_weighted_sample", "x95_bigram_logprob", "x97_char_entropy",
        "x99_kmv_set_relations", "x101_stream_kmv_state",
        "x102_equidepth_histogram", "x106_table_profile",
        "x108_bitmap_set_relations", "x111_percentile_rank",
        "x112_decayed_value", "x113_mad_robust",
        "x114_frequent_trigrams",
    ],
    "x84b_graph_pipeline_suite": [
        "c4_migration_repair", "x82_stream_rolling_anomaly",
        "x83_incremental_neardup", "x85_triangle_counts",
        "x86_audio_pcm_stats", "x88_prefix_filter_neardup",
        "x90_association_lift", "x94_bfs_hops", "x96_skyline_pareto",
        "x100_kcore_peel", "x103_ols_trend", "x104_editdist1_join",
        "x105_random_walks", "x107_cohort_retention",
        "x109_markov_transitions", "x110_cheapest_paths",
        "c6_funnel_latency",
    ],
    "q15_joins_suite": ["q7_nation_volume_flow", "q10_returned_item_revenue"],
    "q16_core_agg_suite": ["q1_pricing_summary", "q3_shipping_priority"],
    "x128_r8_ops_suite": [
        "x124_cusum_changepoint", "x125_label_propagation",
        "x126_spearman_daily", "x127_ks_source_drift",
    ],
    "w4_window_suite": ["w1_topk_per_group", "w2_3_window_analytics"],
    "s2_setgroup_suite": ["set_operations", "g_grouping_analytics"],
    "t2_aggstress_suite": ["q18_large_volume_orders", "t1_salted_skew_agg"],
    "x140_r8d_ops_suite": [
        "x138_split_manifest", "x139_rendezvous_shards",
        "x141_stream_split_manifest",
    ],
    "s4_ann_suite": [
        "x07_knn_ivf", "x25_knn_hyperplane_lsh", "x142_ann_recall",
        "x153_knn_pq_adc",  # r10: its ADC formulation runs inside x142
    ],
    "st3_stream_window_suite": ["x18_stream_tumbling", "x19_stream_session"],
    "x145_r9b_ops_suite": ["x143_pack_utilization", "x144_split_leakage"],
    "st4_stream_pair_suite": ["x20_stream_dedup", "x22_stream_stream_join"],
    "x148_r9c_ops_suite": ["x146_shingle_novelty", "x147_seqlen_histogram"],
    "d2_signature_suite": ["x03_dedup_minhash_lsh", "x04_dedup_simhash"],
    "x151_r9d_ops_suite": ["x149_runs_test", "x150_ordinal_patterns"],
    "m2_multimodal_suite": ["x14_multimodal_decode", "x26_multimodal_features"],
    "d3_dedup_core_suite": ["x01_dedup_exact", "x02_dedup_ngram_jaccard"],
    "s5_embcore_suite": ["x05_dedup_embedding_cosine", "x06_knn_bruteforce"],
    "x156_r10b_ops_suite": ["x154_multimodal_funnel", "x155_paired_profile"],
    "d4_cc_term_suite": ["x27_dedup_connected_components", "x28_term_doc_freq"],
    "x159_r10c_ops_suite": ["x157_image_ahash", "x158_image_neardup"],
    "w5_windowthread_suite": ["x15_16_window_batch", "x24_stream_threading"],
    "x162_r10d_ops_suite": ["x160_permutation_entropy", "x161_curriculum_phases"],
    "j13_order_temporal_suite": [
        "p2_percentile_disc_distributed", "j12_temporal_joins",
    ],
    "x165_r10e_ops_suite": ["x163_image_dedup_keep_one", "x164_image_dhash"],
    "t3_tpch_join_agg_suite": ["q15_joins_suite", "t2_aggstress_suite"],
    "x168_r10f_ops_suite": ["x166_gif_ahash", "x167_dualhash_pairs"],
    "s6_setwindow_suite": ["s2_setgroup_suite", "w4_window_suite"],
    "x171_r10g_ops_suite": [
        "x169_incremental_image_dedup", "x170_source_image_profile",
    ],
    "t4_profile_scalar_suite": ["x08_11_text_profile", "q_scalar_suite"],
    "x174_r10h_ops_suite": [
        "x172_caption_image_corr", "x173_phase_split_mix",
    ],
    "m3_r10bc_suite": ["x156_r10b_ops_suite", "x159_r10c_ops_suite"],
    "m4_r10de_suite": ["x162_r10d_ops_suite", "x165_r10e_ops_suite"],
    "x177_r11b_ops_suite": [
        "x175_video_frame_stats", "x176_image_neardup_recall",
    ],
    "m5_r10fg_suite": ["x168_r10f_ops_suite", "x171_r10g_ops_suite"],
    "x180_r11c_ops_suite": [
        "x178_jpeg_decode_funnel", "x179_video_perceptual_dedup",
    ],
    "m6_r9bc_suite": ["x145_r9b_ops_suite", "x148_r9c_ops_suite"],
    "x183_r11d_ops_suite": [
        "x181_video_header_profile", "x182_video_scene_change",
    ],
    "m7_r9d10h_suite": ["x151_r9d_ops_suite", "x174_r10h_ops_suite"],
    "x186_r11e_ops_suite": [
        "x184_incremental_video_dedup", "x185_audio_energy_screen",
    ],
    "d5_dedup_agg_suite": ["d3_dedup_core_suite", "d4_cc_term_suite"],
    "w6_windowtemporal_suite": [
        "w5_windowthread_suite", "j13_order_temporal_suite",
    ],
    "x189_r11f_ops_suite": [
        "x187_crossmodal_pairs", "x188_video_source_profile",
    ],
    "m8_r11bc_suite": ["x177_r11b_ops_suite", "x180_r11c_ops_suite"],
    "x192_r12a_ops_suite": [
        "x190_video_neardup_keep_one", "x191_video_neardup_recall",
    ],
    "m9_r11de_suite": ["x183_r11d_ops_suite", "x186_r11e_ops_suite"],
    "x195_r12b_ops_suite": [
        "x193_progressive_pixel_stats", "x194_jpeg_decode_funnel_v2",
    ],
    "m10_r8ab_suite": ["x128_r8_ops_suite", "x133_r8b_ops_suite"],
    "x198_r12c_ops_suite": [
        "x196_decode_path_parity", "x197_video_neardup_source_sheet",
    ],
    "x137_r8c_ops_suite": [
        "x134_cluster_size_histogram", "x135_interarrival_burstiness",
        "x136_zipf_profile",
    ],
    "x133_r8b_ops_suite": [
        "x129_mann_kendall", "x130_theil_sen",
        "x131_gini_concentration", "x132_vocab_richness",
    ],
    "x123_r7_ops_suite": [
        "x116_sessionize", "x117_autocorr_daily", "x118_benford_audit",
        "x119_hll_distinct", "x120_pmi_collocations",
        "x121_stream_hll_state", "x122_tfidf_cosine",
    ],
    "x77_behavioral_suite": [
        "x71_funnel_stages", "x73_stream_funnel", "x74_stream_windowed_topk",
        "x75_rolling_anomaly", "c3_entity_resolution",
        "x57_stream_incremental_dedup", "c2_curation_pipeline_lsh",
    ],
    # r12 fourth-eighth waves (members are the DIRECT union legs only —
    # deeper members are attributed through their own entries above;
    # composed c-pipelines stay out per the c9/c10 convention)
    "m11_r8cd_suite": ["x137_r8c_ops_suite", "x140_r8d_ops_suite"],
    "x201_r12d_ops_suite": [
        "x199_audio_neardup_keep_one", "x200_audio_neardup_recall",
    ],
    "m12_embsetwin_suite": ["s5_embcore_suite", "s6_setwindow_suite"],
    "m13_joinprofile_suite": [
        "t3_tpch_join_agg_suite", "t4_profile_scalar_suite",
    ],
    "x204_r12f_ops_suite": [
        "x202_audio_onset_screen", "x203_audio_neardup_source_sheet",
    ],
    "m14_sigmodal_suite": ["d2_signature_suite", "m2_multimodal_suite"],
    "x207_r12g_ops_suite": [
        "x205_incremental_audio_dedup", "x206_trimodal_pairs",
    ],
    "m15_streaming_suite": [
        "st3_stream_window_suite", "st4_stream_pair_suite",
    ],
    "x210_r12h_ops_suite": [
        "x208_audio_delta_fingerprint", "x209_audio_dualhash_pairs",
    ],
    "m16_r10bcde_suite": ["m3_r10bc_suite", "m4_r10de_suite"],
    "x213_r12i_ops_suite": [
        "x211_video_lastframe_ahash", "x212_video_dualframe_pairs",
    ],
    "m17_r10fg9bc_suite": ["m5_r10fg_suite", "m6_r9bc_suite"],
    "x216_r12j_ops_suite": [
        "x214_video_dualverified_keep_one", "x215_audio_dualverified_keep_one",
    ],
    "m18_r9d10h11bc_suite": ["m7_r9d10h_suite", "m8_r11bc_suite"],
    "x217_r12k_ops_suite": [
        "c12_video_dual_pipeline", "c13_audio_dual_pipeline",
    ],
    "m19_r8ab11de_suite": ["m9_r11de_suite", "m10_r8ab_suite"],
    "x220_r12l_ops_suite": [
        "x218_video_dual_source_sheet", "x219_audio_dual_source_sheet",
    ],
}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:  # '…/sf0.1' → 0.1; any other path shape records sf as unknown
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    load_all_query_modules()
    spark = get_session(
        app_name="mps-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            # 46 query executions compile hundreds of large generated
            # classes; the JVM default 240m code cache fills mid-suite and
            # evicted methods run interpreted (10-50x), which is why late
            # heavies showed wild run-to-run variance.
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        # label the job group (guide §1.5) so event-log / UI triage can
        # attribute every stage to its bench row
        spark.sparkContext.setJobDescription(f"bench:{name}")
        t0 = time.time()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        # Operators legitimately persist() multi-consumer intermediates but
        # only for the query's own lifetime; ownership of those handles is
        # ours once the action completes (dedup.release_cached_intermediates)
        # — draining them keeps dozens of executions from accumulating into a
        # full storage pool whose GC dominates later timings. clearCache
        # stays as the backstop for anything persisted outside that registry.
        # JIT/codegen warmth is unaffected.
        from mariadb_postgres_migration_spark.operators.dedup import (
            release_cached_intermediates,
        )

        release_cached_intermediates()
        spark.catalog.clearCache()
        # Force a Python→JVM GC round-trip BETWEEN timed runs (cost lands
        # outside the timed region): Spark's ContextCleaner only reclaims
        # broadcasts/shuffles/accumulators when their JVM handles are GC'd,
        # and py4j keeps those handles alive until Python's cyclic GC runs —
        # so 100+ query executions in one process accumulate executor-side
        # state that poisons late queries. Measured at sf0.1: a 19-query
        # prefix left x08_11_text_profile at 10.9s warm; with this hygiene
        # step it runs 1.2s, and the prefix itself got 20% faster. A real
        # cluster self-manages this per-executor; this is measurement
        # hygiene for the single-JVM rig, not a crutch the plans need.
        import gc

        gc.collect()
        spark._jvm.System.gc()
        return elapsed

    # environment probe (see session.tws_available): flips to True the
    # round the container gains protobuf — then the SCALE.md-pre-written
    # transformWithStateInPandas migration is a same-round task
    from mariadb_postgres_migration_spark.session import tws_available

    print(json.dumps({"detail": "env_probe", "transformWithState": tws_available()}))

    # session warmup: pay JVM/Arrow startup once
    REGISTRY["op01_full_scan"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Host calibration: identical r4 code measured ~3x slower on the r5 host
    # (verified via a git-worktree A/B), so absolute seconds are not
    # comparable across rounds. Publish two fixed-work probes — a BLAS
    # matmul (numpy speed) and a count over a fixed Spark shuffle (JVM +
    # scheduler speed) — so recorded rounds can be normalized.
    calib = _host_calibration(spark)

    # test hook: a comma-separated override keeps the contract smoke test
    # (tests/test_bench_contract.py) at two queries instead of the suite
    headline = [
        n for n in os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").split(",") if n
    ] or HEADLINE
    unknown = [n for n in headline if n not in REGISTRY]
    if unknown:
        # a typo'd name silently shrinking the recorded totals is the same
        # coverage hole the registry's duplicate guard closes — fail loudly
        raise SystemExit(f"bench: unknown query names {unknown}")

    # Sectioned recording (r12, VERDICT r11 'Next round #3'): two rounds of
    # ~55-minute full-run recordings were start/end-taint-flagged while
    # ~6-minute windows landed clean, so the run is split into sections of
    # SECTION_RUNS timed queries with a jvm probe at every boundary. A
    # section whose bracketing probes agree is a valid measurement window
    # even when the HOST drifts between sections; taint becomes
    # per-section (any bad section taints the recording) and the
    # drift-robust series composite `value_r4set_cal_sec` normalizes each
    # query by ITS section's probe instead of one start-of-run ratio. The
    # anchored fields (value_r4set_cal etc.) keep their r7 semantics.
    boundary_min: list[float] = []  # min-of-3 jvm per boundary (anchor units)
    boundary_med: list[float] = []  # median-of-3 jvm per boundary (taint units)
    boundary_np: list[float] = []  # min-of-3 numpy matmul per boundary
    sec_of: dict[str, int] = {}  # timed-run name -> section index
    runs_in_section = 0

    def _boundary_probe() -> None:
        # jvm AND np per boundary (r12 first recording: the host ran jvm
        # probes FASTER than the anchor while numpy ran 5x slower — only
        # a per-section np series can attribute that class of session)
        p = _host_calibration(spark, jvm_only=True)
        boundary_min.append(p["jvm"])
        boundary_med.append(p["jvm_med"])
        boundary_np.append(_np_probe_min())

    def _maybe_probe() -> None:
        nonlocal runs_in_section
        if runs_in_section >= SECTION_RUNS:
            _boundary_probe()
            runs_in_section = 0

    boundary_min.append(calib["jvm"])
    boundary_med.append(calib["jvm_med"])
    boundary_np.append(calib["np"])

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in headline:
        _maybe_probe()
        cold[name] = round(run(name), 3)  # warmup = this query's cold run
        # min of two steady runs: the shared local JVM still has GC/JIT
        # noise a real cluster doesn't; min is the standard de-noiser.
        timings[name] = round(min(run(name), run(name)), 3)
        sec_of[name] = len(boundary_min) - 1
        runs_in_section += 1

    # Per-member attribution for the consolidation suites: one untimed
    # compile/warm run, one timed run per member. Detail-line only — the
    # suite row already counts this work once in the totals. Member runs
    # continue the section probes: the suite-vs-member-sum inflation flag
    # compares timings taken up to ~25 minutes apart, so each side's
    # section probe is what separates a host story from an eviction story.
    member_timings: dict[str, dict[str, float]] = {}
    member_section: dict[str, int] = {}  # suite -> section of its member block
    for suite, members in SUITE_MEMBERS.items():
        if suite not in headline:
            continue
        _maybe_probe()
        member_timings[suite] = {}
        member_section[suite] = len(boundary_min) - 1
        for m in members:
            run(m)
            member_timings[suite][m] = round(run(m), 3)
            runs_in_section += 1
    # Suite-vs-member self-check (VERDICT r7 #3): a suite row costing far
    # more than its members' individual sum in the SAME process is the
    # persist-eviction signature that shipped unremarked in r7 (x77: 35.0s
    # suite vs 17.1s member sum). Print the ratio per suite and carry the
    # offenders onto the machine-readable final line so the class
    # self-reports in the recorded artifact.
    suites_inflated: list[str] = []
    if member_timings:
        overhead = {}
        for suite, members in member_timings.items():
            msum = sum(members.values())
            ratio = round(timings[suite] / msum, 2) if msum > 0 else 0.0
            overhead[suite] = {"suite": timings[suite], "member_sum": round(msum, 3), "ratio": ratio}
            if (
                ratio > SUITE_INFLATION_RATIO
                and timings[suite] - msum > SUITE_INFLATION_MIN_SECONDS
            ):
                suites_inflated.append(suite)
        print(json.dumps({"detail": "suite_overhead", "suites": overhead}))
    if member_timings:
        print(json.dumps({"detail": "suite_member_timings", "suites": member_timings}))
        # The driver records only a ~2000-char stdout tail, which evicted
        # this detail line from BENCH_r06.json (judge-verified) — with ~60%
        # of the bench inside suites, a member regression was invisible in
        # the recorded artifact. Persist the dict to a COMMITTED file per
        # round so member attribution is diagnosable from the repo alone.
        _write_member_artifact(member_timings)

    # end-of-run calibration (VERDICT r9 #3): the r9 snapshot A/B caught the
    # host drifting WITHIN a run (jvm 0.424 -> 0.609), which no start-only
    # probe can expose. Median-of-3 at both ends + their spread ride the
    # final line. r12 (VERDICT r11 #3): taint is now adjudicated PER
    # SECTION — a recording every one of whose ~6-minute sections has
    # agreeing bracketing probes is a valid series point even if the host
    # drifted BETWEEN sections, which is what start/end-only probing could
    # never certify. The whole-run spread stays reported for continuity.
    calib_end = _host_calibration(spark, jvm_only=True)
    boundary_min.append(calib_end["jvm"])
    boundary_med.append(calib_end["jvm_med"])
    boundary_np.append(_np_probe_min())
    calib["jvm_start"] = calib["jvm_med"]
    calib["jvm_end"] = calib_end["jvm_med"]
    spread = round(
        abs(calib["jvm_end"] - calib["jvm_start"])
        / min(calib["jvm_end"], calib["jvm_start"]),
        3,
    )
    calib["spread"] = spread
    sec_spreads = [
        round(abs(b - a) / min(a, b), 3)
        for a, b in zip(boundary_med, boundary_med[1:])
    ]
    calib["n_sections"] = len(sec_spreads)
    calib["max_sec_spread"] = max(sec_spreads, default=0.0)
    calib["tainted"] = calib["max_sec_spread"] > CALIB_SPREAD_TAINT
    del calib["jvm_med"]  # superseded by the explicit jvm_start key
    print(json.dumps({
        "detail": "section_calibration",
        "boundary_jvm_min": boundary_min,
        "boundary_jvm_med": boundary_med,
        "boundary_np": boundary_np,
        "section_spreads": sec_spreads,
        "member_block_section": member_section,
    }))

    def _sec_ratio(sec: int) -> float:
        # a section's host-speed ratio: mean of its bracketing min-of-3
        # probes over the r7 anchor (min-of-3 keeps the anchor's units)
        lo = boundary_min[min(sec, len(boundary_min) - 1)]
        hi = boundary_min[min(sec + 1, len(boundary_min) - 1)]
        return ((lo + hi) / 2) / JVM_CALIB_REF

    r4set_cal_sec = round(
        sum(
            t / _sec_ratio(sec_of[n])
            for n, t in timings.items()
            if n in R4_COMPARABLE
        ),
        3,
    )

    total = round(sum(timings.values()), 3)
    r4set = round(sum(t for n, t in timings.items() if n in R4_COMPARABLE), 3)
    r6set = round(sum(t for n, t in timings.items() if n in R6_COMPARABLE), 3)
    # host-speed-normalized series values (see JVM_CALIB_REF)
    calib_ratio = calib["jvm"] / JVM_CALIB_REF if calib.get("jvm") else 1.0
    # Per-query detail goes on its OWN line: the harness that records this
    # output keeps only a bounded tail of stdout, and one fat line holding
    # every per-query timing truncates mid-line and parses as nothing (this
    # lost rounds 2-4 of recorded numbers). The FINAL line is the machine
    # contract — self-contained, and capped via compact_final_line() so it
    # always survives a 2000-char tail capture intact.
    print(
        json.dumps(
            {
                "detail": "per_query_timings",
                "queries": timings,
                "cold_queries": cold,
            }
        )
    )
    # The final line elides the FASTEST rows to fit the tail budget, which
    # in r12 hid 80 of 123 rows and made the round-over-round comparator
    # misread improved rows as dropped ones. Persist the FULL roster +
    # warm/cold maps to a committed per-round file (the members_r{N}.json
    # pattern) so the complete map is always a repo artifact.
    _write_per_query_artifact(headline, timings, cold, sf=sf, cpus=cpus)
    print(
        compact_final_line(
            timings,
            total=total,
            cold_value=round(sum(cold.values()), 3),
            sf=sf,
            cpus=cpus,
            calib=calib,
            value_r4set=r4set,
            value_r6set=r6set,
            value_r4set_cal=round(r4set / calib_ratio, 3),
            value_r6set_cal=round(r6set / calib_ratio, 3),
            value_r4set_cal_sec=r4set_cal_sec,
            suites_inflated=suites_inflated,
        )
    )
    spark.stop()
    return 0


def _current_round() -> int:
    """The round number for the member-timing artifact name:
    $SPARK_GRAFT_ROUND if set, else 1 + the highest BENCH_r{N}.json the
    driver has recorded next to this file (the bench that is running NOW
    becomes that next round's artifact)."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p)))
    ]
    return max(rounds, default=0) + 1


def _write_member_artifact(member_timings: dict[str, dict[str, float]]) -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    bdir = os.path.join(here, ".benchmarks")
    os.makedirs(bdir, exist_ok=True)
    path = os.path.join(bdir, f"members_r{_current_round():02d}.json")
    with open(path, "w") as f:
        json.dump({"suites": member_timings}, f, indent=1, sort_keys=True)
    print(f"suite member timings written to {path}")


def _write_per_query_artifact(
    roster: list[str],
    timings: dict[str, float],
    cold: dict[str, float],
    *,
    sf: float,
    cpus: int,
) -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    bdir = os.path.join(here, ".benchmarks")
    os.makedirs(bdir, exist_ok=True)
    path = os.path.join(bdir, f"per_query_r{_current_round():02d}.json")
    with open(path, "w") as f:
        json.dump(
            {
                "roster": list(roster),
                "warm": timings,
                "cold": cold,
                "sf": sf,
                "cpus": cpus,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"per-query timings written to {path}")


def _host_calibration(spark, jvm_only: bool = False) -> dict[str, float]:
    """Fixed-work probes for cross-round normalization (seconds).

    ``np``: 1024x1024 float64 matmul x4 — the BLAS kernel speed every
    embedding operator rides on. ``jvm``: count of a fixed 20M-row shuffle
    agg — JVM + scheduler throughput, min-of-3 (the series anchor
    JVM_CALIB_REF was recorded min-of-3; keep its semantics). ``jvm_med``:
    median-of-3 of the same runs — the taint instrument (r10, VERDICT r9
    #3): the median is what start/end drift is judged on, because a min
    hides a mid-run slowdown behind one lucky probe. Both are O(fixed),
    independent of sf.
    """
    import numpy as np

    def _np_probe() -> float:
        a = np.ones((1024, 1024))
        t0 = time.time()
        for _ in range(4):
            a = a @ a * 1e-3
        return time.time() - t0

    def _jvm_probe() -> float:
        t0 = time.time()
        spark.range(20_000_000).selectExpr("id % 97 AS k").groupBy(
            "k"
        ).count().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    jvm_runs = sorted(_jvm_probe() for _ in range(3))
    out = {
        "jvm": round(jvm_runs[0], 3),
        "jvm_med": round(jvm_runs[1], 3),
    }
    if not jvm_only:  # the end-of-run probe only consumes jvm_med
        out["np"] = round(min(_np_probe() for _ in range(3)), 3)
    return out


def _np_probe_min() -> float:
    """min-of-3 of the fixed 1024³ float64 matmul probe — the numpy/BLAS
    speed companion to the jvm boundary probes (module-level because the
    section probes need it outside _host_calibration)."""
    import numpy as np

    def once() -> float:
        a = np.ones((1024, 1024))
        t0 = time.time()
        for _ in range(4):
            a = a @ a * 1e-3
        return time.time() - t0

    return round(min(once() for _ in range(3)), 3)


#: Timed runs per calibration section (~6 minutes of a ~95-row headline +
#: ~160 member runs at sf0.1): small enough that a section fits the
#: short-window regime the r11 A/B sessions showed lands clean, large
#: enough that the ~1-4s median-of-3 probe overhead stays ~2% of the run.
SECTION_RUNS = 12

#: Start/end median jvm probes disagreeing by more than this fraction mark
#: the whole recording TAINTED on the final line: the host's speed moved
#: mid-run (the r9 A/B caught 0.424 -> 0.609 within one session), so no
#: single calibration ratio can normalize the run and per-query deltas
#: within it should not be adjudicated against another round. Documented
#: in SCALE.md (benchmark methodology).
CALIB_SPREAD_TAINT = 0.20


#: The driver records only the last ~2000 chars of stdout; leave headroom.
FINAL_LINE_BUDGET = 1800


def compact_final_line(
    timings: dict[str, float],
    *,
    total: float,
    cold_value: float,
    sf: float,
    cpus: int,
    calib: dict[str, float] | None = None,
    value_r4set: float | None = None,
    value_r6set: float | None = None,
    value_r4set_cal: float | None = None,
    value_r6set_cal: float | None = None,
    value_r4set_cal_sec: float | None = None,
    suites_inflated: list[str] | None = None,
) -> str:
    """Serialize the machine-readable summary line, always < FINAL_LINE_BUDGET.

    Keeps the contract keys (metric/value/unit/queries/sf) but, if the full
    per-query map would blow the budget, drops the FASTEST queries first and
    records how many were elided — the slowest queries are the perf signal.
    """
    by_cost = sorted(timings.items(), key=lambda kv: -kv[1])
    keep = len(by_cost)
    while True:
        payload = {
            "metric": "headline_suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": dict(sorted(by_cost[:keep])),
            "n_queries": len(timings),
            "n_elided": len(timings) - keep,
            "cold_value": cold_value,
            # the round-4- and round-6-comparable subsets' warm totals (the
            # full value absorbs every newly added operator, not a series)
            "value_r4set": value_r4set,
            "value_r6set": value_r6set,
            # the same totals divided by (calib.jvm / JVM_CALIB_REF): the
            # host-speed-normalized series (r7-anchored; see JVM_CALIB_REF)
            "value_r4set_cal": value_r4set_cal,
            "value_r6set_cal": value_r6set_cal,
            # drift-robust composite (r12): each query normalized by ITS
            # calibration section's probes instead of one start-of-run ratio
            "value_r4set_cal_sec": value_r4set_cal_sec,
            # suites whose warm time ran > SUITE_INFLATION_RATIO x their
            # members' same-process individual sum (empty = healthy)
            "suites_inflated": suites_inflated or [],
            "sf": sf,
            "cpus": cpus,
            # fixed-work host-speed probes (see _host_calibration): divide
            # by these to compare rounds recorded on different-speed hosts
            "calib": calib or {},
        }
        line = json.dumps(payload)
        if len(line) <= FINAL_LINE_BUDGET or keep == 0:
            # keep == 0: a bare envelope is ~150 chars — always under any
            # sane budget; return it rather than crash the whole recording
            return line
        keep = max(0, keep - 5)


if __name__ == "__main__":
    sys.exit(main())
