"""Plan-quality contract tests (SURVEY §4): pushdown, pruning, broadcast,
and JVM-only hot paths, pinned per headline query. A failure here means the
plan regressed even if results are still correct."""

from __future__ import annotations

import pytest

from mariadb_postgres_migration_spark.plans import (
    broadcast_join_count,
    pushed_filters,
    python_eval_count,
    read_schema_columns,
)
from mariadb_postgres_migration_spark.registry import REGISTRY, load_all_query_modules

load_all_query_modules()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def _run(name):
        return REGISTRY[name].fn(spark, sf_dir)

    return _run


def test_projected_scan_prunes_columns(q):
    """OP-02: a two-column projection must read two columns, not the table."""
    cols = read_schema_columns(q("op02_projected_scan"))
    assert cols and len(cols) <= 3, f"scan reads {cols} — projection not pruned"


def test_filter_pushdown_reaches_scan(q):
    """OP-10: the equality filter must appear in PushedFilters."""
    filters = " ".join(pushed_filters(q("op10_equality_filter")))
    assert filters, "no filters reached the parquet scan"


def test_q6_filters_pushed_and_pruned(q):
    """q6 is a pure scan-side query: filters at the scan, ≤4 columns read."""
    df = q("q6_forecast_revenue")
    assert pushed_filters(df), "q6 predicates did not push down"
    assert len(read_schema_columns(df)) <= 4


def test_broadcast_join_small_dims(q):
    """OP-16 and q5's region/nation dims must broadcast, not shuffle."""
    assert broadcast_join_count(q("op16_broadcast_lookup_join")) >= 1
    assert broadcast_join_count(q("q5_local_supplier_volume")) >= 2


def test_threading_hof_tier_is_jvm_only(q):
    """OP-20's HOF (oracle-companion) tier must contain NO Python operator."""
    assert python_eval_count(q("op20_backref_threading_hof")) == 0


def test_threading_registered_tier_is_bounded_jvm(q):
    """OP-20's registered default: JVM-only window walk with a BOUNDED
    64-row frame — no Python operator, and no unbounded-preceding frame
    (which is O(p²) state on a zipf-hot key)."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    from mariadb_postgres_migration_spark.fixture_queries import OP20_MAX_LOOKBACK

    df = q("op20_backref_threading")
    assert python_eval_count(df) == 0
    text = formatted_plan(df)
    # the bounded frame reached the Window spec (comma keeps the match
    # boundary-exact: '-64,' must not be satisfied by '-640,')
    assert f"-{OP20_MAX_LOOKBACK}," in text
    assert "unboundedpreceding" not in text.lower().replace(" ", "")


def test_threading_grouped_tier_is_arrow(q):
    """The exact-unbounded grouped tier is ONE Arrow-batched streaming
    MapInPandas over key-clustered, key-sorted partitions (an Exchange on
    the key + in-partition Sort feed it) — never row-at-a-time Python, no
    per-group FlatMapGroupsInPandas invocation cost, no window collect_list
    accumulation."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    text = formatted_plan(q("op20_backref_threading_grouped"))
    assert "MapInPandas" in text
    assert "Sort" in text and "Exchange" in text
    assert "FlatMapGroupsInPandas" not in text
    assert "BatchEvalPython" not in text
    assert "collect_list" not in text


def test_dedup_paths_are_jvm_only(q):
    """EXT-01/02 hot paths: shingling/minhash/jaccard all JVM-side."""
    for name in (
        "x01_dedup_exact",
        "x02_dedup_ngram_jaccard",
        "x03_dedup_minhash_lsh",
        "x04_dedup_simhash",
    ):
        assert python_eval_count(q(name)) == 0, f"{name} fell off the JVM path"


def test_knn_blas_kernel_single_corpus_pass(q):
    """x06: the corpus streams ONCE through the Arrow-batched BLAS
    matmul kernel (probes ride along as a broadcast variable) — no
    row-expansion join shape (BroadcastNestedLoopJoin / CartesianProduct
    would mean corpus × probes rows materialize), and the only exchange
    is the k·n_batches-row partial-top-k merge."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    text = formatted_plan(q("x06_knn_bruteforce"))
    assert "MapInPandas" in text
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text


def test_udf_tier_is_arrow_not_row(q):
    """OP-31 normalize is the sanctioned Python tier — it must be the
    Arrow-vectorized form, never row-at-a-time BatchEvalPython."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    text = formatted_plan(q("op31_normalize_text"))
    assert "ArrowEvalPython" in text
    assert "BatchEvalPython" not in text


def test_hyperplane_lsh_bucket_is_jvm_only(q):
    """x25: the random-hyperplane bucket key is row-local JVM expressions;
    Python anywhere in candidate generation would gate the scale path."""
    assert python_eval_count(q("x25_knn_hyperplane_lsh")) == 0


def test_q7_dims_broadcast_and_inequality_is_filter(q):
    """q7: both nation roles broadcast; the cross-nation inequality must be
    a filter, never a nested-loop join condition."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    df = q("q7_nation_volume_flow")
    assert broadcast_join_count(df) >= 2
    assert "BroadcastNestedLoopJoin" not in formatted_plan(df)


def test_x05_bucketed_no_cartesian(q):
    """x05 (registered embedding dedup) must group on the SRP band key —
    zero CartesianProduct / BroadcastNestedLoopJoin nodes anywhere (the
    all-pairs form is quarantined in tier-1 x05b). The ONLY Python node
    allowed is the single Arrow-batched per-cell BLAS kernel
    (FlatMapGroupsInPandas); row-at-a-time BatchEvalPython stays banned."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    df = q("x05_dedup_embedding_cosine")
    text = formatted_plan(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
    assert "BatchEvalPython" not in text
    assert "MapInPandas" not in text
    assert "ArrowEvalPython" not in text
    assert "FlatMapGroupsInPandas" in text


def test_p2_percentile_is_partial_agg_not_holistic(q):
    """p2 (registered percentile tier): every fact-sized stage must be a
    hash aggregate with map-side partial combine — the holistic `percentile`
    function (which routes the whole fact table to 3 reducers) must not
    appear in the plan."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    text = formatted_plan(q("p2_percentile_disc_distributed"))
    assert "percentile" not in text
    assert text.count("HashAggregate") >= 2  # partial + final count agg
    assert python_eval_count(q("p2_percentile_disc_distributed")) == 0


def test_q22_anti_join_no_correlated_subquery(q):
    """q22: the NOT EXISTS plans as one anti-join; the scalar avg is a
    broadcast, and the date filter reaches the orders scan."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    text = formatted_plan(q("q22_idle_high_balance"))
    assert "LeftAnti" in text
    assert pushed_filters(q("q22_idle_high_balance"))


def test_reshaped_tpch_shapes_broadcast_dims_no_cartesian(q):
    """r4 TPC-H completions: dims broadcast, never a row-expansion join,
    hot path JVM-only."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    for name in (
        "q2_min_cost_supplier",
        "q9_product_type_profit",
        "q16_supplier_count_by_part",
        "q20_excess_share_suppliers",
    ):
        df = q(name)
        text = formatted_plan(df)
        assert python_eval_count(df) == 0, f"{name} fell off the JVM path"
        assert "CartesianProduct" not in text and "BroadcastNestedLoopJoin" not in text
        assert broadcast_join_count(df) >= 1, f"{name} broadcasts no dim"


def test_pipeline_ops_stay_rowlocal_or_broadcast(q):
    """x35/x36/x37 are row-local (at most the packing window's shuffle);
    x40's only join is the broadcast benchmark set."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    for name in ("x35_pii_scrub", "x37_mix_resample"):
        df = q(name)
        assert python_eval_count(df) == 0
        assert broadcast_join_count(df) == 0  # no joins at all
    pack = q("x36_sequence_pack")
    assert python_eval_count(pack) == 0
    assert formatted_plan(pack).count("Window") >= 1
    decon = q("x40_decontaminate")
    text = formatted_plan(decon)
    assert python_eval_count(decon) == 0
    assert "CartesianProduct" not in text and "BroadcastNestedLoopJoin" not in text
    assert broadcast_join_count(decon) >= 1  # benchmark shingle set broadcasts


def test_semdedup_no_cartesian_one_arrow_kernel_pair(q):
    """x51: the O(n²) compare volume must be confined to within-cell gram
    kernels — no CartesianProduct / BroadcastNestedLoopJoin anywhere, no
    row-at-a-time Python; exactly the two Arrow kernels (centroid-assign
    MapInPandas + per-cell FlatMapGroupsInPandas) may appear."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    df = q("x51_semdedup")
    text = formatted_plan(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
    assert "BatchEvalPython" not in text
    assert "MapInPandas" in text
    assert "FlatMapGroupsInPandas" in text


def test_unigram_and_bm25_stay_jvm_with_broadcast_scalars(q):
    """x52/x53: corpus-sized stages are JVM hash aggregates; the corpus
    total / (N, avgdl) scalars and the per-term df ride as broadcasts, and
    the term dictionary is never assumed broadcastable (the tf join keys
    by term through a shuffle)."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    for name in ("x52_unigram_logprob", "x53_bm25_topk"):
        df = q(name)
        assert python_eval_count(df) == 0, f"{name} fell off the JVM path"
        text = formatted_plan(df)
        assert "CartesianProduct" not in text
        assert broadcast_join_count(df) >= 1, f"{name} broadcasts no scalar"
    assert "TakeOrderedAndProject" in formatted_plan(q("x53_bm25_topk"))


def test_pq_encode_is_single_arrow_pass_no_shuffle(q):
    """x54: PQ encoding is ONE Arrow-batched kernel over the corpus with
    the codebook broadcast — no join, no aggregate, no shuffle beyond the
    parallelism floor, and never a row-at-a-time Python operator."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    text = formatted_plan(q("x54_pq_encode"))
    # one kernel node (formatted plans print each node twice: tree + detail)
    assert 1 <= text.count("MapInPandas") <= 2
    assert "BatchEvalPython" not in text
    assert "Join" not in text
    assert "HashAggregate" not in text


def test_ivfpq_no_cartesian_partial_topk_shape(q):
    """x55: the only nested-loop is the centroid-sized query×cell scoring;
    candidate scoring must be the Arrow ADC kernel (which emits per-batch
    partial top-k), with the final rank a window over k·batches rows.
    CartesianProduct over corpus-sized inputs stays banned."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    df = q("x55_knn_ivfpq")
    text = formatted_plan(df)
    assert "BatchEvalPython" not in text
    # probe selection may nested-loop queries × 80 centroids (bounded);
    # corpus-side candidate generation must be a hash join on cell
    assert text.count("MapInPandas") >= 2  # ivf_assign + encode + adc
    assert "RunningWindowFunction" in text or "Window" in text


def test_substring_spans_jvm_only_two_shuffles(q):
    """x56: window hashing is in-row behind barriers; the only shuffles
    are the corpus-wide hash-count window and the per-doc islands window.
    No Python anywhere; no join at all."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    df = q("x56_substring_dedup_spans")
    text = formatted_plan(df)
    assert python_eval_count(df) == 0
    assert "Join" not in text
    assert "CartesianProduct" not in text


def test_c1_pipeline_reuses_persisted_stages(q):
    """c1: the composed pipeline must read its shared stages from the
    cache (InMemoryTableScan for k2 / survivors / shingles), keep the
    benchmark shingle set broadcast, and never nested-loop."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    df = q("c1_curation_pipeline")
    text = formatted_plan(df)
    assert "InMemoryTableScan" in text or "InMemoryRelation" in text
    assert "CartesianProduct" not in text
    assert "BatchEvalPython" not in text

    from mariadb_postgres_migration_spark.operators.dedup import (
        release_cached_intermediates,
    )

    release_cached_intermediates()


def test_exchange_counts_pin_single_shuffle_analytics(q):
    """The shuffle-count contract the inspect docstring promises: SCD2 and
    the rolling anomaly are one-user-keyed-exchange algorithms; extra
    exchanges = a plan regression."""
    from mariadb_postgres_migration_spark.plans.inspect import exchange_count

    assert exchange_count(q("x62_scd2_intervals")) == 1
    assert exchange_count(q("x75_rolling_anomaly")) == 1


def test_read_schema_parser_survives_nested_types(q):
    """The multimodal pruning assertions depend on columns AFTER a nested
    struct being visible — a first-'>'-terminated regex dropped them and
    false-passed the payload-pruning test (review r5)."""
    cols = read_schema_columns(q("x13_multimodal_meta"))
    assert cols  # parses at all
    df = q("x14_multimodal_decode")
    cols14 = read_schema_columns(df)
    # meta is struct<...>; payload (sorts after it) must still be seen
    assert any(c == "payload" or c == "doc_id" for c in cols14)


def test_pushed_filter_predicates_stay_whole(q):
    """Binary pushed filters must not fragment at their internal comma."""
    preds = pushed_filters(q("op10_equality_filter"))
    assert preds
    for p in preds:
        assert p.count("(") == p.count(")"), p  # balanced → whole predicate


def test_python_eval_counts_cogrouped_kernels(spark, sf_dir):
    """FlatMapCoGroupsInPandas is a Python surface and must count (the
    blocked kNN tier uses cogroup().applyInPandas — review r5)."""
    from mariadb_postgres_migration_spark.operators.similarity import knn_bruteforce
    from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    blocked = knn_bruteforce(emb, emb, k=2, max_broadcast_probes=3)
    assert python_eval_count(blocked) >= 1


def test_python_eval_count_stable_across_cache_materialization(spark):
    """A MATERIALIZED cached relation prints its AdaptiveSparkPlan twice
    (== Final Plan == and == Initial Plan == branches), so a kernel above
    a persisted frame used to count once per print — making every exact
    plan pin depend on whether some earlier consumer had already run the
    cache (r12: test_x175_video_two_kernels failed only in full-suite
    order). The counter must exclude the Initial-Plan duplicate."""
    import pandas as pd
    import pyspark.sql.functions as F

    def ident(it):
        yield from it

    base = (
        spark.range(100)
        .withColumn("k", F.col("id") % 7)
        .groupBy("k")
        .count()
        .mapInPandas(ident, "k long, count long")
        .persist()
    )
    try:
        consumer = base.mapInPandas(ident, "k long, count long")
        before = python_eval_count(consumer)
        consumer.write.format("noop").mode("overwrite").save()
        after = python_eval_count(
            base.mapInPandas(ident, "k long, count long")
        )
        assert before == after == 2
    finally:
        base.unpersist()


def test_inspect_counters_see_known_nodes(spark, sf_dir):
    """Anti-vacuous-zero self-test: each inspect counter must return >0 on
    a plan KNOWN to contain its node. The trap bit twice — r5's
    read_schema_columns bracket bug, then exchange_count at r5 HEAD
    (formatted mode never prints 'Exchange hashpartitioning' on one line)
    — so every counter gets a positive control here."""
    import pyspark.sql.functions as F

    from mariadb_postgres_migration_spark.plans.inspect import exchange_count
    from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table

    base = spark.range(1000).withColumn("k", F.col("id") % 7)
    assert exchange_count(base.groupBy("k").count()) == 1  # hashpartitioning
    assert exchange_count(base.agg(F.sum("id"))) == 1  # SinglePartition
    assert exchange_count(base.orderBy("k")) == 1  # rangepartitioning
    assert exchange_count(spark.range(10)) == 0  # negative control

    dim = spark.range(7).withColumnRenamed("id", "k")
    joined = base.join(F.broadcast(dim), "k")
    assert broadcast_join_count(joined) == 1
    assert exchange_count(joined) == 0  # broadcast is NOT a shuffle

    nat = read_parquet_table(spark, sf_dir, "nation")
    scan = nat.filter(F.col("n_regionkey") == 1).select("n_name")
    assert pushed_filters(scan)
    assert "n_name" in read_schema_columns(scan)


def test_c4_repair_plan_contract(q):
    """c4: checksum→diff→apply→re-verify must stay JVM-only, cartesian-free,
    and keep the dirty-bucket restriction as broadcast semi-joins."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    df = q("c4_migration_repair")
    text = formatted_plan(df)
    assert python_eval_count(df) == 0
    assert "CartesianProduct" not in text
    assert broadcast_join_count(df) >= 1  # bucket_filter semi-joins broadcast

    from mariadb_postgres_migration_spark.operators.dedup import (
        release_cached_intermediates,
    )

    release_cached_intermediates()


def test_bpe_queries_stay_jvm_side(q):
    """x80/x81: the merge folds are aggregate HOFs — zero Python operators;
    the only driver interaction is the per-round 1-row argmax collect."""
    for name in ("x80_bpe_train_merges", "x81_bpe_encode_topk"):
        df = q(name)
        assert python_eval_count(df) == 0, f"{name} fell off the JVM path"

    from mariadb_postgres_migration_spark.operators.dedup import (
        release_cached_intermediates,
    )

    release_cached_intermediates()


def test_x83_incremental_neardup_plan_contract(q):
    """x83: candidates must come from the band-key equi-join (never a
    batch x corpus product) and the whole path stays JVM-side."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    df = q("x83_incremental_neardup")
    text = formatted_plan(df)
    assert "CartesianProduct" not in text
    assert python_eval_count(df) == 0

    from mariadb_postgres_migration_spark.operators.dedup import (
        release_cached_intermediates,
    )

    release_cached_intermediates()


def test_r6b_order_stats_plan_contracts(q):
    """x92-x97: the order-statistics / graph / LM wave stays JVM-only and
    cartesian-free; x93's per-group top-k must ride WindowGroupLimit
    (partial top-k below the exchange) and x96's frontier join back to
    the fact table must broadcast."""
    from mariadb_postgres_migration_spark.plans.inspect import (
        formatted_plan,
        simple_plan,
    )

    for name in (
        "x92_exact_quantiles",
        "x93_weighted_sample",
        "x94_bfs_hops",
        "x95_bigram_logprob",
        "x96_skyline_pareto",
        "x97_char_entropy",
        "x99_kmv_set_relations",
        "x100_kcore_peel",
        "x102_equidepth_histogram",
        "x103_ols_trend",
        "x104_editdist1_join",
        "x105_random_walks",
        "x106_table_profile",
        "x107_cohort_retention",
        "x108_bitmap_set_relations",
        "x109_markov_transitions",
        "x110_cheapest_paths",
        "x111_percentile_rank",
        "x112_decayed_value",
        "x113_mad_robust",
        "x114_frequent_trigrams",
        "c6_funnel_latency",
    ):
        df = q(name)
        assert python_eval_count(df) == 0, f"{name} fell off the JVM path"
        assert "CartesianProduct" not in formatted_plan(df), name

    assert "WindowGroupLimit" in simple_plan(q("x93_weighted_sample"))
    assert "WindowGroupLimit" in simple_plan(q("x99_kmv_set_relations"))
    assert broadcast_join_count(q("x96_skyline_pareto")) >= 1

    from mariadb_postgres_migration_spark.operators.dedup import (
        release_cached_intermediates,
    )

    release_cached_intermediates()


def test_x98_zlib_is_single_arrow_pass(q):
    """x98: exactly ONE Arrow-batched Python operator (mapInPandas), a
    two-column read, and no shuffle at all — the plan is scan → Arrow
    map → project."""
    from mariadb_postgres_migration_spark.plans.inspect import (
        exchange_count,
        read_schema_columns,
    )

    df = q("x98_zlib_ratio")
    assert python_eval_count(df) == 1
    assert exchange_count(df) == 0
    assert read_schema_columns(df) == {"doc_id", "text"}


def test_x120_broadcast_builds_are_bounded(q):
    """x120 (r7 defect): the PMI count-lookup joins must broadcast the
    k-row top-k side, NEVER the vocabulary-sized unigram count tables.
    Every BroadcastExchange build subtree must carry a boundedness
    witness: a TakeOrderedAndProject/Limit (the top-k, or a join whose
    build side is the top-k) or keys=[] (the 1-row n1/n12 scalar
    totals). The pre-fix plan broadcast c1/c2 — a HashAggregate over
    every distinct token, which OOMs at a 100 TB vocabulary — and fails
    this exact assertion."""
    from mariadb_postgres_migration_spark.plans import broadcast_build_subtrees

    subs = broadcast_build_subtrees(q("x120_pmi_collocations"))
    assert len(subs) >= 3, "x120 lost its broadcast joins"
    for sub in subs:
        bounded = (
            "TakeOrderedAndProject" in sub
            or "Limit" in sub
            or "keys=[]" in sub
        )
        assert bounded, f"unbounded broadcast build side:\n{sub}"


def test_r8_ops_plan_contracts(q):
    """r8 wave (x124-x133): every operator stays JVM-side (zero Python
    nodes) and never plans an unbounded row-expansion join. The three
    day-series/grid operators legitimately use nested-loop joins — an
    inequality pair join (Mann-Kendall/Theil-Sen) or the sources x
    distinct-values evaluation grid (KS) — but ONLY over frames bounded
    by the calendar or by data variety, never by corpus row count; the
    others must have none at all."""
    import re

    no_bnlj = [
        "x124_cusum_changepoint", "x125_label_propagation",
        "x126_spearman_daily", "x131_gini_concentration",
        "x132_vocab_richness", "x134_cluster_size_histogram",
        "x135_interarrival_burstiness", "x136_zipf_profile",
        "x138_split_manifest", "x139_rendezvous_shards",
    ]
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    bounded_bnlj = ["x127_ks_source_drift", "x129_mann_kendall", "x130_theil_sen"]
    for name in no_bnlj + bounded_bnlj:
        df = q(name)
        assert python_eval_count(df) == 0, f"{name} fell off the JVM path"
        text = formatted_plan(df)
        assert "CartesianProduct" not in text, name
        n_bnlj = len(re.findall(
            r"^\(\d+\) BroadcastNestedLoopJoin\b", text, re.MULTILINE
        ))
        if name in no_bnlj:
            assert n_bnlj == 0, f"{name}: unexpected nested-loop join"
        else:
            # pair joins / grid / 1-row scalar attaches — bounded frames only
            assert 1 <= n_bnlj <= 6, f"{name}: {n_bnlj} nested-loop joins"

    from mariadb_postgres_migration_spark.operators.dedup import (
        release_cached_intermediates,
    )

    release_cached_intermediates()


def test_x131_gini_single_group_exchange(q):
    """x131: the rank window and the final aggregate share the nation
    exchange — the whole Gini after the spend pre-aggregation must add
    at most two more shuffles (fact groupBy + nation re-key), never a
    global sort."""
    from mariadb_postgres_migration_spark.plans.inspect import (
        exchange_count,
        formatted_plan,
    )

    df = q("x131_gini_concentration")
    assert exchange_count(df) <= 3
    assert "Sort [" not in formatted_plan(df).split("Exchange")[0]


def test_r9_rows_stay_jvm_and_bounded(q):
    """r9 wave pins: every new row is JVM-only (the x142 recall row may
    carry exactly the registered ANN kernels' Arrow nodes, nothing
    more); no CartesianProduct anywhere; nested-loop joins only where a
    bounded frame justifies them (x142/s4: the <=80-centroid attach;
    x144/x145: the <=3-row split-pair inequality join)."""
    import re

    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    no_python = [
        "c7_pretraining_pipeline", "x143_pack_utilization",
        "x144_split_leakage", "x146_shingle_novelty",
        "x147_seqlen_histogram", "x149_runs_test", "x150_ordinal_patterns",
        "x151_r9d_ops_suite", "x152_curation_funnel",
    ]
    for name in no_python:
        df = q(name)
        assert python_eval_count(df) == 0, f"{name} fell off the JVM path"
        text = formatted_plan(df)
        assert "CartesianProduct" not in text, name
        n_bnlj = len(re.findall(
            r"^\(\d+\) BroadcastNestedLoopJoin\b", text, re.MULTILINE
        ))
        if name in ("x144_split_leakage",):
            assert n_bnlj <= 2, f"{name}: {n_bnlj} nested-loop joins"
        else:
            assert n_bnlj == 0, f"{name}: unexpected nested-loop join"
    # x142: the brute-force BLAS kernel (MapInPandas) is the sanctioned
    # Arrow tier; the candidate generation stays JVM (no row Python)
    df = q("x142_ann_recall")
    text = formatted_plan(df)
    assert "BatchEvalPython" not in text
    assert "CartesianProduct" not in text
    # c7's packing is windowed per composite shard — the window must be
    # present and partitioned, never a global sort
    c7 = formatted_plan(q("c7_pretraining_pipeline"))
    assert c7.count("Window") >= 1

    from mariadb_postgres_migration_spark.operators.dedup import (
        release_cached_intermediates,
    )

    release_cached_intermediates()
