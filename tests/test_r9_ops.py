"""Round-9 operator tests: x142 measured ANN recall (independent
recomputation + the superset-dominance property) and the c7 pretraining
endgame pipeline (stage plumbing recomputed in pure Python)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.registry import REGISTRY, load_all_query_modules

load_all_query_modules()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def _run(name):
        return REGISTRY[name].fn(spark, sf_dir)

    return _run


# ---------------------------------------------------------------------------
# x142 — ANN recall@5
# ---------------------------------------------------------------------------


def _topk_pairs(df):
    return {(r["q_id"], r["n_id"]) for r in df.select("q_id", "n_id").collect()}


def test_x142_hits_equal_independent_intersection(spark, sf_dir, q):
    """The hit counts must equal a driver-side set intersection of the
    SAME tier outputs the registered ANN rows produce — recomputing the
    join/count logic independently of the Spark aggregation."""
    from mariadb_postgres_migration_spark.operators import similarity as S
    from mariadb_postgres_migration_spark.r9_queries import _x142_panel
    from mariadb_postgres_migration_spark.registry import _t

    emb = _t(spark, sf_dir, "embeddings")
    panel = _x142_panel(emb)
    cb16 = emb.filter(F.col("vec_id") < 16)
    brute = _topk_pairs(S.knn_bruteforce(emb, panel, k=5))
    tiers = {
        "ivf": _topk_pairs(
            S.knn_ivf(emb, panel, emb.filter(F.col("vec_id") < 80), k=5, nprobe=2)
        ),
        "lsh": _topk_pairs(S.knn_hyperplane_lsh(emb, panel, k=5)),
        "mplsh": _topk_pairs(
            S.knn_hyperplane_multiprobe(emb, panel, k=5, n_flips=2)
        ),
        # r10: the PQ family joins the measured-recall row (VERDICT r9 #2)
        "pq": _topk_pairs(S.knn_pq_adc(emb, panel, cb16, k=5)),
        "ivfpq": _topk_pairs(
            S.knn_ivfpq(
                emb, panel, emb.filter(F.col("vec_id") < 80), cb16, k=5, nprobe=2
            )
        ),
    }
    probes = {qid for qid, _ in brute}
    expected = {
        (t, qid): sum(1 for p in brute & pairs if p[0] == qid)
        for t, pairs in tiers.items()
        for qid in probes
    }
    got = {
        (r["tier"], r["q_id"]): r["hits"]
        for r in q("x142_ann_recall").collect()
    }
    assert got == expected
    assert all(0 <= h <= 5 for h in got.values())


def test_x142_multiprobe_dominates_single_bucket(q):
    """Multi-probe LSH searches a candidate SUPERSET of single-bucket LSH,
    so per probe its exact-score top-5 can only swap a true-top-5 item for
    another true-top-5 item — hits(mplsh) >= hits(lsh) pointwise."""
    rows = q("x142_ann_recall").collect()
    by = {(r["tier"], r["q_id"]): r["hits"] for r in rows}
    lsh_probes = [qid for (t, qid) in by if t == "lsh"]
    assert lsh_probes
    for qid in lsh_probes:
        assert by[("mplsh", qid)] >= by[("lsh", qid)], qid


# ---------------------------------------------------------------------------
# c7 — pretraining endgame pipeline
# ---------------------------------------------------------------------------


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _py_split(doc_id: int) -> str:
    from mariadb_postgres_migration_spark.operators.textanalysis import (
        SPLIT_PERMILLE,
    )

    frac = int(_md5(f"{doc_id}:split")[:8], 16) % 1000
    for name, bound in SPLIT_PERMILLE:
        if frac < bound:
            return name
    return "test"


def _py_shard(doc_id: int, n_shards: int = 16) -> int:
    return max(range(n_shards), key=lambda s: (_md5(f"{doc_id}#{s}"), s))


def test_c7_survivors_are_exactly_c1(q):
    """Stage 1 plumbing: c7 emits one row per c1 survivor — no doc lost
    or invented between curation and the layout stages."""
    c1_ids = {r["doc_id"] for r in q("c1_curation_pipeline").collect()}
    c7 = q("c7_pretraining_pipeline").collect()
    assert {r["doc_id"] for r in c7} == c1_ids
    assert len(c7) == len(c1_ids)


def test_c7_split_shard_and_packing_match_python(q):
    """Stages 2-4 plumbing: split and shard per doc match the pure-Python
    hash rules, and the pack spans equal a Python running-sum replay per
    (split, shard) in doc_id order."""
    rows = sorted(
        q("c7_pretraining_pipeline").collect(), key=lambda r: r["doc_id"]
    )
    assert rows
    groups: dict[tuple[str, int], list] = {}
    for r in rows:
        assert r["split"] == _py_split(r["doc_id"])
        assert r["shard"] == _py_shard(r["doc_id"])
        groups.setdefault((r["split"], r["shard"]), []).append(r)
    from mariadb_postgres_migration_spark.operators.textanalysis import (
        PACK_CAPACITY,
    )

    for members in groups.values():
        cum = 0
        for r in members:  # already doc_id-sorted
            cum += r["n_tok"]
            start = (cum - r["n_tok"]) // PACK_CAPACITY
            end = max(start, (cum - 1) // PACK_CAPACITY)
            assert (r["start_pack"], r["end_pack"]) == (start, end), r


def test_x143_pack_utilization_matches_python_replay(q):
    """x143's per-(split, shard) stats must equal a pure-Python replay
    over c7's manifest: counts, token sums, dense pack count, integer
    per-mille fill, straddler count."""
    from mariadb_postgres_migration_spark.operators.textanalysis import (
        PACK_CAPACITY,
    )

    manifest = q("c7_pretraining_pipeline").collect()
    exp: dict[tuple[str, int], list[int]] = {}
    for r in manifest:
        g = exp.setdefault((r["split"], r["shard"]), [0, 0, 0, 0])
        g[0] += 1
        g[1] += r["n_tok"]
        g[2] = max(g[2], r["end_pack"] + 1)
        g[3] += int(r["end_pack"] > r["start_pack"])
    got = {
        (r["split"], r["shard"]): [
            r["n_docs"], r["total_tok"], r["n_packs"], r["n_straddlers"],
        ]
        for r in q("x143_pack_utilization").collect()
    }
    assert got == exp
    for r in q("x143_pack_utilization").collect():
        assert r["fill_permille"] == (
            1000 * r["total_tok"] // (r["n_packs"] * PACK_CAPACITY)
        )
        assert 0 <= r["fill_permille"] <= 1000


def test_x144_exact_dup_leakage_is_zero_and_counts_match_sets(q):
    """The dedup-then-split invariant: zero cross-split md5(text) dups;
    and the shingle-overlap counts must equal Python set intersections
    over the per-split shingle sets."""
    from mariadb_postgres_migration_spark.operators import dedup as D
    from mariadb_postgres_migration_spark.operators.textanalysis import (
        split_assign,
    )

    rows = q("x144_split_leakage").collect()
    assert rows
    assert all(r["n_dup_fp"] == 0 for r in rows)

    # independent replay: per-split shingle sets from the same survivors
    import pyspark.sql.functions as FF

    spark_df = q("c1_curation_pipeline").select("doc_id")
    # reconstruct survivors identically to the query
    from mariadb_postgres_migration_spark.registry import _t

    spark = spark_df.sparkSession
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = _t(spark, sf_dir, "documents")
    surv = docs.join(spark_df, "doc_id", "left_semi").select("doc_id", "text")
    sh = D.doc_shingles(surv).join(
        split_assign(surv).select("doc_id", "split"), "doc_id"
    )
    by_split: dict[str, set] = {}
    for r in sh.select("split", "sh").distinct().collect():
        by_split.setdefault(r["split"], set()).add(r["sh"])
    for r in rows:
        a, b = by_split.get(r["split_a"], set()), by_split.get(r["split_b"], set())
        assert r["n_shared_sh"] == len(a & b)
        assert (r["n_sh_a"], r["n_sh_b"]) == (len(a), len(b))
        mn = min(len(a), len(b))
        assert r["containment_permille"] == (
            0 if mn == 0 else 1000 * len(a & b) // mn
        )


def test_x146_novelty_matches_python_replay(spark, sf_dir, q):
    """x146 must equal a pure-Python first-seen replay over the same
    distinct shingle rows."""
    from mariadb_postgres_migration_spark.operators import dedup as D
    from mariadb_postgres_migration_spark.registry import _t

    sh_rows = [
        (r["doc_id"], r["sh"])
        for r in D.doc_shingles(_t(spark, sf_dir, "documents")).collect()
    ]
    first: dict[str, int] = {}
    for d, s in sorted(sh_rows):
        first.setdefault(s, d)
    per: dict[int, list[int]] = {}
    for d, s in sh_rows:
        g = per.setdefault(d, [0, 0])
        g[0] += 1
        g[1] += int(first[s] == d)
    exp = {
        d: (n_sh, n_novel, 1000 * n_novel // n_sh)
        for d, (n_sh, n_novel) in per.items()
    }
    got = {
        r["doc_id"]: (r["n_sh"], r["n_novel"], r["novelty_permille"])
        for r in q("x146_shingle_novelty").collect()
    }
    assert got == exp
    # at least one fully-novel doc exists in any corpus (the first doc
    # with shingles), and no doc exceeds 1000
    assert any(v[2] == 1000 for v in got.values())
    assert all(0 <= v[2] <= 1000 for v in got.values())


def test_x147_buckets_match_token_counts(spark, sf_dir, q):
    """x147's buckets must equal length(bin(n_tokens)) over the pinned
    x08 token counts, and its totals must cover every document."""
    from mariadb_postgres_migration_spark.registry import _t

    toks = {r["doc_id"]: r["n_tokens"] for r in q("x08_token_stats").collect()}
    srcs = {
        r["doc_id"]: r["source"]
        for r in _t(spark, sf_dir, "documents").select("doc_id", "source").collect()
    }
    exp: dict[tuple[str, int], list[int]] = {}
    for d, n in toks.items():
        b = len(bin(n)) - 2 if n > 0 else 1  # bin() of python has '0b'
        g = exp.setdefault((srcs[d], b), [0, 0])
        g[0] += 1
        g[1] += n
    got = {
        (r["source"], r["len_bucket"]): [r["n_docs"], r["total_tok"]]
        for r in q("x147_seqlen_histogram").collect()
    }
    assert got == exp
    assert sum(v[0] for v in got.values()) == len(toks)


def _daily_counts_py(spark, sf_dir):
    from mariadb_postgres_migration_spark.registry import _t
    from pyspark.sql import functions as FF

    rows = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            FF.expr("unix_micros(CAST(ts AS timestamp)) div 86400000000").alias("day"),
        )
        .collect()
    )
    daily: dict[str, dict[int, int]] = {}
    for r in rows:
        if r["day"] is None:
            continue
        d = daily.setdefault(r["event_type"], {})
        d[r["day"]] = d.get(r["day"], 0) + 1
    return daily


def test_x149_runs_match_python_replay(spark, sf_dir, q):
    """x149 must equal a pure-Python 2x-median split + run count, with
    hand-built clumped/alternating fixtures covering both tails below."""
    daily = _daily_counts_py(spark, sf_dir)
    exp = {}
    for et, d in daily.items():
        vs = [v for _, v in sorted(d.items())]
        sv = sorted(vs)
        n = len(sv)
        m2 = sv[(n + 1) // 2 - 1] + sv[(n + 2) // 2 - 1]
        signs = [1 if 2 * v > m2 else -1 for v in vs if 2 * v != m2]
        n1 = sum(1 for s in signs if s > 0)
        n2 = len(signs) - n1
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        exp[et] = (n1, n2, runs)
    got = {
        r["event_type"]: (r["n1"], r["n2"], r["runs"])
        for r in q("x149_runs_test").collect()
    }
    assert got == exp


def test_runs_test_fixture_tails(spark):
    """Clumped (+,+,+,-,-,-) → 2 runs, z < 0; alternating → max runs,
    z > 0; both engines share the zero-variance/empty-side guards."""
    import datetime as dt

    from mariadb_postgres_migration_spark.operators.audit import runs_test_daily

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 'clump': 4 high days then 4 low days (counts 3,3,3,3,1,1,1,1)
    for i in range(8):
        for _ in range(3 if i < 4 else 1):
            rows.append((eid, "clump", t0 + dt.timedelta(days=i)))
            eid += 1
    # 'alt': alternating 3,1,3,1,3,1,3,1
    for i in range(8):
        for _ in range(3 if i % 2 == 0 else 1):
            rows.append((eid, "alt", t0 + dt.timedelta(days=i)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    got = {r["event_type"]: r for r in runs_test_daily(df).collect()}
    assert (got["clump"]["n1"], got["clump"]["n2"], got["clump"]["runs"]) == (4, 4, 2)
    assert got["clump"]["z"] < 0
    assert (got["alt"]["n1"], got["alt"]["n2"], got["alt"]["runs"]) == (4, 4, 8)
    assert got["alt"]["z"] > 0


def test_x150_patterns_match_python_replay(spark, sf_dir, q):
    """x150 must equal a pure-Python ordinal coding of consecutive
    observed-day triples, and only the 6 valid permutation codes may
    appear."""
    daily = _daily_counts_py(spark, sf_dir)
    exp: dict[tuple[str, int], int] = {}
    for et, d in daily.items():
        vs = [v for _, v in sorted(d.items())]
        for v1, v2, v3 in zip(vs, vs[1:], vs[2:]):
            r1 = (v2 < v1) + (v3 < v1)
            r2 = (v1 <= v2) + (v3 < v2)
            r3 = (v1 <= v3) + (v2 <= v3)
            code = r1 * 100 + r2 * 10 + r3
            exp[(et, code)] = exp.get((et, code), 0) + 1
    got = {
        (r["event_type"], r["pattern"]): r["n_windows"]
        for r in q("x150_ordinal_patterns").collect()
    }
    assert got == exp
    valid = {12, 21, 102, 120, 201, 210}
    assert {p for _, p in got} <= valid


def test_x152_funnel_monotone_and_anchored_to_c1(spark, sf_dir, q):
    """The funnel must be monotone per source (each stage keeps a subset
    of the previous), its 'raw' row must equal the corpus count, and its
    'clean' row must equal the c1 manifest's per-source counts — the two
    driver rows describing the same chain must agree with each other."""
    from mariadb_postgres_migration_spark.registry import _t

    rows = q("x152_curation_funnel").collect()
    by: dict[str, dict[str, int]] = {}
    for r in rows:
        by.setdefault(r["source"], {})[r["stage"]] = r["n_docs"]
    assert by
    order = ["raw", "gated", "exact", "near", "clean"]
    for src, d in by.items():
        seq = [d.get(s, 0) for s in order]
        assert seq == sorted(seq, reverse=True), (src, seq)
        assert d["raw"] > 0

    docs = _t(spark, sf_dir, "documents")
    corpus = {
        r["source"]: r["n"]
        for r in docs.filter("doc_id % 97 <> 0")
        .groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert {s: d["raw"] for s, d in by.items()} == corpus

    c1 = q("c1_curation_pipeline").select("doc_id")
    clean = {
        r["source"]: r["n"]
        for r in docs.join(c1, "doc_id", "left_semi")
        .groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    got_clean = {s: d["clean"] for s, d in by.items() if d.get("clean")}
    assert got_clean == clean


def test_sequence_pack_composite_key_matches_single_key(spark):
    """shard_cols=[one column] must reproduce the classic shard_col path
    (modulo the column name), pinning the r9 generalization as a pure
    extension."""
    from mariadb_postgres_migration_spark.operators.textanalysis import (
        sequence_pack,
    )

    df = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "a", "p q"), (3, "b", "only")],
        "doc_id long, source string, text string",
    )
    classic = {
        (r["doc_id"], r["shard"], r["n_tok"], r["start_pack"], r["end_pack"])
        for r in sequence_pack(df).collect()
    }
    general = {
        (r["doc_id"], r["source"], r["n_tok"], r["start_pack"], r["end_pack"])
        for r in sequence_pack(df, shard_cols=["source"]).collect()
    }
    assert classic == general
