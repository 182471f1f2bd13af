"""Round-6 sketch/mining operators — KMV distinct sketch (x87),
prefix-filtered exact near-dup join (x88), count-min sketch (x89),
association lift (x90): correctness vs brute-force/python
reimplementations, estimator properties, seeded random-corpus
exactness, and the partial-top-k / broadcast / no-cartesian plan
shapes."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators.dedup import (
    prefix_filter_jaccard_pairs,
)
from mariadb_postgres_migration_spark.operators.sketches import (
    HASH_SPACE,
    kmv_distinct,
    kmv_set_relations,
)
from mariadb_postgres_migration_spark.plans.inspect import formatted_plan
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table


def _py_kmv(keys, k):
    """Reference KMV: k smallest 32-bit md5 prefixes of the key strings."""
    hs = sorted({int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) for x in keys})
    top = hs[:k]
    if len(top) < k:
        return len(top), (max(top) if top else 0), len(top)
    return k, top[-1], (k - 1) * HASH_SPACE // max(top[-1], 1)


def test_kmv_matches_python_reference(spark):
    rows = [("a", i % 97) for i in range(500)] + [("b", i % 13) for i in range(60)]
    df = spark.createDataFrame(rows, "g string, key long")
    got = {
        r["g"]: (r["k_used"], r["kth_hash"], r["est_distinct"], r["exact_distinct"])
        for r in kmv_distinct(df, ["g"], "key", k=32).collect()
    }
    for g, keys in [("a", range(97)), ("b", range(13))]:
        k_used, kth, est = _py_kmv(keys, 32)
        assert got[g] == (k_used, kth, est, len(set(keys)))


def test_kmv_small_group_is_exact(spark):
    df = spark.createDataFrame([("x", i) for i in range(5)], "g string, key long")
    row = kmv_distinct(df, ["g"], "key", k=64).collect()[0]
    assert row["k_used"] == 5
    assert row["est_distinct"] == 5 == row["exact_distinct"]


def test_kmv_estimate_accuracy(spark, sf_dir):
    li = read_parquet_table(spark, sf_dir, "lineitem")
    out = kmv_distinct(li, ["l_returnflag"], "l_partkey", k=64).collect()
    assert out
    for r in out:
        if r["k_used"] < 64:
            assert r["est_distinct"] == r["exact_distinct"]
        else:
            # KMV standard error is ~1/sqrt(k-2) ≈ 13% at k=64; allow 4σ
            assert r["est_distinct"] == pytest.approx(
                r["exact_distinct"], rel=0.52
            )


def test_kmv_plan_pushes_partial_topk(spark):
    """The rank-filter must become a WindowGroupLimit (partial top-k per
    map task BELOW the exchange) — that node IS the mergeable-sketch
    claim; without it every distinct hash shuffles to the window."""
    df = spark.createDataFrame(
        [("g", i) for i in range(100)], "g string, key long"
    )
    plan = formatted_plan(kmv_distinct(df, ["g"], "key", k=8))
    assert "WindowGroupLimit" in plan


def test_kmv_sketch_path_shape(spark, sf_dir):
    """Sketch-branch plan contract: the md5 hash is computed at the scan
    and deduplicated in ONE distinct exchange on (group, hash) — no
    intermediate distinct on the raw key survives optimization — and the
    scan reads only the two needed columns."""
    spark.catalog.clearCache()
    li = read_parquet_table(spark, sf_dir, "lineitem")
    df = kmv_distinct(li, ["l_returnflag"], "l_partkey", k=16)
    df.collect()
    plan = (
        df._jdf.queryExecution().executedPlan().toString().split("Initial Plan")[0]
    )
    # exchanges: sketch distinct (group,h), window (group), exact-side
    # distinct (group,key) + its regroup — anything more means a redundant
    # key-level distinct crept back into the sketch branch
    assert plan.count("Exchange hashpartitioning") <= 4, plan[:2000]
    assert plan.count("WindowGroupLimit") == 2  # Partial + Final
    assert "ReadSchema: struct<l_partkey:bigint,l_returnflag:string>" in plan


def _brute_pairs(spark, docs, threshold=0.5):
    """Exhaustive uncapped Jaccard pairs via the raw shingle self-join."""
    from mariadb_postgres_migration_spark.operators.dedup import doc_shingles

    ds = doc_shingles(docs)
    a = ds.select(F.col("doc_id").alias("doc_a"), "sh")
    b = ds.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n"))
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jac", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")).cast("double"))
        .filter(F.col("jac") >= threshold)
    )
    return {
        (r["doc_a"], r["doc_b"]): (r["i"], r["na"], r["nb"])
        for r in j.collect()
    }


def test_prefix_filter_equals_exhaustive_on_fixture(spark, sf_dir):
    docs = read_parquet_table(spark, sf_dir, "documents")
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["n_a"], r["n_b"])
        for r in prefix_filter_jaccard_pairs(docs).collect()
    }
    assert got == _brute_pairs(spark, docs)
    assert got  # fixture corpus must actually contain near-dup pairs


def test_prefix_filter_exact_under_stop_shingles(spark):
    """Construction that defeats a df-cap: the ONLY shared shingles of the
    near-dup pair are stop-shingles present in every doc. x02's capped
    index drops them (pair lost); the prefix filter must keep the pair —
    stop-shingles rank last but still land in the prefix when the doc is
    short enough, and exactness may never depend on a tuning knob."""
    stop = "alpha beta gamma delta"  # shingles shared by ALL docs
    rows = [(i, f"{stop} filler{i} unique{i} token{i}") for i in range(20)]
    rows += [(100, stop), (101, stop)]  # identical short docs: J = 1.0
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]) for r in prefix_filter_jaccard_pairs(docs).collect()
    }
    assert (100, 101) in got
    assert got == set(_brute_pairs(spark, docs))


def test_prefix_filter_no_cartesian(spark, sf_dir):
    docs = read_parquet_table(spark, sf_dir, "documents")
    plan = formatted_plan(prefix_filter_jaccard_pairs(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _py_cms(tokens, probes):
    """Reference CMS: d×W bucket sums, min over rows per probe."""
    from mariadb_postgres_migration_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
    )

    counters = [{} for _ in range(CMS_DEPTH)]
    for t in tokens:
        for j in range(CMS_DEPTH):
            b = int(hashlib.md5(f"{t}#cms{j}".encode()).hexdigest()[:8], 16) % CMS_WIDTH
            counters[j][b] = counters[j].get(b, 0) + 1
    out = {}
    for p in probes:
        out[p] = min(
            counters[j].get(
                int(hashlib.md5(f"{p}#cms{j}".encode()).hexdigest()[:8], 16)
                % CMS_WIDTH,
                0,
            )
            for j in range(CMS_DEPTH)
        )
    return out


def test_cms_matches_python_reference(spark):
    from mariadb_postgres_migration_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
    )

    tokens = [f"tok{i % 37}" for i in range(400)] + ["rare"]
    tdf = spark.createDataFrame([(t,) for t in tokens], "term string")
    probes = ["tok0", "tok36", "rare", "absent"]
    pdf = spark.createDataFrame([(p,) for p in probes], "term string")
    got = {
        r["term"]: r["est_count"]
        for r in cms_estimate(cms_counters(tdf), pdf).collect()
    }
    assert got == _py_cms(tokens, probes)


def test_cms_never_underestimates_on_fixture(spark, sf_dir):
    import __spark_entry__ as E

    rows = E.queries()["x89_cms_point_frequency"](spark, sf_dir).collect()
    assert len(rows) == 30
    for r in rows:
        assert r["est_count"] >= r["exact_count"], r


def test_cms_counter_join_is_broadcast(spark):
    from mariadb_postgres_migration_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
    )
    from mariadb_postgres_migration_spark.plans.inspect import (
        broadcast_join_count,
    )

    tdf = spark.createDataFrame([(f"t{i}",) for i in range(100)], "term string")
    pdf = spark.createDataFrame([("t1",), ("t2",)], "term string")
    assert broadcast_join_count(cms_estimate(cms_counters(tdf), pdf)) >= 1


def test_association_lift_matches_python_reference(spark):
    from itertools import combinations

    from mariadb_postgres_migration_spark.operators.basket import (
        association_lift,
    )

    baskets = {
        1: ["a", "b", "c"],
        2: ["a", "b"],
        3: ["b", "c"],
        4: ["a", "c", "d"],
        5: ["d"],
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "b long, i string")
    got = {
        (r["item_a"], r["item_b"]): (r["c_ab"], r["c_a"], r["c_b"], r["lift"])
        for r in association_lift(df, "b", "i", top_k=100).collect()
    }
    n = len(baskets)
    counts, pair_counts = {}, {}
    for items in baskets.values():
        for i in set(items):
            counts[i] = counts.get(i, 0) + 1
        for a, b in combinations(sorted(set(items)), 2):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    exp = {
        p: (c, counts[p[0]], counts[p[1]], c * n / (counts[p[0]] * counts[p[1]]))
        for p, c in pair_counts.items()
    }
    assert got == exp


def test_association_lift_topk_is_distributed(spark, sf_dir):
    from mariadb_postgres_migration_spark.operators.basket import (
        association_lift,
    )

    li = read_parquet_table(spark, sf_dir, "lineitem")
    df = association_lift(li, "l_orderkey", "l_partkey", top_k=10)
    plan = formatted_plan(df)
    # the global sort must be a partial per-partition top-k, never a
    # full-shuffle sort of every pair
    assert "TakeOrderedAndProject" in plan
    assert len(df.collect()) == 10


def test_prefix_filter_equals_exhaustive_on_random_corpora(spark):
    """Five seeded random corpora with planted near-dup structure: mixes
    of shared vocabulary (stop-shingles), mutated copies (borderline
    Jaccard on both sides of 0.5), and exact copies. The prefix filter
    must equal the exhaustive join on every one."""
    import random

    for seed in range(5):
        rng = random.Random(seed)
        vocab = [f"w{k}" for k in range(40)]
        rows = []
        base_docs = []
        for i in range(15):
            words = [rng.choice(vocab) for _ in range(rng.randint(3, 25))]
            base_docs.append(words)
            rows.append((i, " ".join(words)))
        # mutated copies: flip a few words of a base doc
        for j in range(8):
            src = base_docs[rng.randrange(len(base_docs))][:]
            for _ in range(rng.randint(0, max(1, len(src) // 3))):
                src[rng.randrange(len(src))] = rng.choice(vocab)
            rows.append((100 + j, " ".join(src)))
        # exact copies
        rows.append((200, rows[0][1]))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_a"], r["doc_b"]): r["inter"]
            for r in prefix_filter_jaccard_pairs(docs).collect()
        }
        exp = {p: v[0] for p, v in _brute_pairs(spark, docs).items()}
        assert got == exp, f"seed {seed}: {got} != {exp}"


def _py_kmv_set_relations(groups, k=64):
    """Reference for kmv_set_relations: per-group sketch = k smallest
    32-bit md5 prefixes; per pair the merged top-k with membership
    flags drives the integer estimator algebra."""
    h = lambda x: int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)
    sk = {g: sorted({h(x) for x in keys})[:k] for g, keys in groups.items()}
    out = {}
    for g1 in sorted(groups):
        for g2 in sorted(groups):
            if not g1 < g2:
                continue
            a, b = set(sk[g1]), set(sk[g2])
            merged = sorted(a | b)[:k]
            k_used = len(merged)
            shared = sum(1 for x in merged if x in a and x in b)
            kth = merged[-1]
            union_est = (
                k_used if k_used < k else (k - 1) * HASH_SPACE // max(kth, 1)
            )
            ea, eb = set(groups[g1]), set(groups[g2])
            out[(g1, g2)] = (
                k_used, shared, union_est,
                (shared * union_est) // k_used,
                (1000 * shared) // k_used,
                len(ea & eb), len(ea | eb),
            )
    return out


def test_kmv_set_relations_matches_python_reference(spark):
    groups = {
        "a": list(range(0, 400)),
        "b": list(range(200, 600)),
        "c": list(range(0, 1000, 3)),
    }
    rows = [(g, x) for g, keys in groups.items() for x in keys]
    df = spark.createDataFrame(rows, "g string, key long")
    got = {
        (r["g1"], r["g2"]): (
            r["k_used"], r["shared_k"], r["union_est"], r["inter_est"],
            r["jaccard_milli"], r["exact_inter"], r["exact_union"],
        )
        for r in kmv_set_relations(df, "g", "key", k=64).collect()
    }
    assert got == _py_kmv_set_relations(groups, k=64)


def test_kmv_set_relations_is_exact_below_k(spark):
    # every group under k distinct keys => the merged sketch IS the full
    # hash union, so (absent 32-bit collisions on 30 keys) the estimates
    # equal the exact values and the Jaccard is the true one in milli
    groups = {"x": list(range(20)), "y": list(range(10, 30))}
    rows = [(g, v) for g, keys in groups.items() for v in keys]
    df = spark.createDataFrame(rows, "g string, key long")
    [r] = kmv_set_relations(df, "g", "key", k=64).collect()
    assert r["union_est"] == r["exact_union"] == 30
    assert r["inter_est"] == r["exact_inter"] == 10
    assert r["jaccard_milli"] == (1000 * 10) // 30


def test_kmv_set_relations_plan_rides_window_group_limit(spark, sf_dir):
    from mariadb_postgres_migration_spark.sources.parquet import (
        read_parquet_table as rd,
    )
    df = rd(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"), F.col("o_custkey").alias("key")
    )
    from mariadb_postgres_migration_spark.plans.inspect import simple_plan
    plan = simple_plan(kmv_set_relations(df, "g", "key", k=64))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# editdist1_pairs (operators/dedup.py) — deletion-neighborhood exact join
# ---------------------------------------------------------------------------


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_editdist1_covers_insert_delete_substitute(spark):
    from mariadb_postgres_migration_spark.operators.dedup import editdist1_pairs

    rows = [
        (1, "kitten"),
        (2, "kitten"),   # dist 0 (exact duplicate)
        (3, "mitten"),   # substitution of 1
        (4, "kittens"),  # insertion
        (5, "itten"),    # deletion
        (6, "sitting"),  # dist 3 from kitten — excluded
        (7, "kitchen"),  # dist 2 — excluded
    ]
    df = spark.createDataFrame(rows, "rid long, s string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in editdist1_pairs(df, "rid", "s").collect()
    }
    exp = {
        (a, b): _lev(sa, sb)
        for a, sa in rows
        for b, sb in rows
        if a < b and _lev(sa, sb) <= 1
    }
    assert got == exp
    assert (1, 2) in got and got[(1, 2)] == 0
    assert (1, 4) in got and (1, 5) in got and (1, 3) in got
    assert (1, 6) not in got and (1, 7) not in got


def test_editdist1_equals_bruteforce_on_random_strings(spark):
    from mariadb_postgres_migration_spark.operators.dedup import editdist1_pairs

    import random

    for seed in range(3):
        rng = random.Random(seed)
        base = ["".join(rng.choice("abcd") for _ in range(rng.randint(2, 8)))
                for _ in range(25)]
        mut = []
        for i, s in enumerate(base[:12]):
            l = list(s)
            op = rng.randrange(3)
            pos = rng.randrange(len(l))
            if op == 0:
                l[pos] = rng.choice("abcd")
            elif op == 1:
                l.insert(pos, rng.choice("abcd"))
            else:
                del l[pos]
            mut.append("".join(l))
        strings = base + mut
        rows = list(enumerate(strings))
        df = spark.createDataFrame(rows, "rid long, s string")
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in editdist1_pairs(df, "rid", "s").collect()
        }
        exp = {
            (a, b): _lev(sa, sb)
            for a, sa in rows
            for b, sb in rows
            if a < b and _lev(sa, sb) <= 1
        }
        assert got == exp, f"seed {seed}"


def test_editdist1_plan_has_no_cartesian(spark, sf_dir):
    from mariadb_postgres_migration_spark.operators.dedup import editdist1_pairs
    from mariadb_postgres_migration_spark.sources.parquet import (
        read_parquet_table as rd,
    )

    cust = rd(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("rid"), F.col("c_name").alias("s")
    )
    plan = formatted_plan(editdist1_pairs(cust, "rid", "s"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# bitmap_set_relations
# ---------------------------------------------------------------------------


def test_bitmap_set_relations_exact_vs_python_sets(spark):
    from mariadb_postgres_migration_spark.operators.sketches import (
        bitmap_set_relations,
    )

    import random

    rng = random.Random(11)
    groups = {
        "a": {rng.randrange(0, 500) for _ in range(300)},
        "b": {rng.randrange(200, 700) for _ in range(300)},
        "c": {rng.randrange(0, 5000) for _ in range(100)},  # sparse tail
    }
    # duplicates in the raw rows must not matter
    rows = [(g, k) for g, ks in groups.items() for k in ks for _ in (0, 1)]
    df = spark.createDataFrame(rows, "g string, k long")
    got = {
        (r["g1"], r["g2"]): (
            r["n_a"], r["n_b"], r["n_inter"], r["n_union"], r["jaccard_milli"]
        )
        for r in bitmap_set_relations(df, "g", "k").collect()
    }
    for (g1, g2), vals in got.items():
        sa, sb = groups[g1], groups[g2]
        i, u = len(sa & sb), len(sa | sb)
        assert vals == (len(sa), len(sb), i, u, (1000 * i) // u), (g1, g2)
    assert len(got) == 3


def test_bitmap_word_boundary_keys(spark):
    from mariadb_postgres_migration_spark.operators.sketches import (
        BITMAP_WORD_BITS,
        bitmap_set_relations,
    )

    w = BITMAP_WORD_BITS
    # keys straddling word boundaries incl. bit 61 (the top packed bit)
    ka = {0, w - 1, w, 2 * w - 1, 2 * w, 61}
    kb = {w - 1, 2 * w, 5 * w + 3}
    rows = [("a", k) for k in ka] + [("b", k) for k in kb]
    df = spark.createDataFrame(rows, "g string, k long")
    [r] = bitmap_set_relations(df, "g", "k").collect()
    assert (r["n_a"], r["n_b"]) == (len(ka), len(kb))
    assert r["n_inter"] == len(ka & kb) == 2
    assert r["n_union"] == len(ka | kb)


def test_editdist1_non_ascii_codepoint_exact(spark):
    """Edge coverage per the r6 brief: the deletion-neighborhood lemma is
    byte-vs-codepoint sensitive. Spark's substr/length/levenshtein are
    all CODEPOINT-based (probed: levenshtein('café','cafe')=1,
    length('😀')=1 — even astral-plane chars count once), so the engine
    is codepoint-exact end-to-end; this pins it against a pure-Python
    exhaustive levenshtein over accents, CJK, combining marks and
    surrogate-pair emoji. NOTE the registered x104 ORACLE (DuckDB
    levenshtein) is BYTE-based ('café'→'cafe' = 2 there) — valid only
    because the registered fixture column is pure ASCII, guarded by
    test_x104_fixture_is_ascii below."""
    from mariadb_postgres_migration_spark.operators.dedup import editdist1_pairs

    import random

    alphabet = "aé日😀́ü語b"  # incl. combining acute (U+0301)
    for seed in range(3):
        rng = random.Random(100 + seed)
        base = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(20)
        ]
        mut = []
        for s in base[:10]:
            l = list(s)  # python str = codepoint list, incl. astral
            op = rng.randrange(3)
            pos = rng.randrange(len(l))
            if op == 0:
                l[pos] = rng.choice(alphabet)
            elif op == 1:
                l.insert(pos, rng.choice(alphabet))
            elif len(l) > 1:
                del l[pos]
            mut.append("".join(l))
        rows = list(enumerate(base + mut))
        df = spark.createDataFrame(rows, "rid long, s string")
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in editdist1_pairs(df, "rid", "s").collect()
        }
        exp = {
            (a, b): _lev(sa, sb)
            for a, sa in rows
            for b, sb in rows
            if a < b and _lev(sa, sb) <= 1
        }
        assert got == exp, f"seed {seed}"


def test_x104_fixture_is_ascii(spark, sf_dir):
    """Guards the x104 oracle's validity domain: DuckDB's levenshtein
    counts BYTES while Spark's counts codepoints, so the registered
    query's hash-compare is only sound over ASCII inputs. If the fixture
    column ever grows non-ASCII names, this fails before the driver
    row silently diverges (the engine itself is codepoint-exact — see
    test_editdist1_non_ascii_codepoint_exact)."""
    from mariadb_postgres_migration_spark.registry import _t

    n_bad = (
        _t(spark, sf_dir, "customer")
        .filter(~F.col("c_name").rlike("^[\\x00-\\x7F]*$"))
        .count()
    )
    assert n_bad == 0


def test_bitmap_word_boundary_matches_duckdb_oracle(spark):
    """x108 edge coverage per the r6 brief: keys straddling the 62-bit
    word boundary, run through BOTH the Spark bitmap algebra and the
    DuckDB COUNT(DISTINCT) oracle — the same cross-engine compare the
    driver does, pinned at the exact packing edge (bits 0, 61, 62, 123,
    124) where a shift or div off-by-one would corrupt the words."""
    import duckdb

    from mariadb_postgres_migration_spark.operators.sketches import (
        BITMAP_WORD_BITS,
        bitmap_set_relations,
        bitmap_set_relations_sql,
    )

    w = BITMAP_WORD_BITS
    ka = sorted({0, w - 1, w, 2 * w - 1, 2 * w, 61, 10 * w})
    kb = sorted({w - 1, 2 * w, 5 * w + 3, 10 * w, 1})
    rows = [("a", k) for k in ka] + [("b", k) for k in kb]
    df = spark.createDataFrame(rows, "g string, k long")
    got = sorted(tuple(r) for r in bitmap_set_relations(df, "g", "k").collect())
    cte = " UNION ALL ".join(
        f"SELECT '{g}' AS g, CAST({k} AS BIGINT) AS k" for g, k in rows
    )
    want = sorted(
        tuple(int(v) if isinstance(v, int) else v for v in row)
        for row in duckdb.connect()
        .execute(bitmap_set_relations_sql(cte))
        .fetchall()
    )
    assert got == want
