"""Link analysis: PageRank in exact quantized-integer arithmetic.

Web-scale corpus curation uses link centrality as a document quality
prior (the original PageRank use, and harmonic-centrality filtering in
Common Crawl derivatives) — alongside the connected-components machinery
in :mod:`.dedup`, this gives the engine a genuine iterative graph
operator.

Floating-point PageRank cannot be hash-compared across engines (sum
order changes the low bits), so scores are fixed-point integers scaled
by 10^12 and every step uses integer division (``div`` in Spark,
``//`` in DuckDB — both truncate on non-negatives): score splits,
damping, and dangling-mass redistribution are all exact, so N unrolled
oracle iterations reproduce the distributed result bit-for-bit — the
same trick x34's k-means training uses.

Per iteration the plan is the canonical distributed PageRank shape:
edges⋈scores on ``src`` (one key shuffle), map-side-combined sum of
contributions by ``dst``, and a spine-preserving left join back — cost
is iterations × (two key shuffles on the edge list). At 100 TB you
pre-partition the edge list by ``src`` once and persist it so every
iteration reuses the layout; the loop here leaves the edge DataFrame
cached for exactly that reason. Dangling mass is a 1-row aggregate
(broadcast), never a driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: scores sum to ~SCALE across the graph.
PR_SCALE = 10**12
#: damping factor 0.85 as an exact rational.
PR_D_NUM, PR_D_DEN = 85, 100


def pagerank(edges: DataFrame, iters: int = 3) -> DataFrame:
    """``(node, score_q)`` after ``iters`` exact fixed-point PageRank
    steps over a directed edge list ``(src, dst)`` (deduplicated here;
    multi-edges carry no extra weight).

    score0 = SCALE div N; each step:
    ``new(v) = (15·SCALE) div (100·N) + (85·(insum(v) + dang div N)) div 100``
    with ``insum`` the sum of ``score(src) div outdeg(src)`` over
    in-edges and ``dang`` the total score of dangling nodes."""
    from .dedup import _persist

    # cached via the shared registry so bench/test harnesses can drain them
    # (release_cached_intermediates) instead of leaking storage per call
    e = _persist(edges.select("src", "dst").distinct())
    nodes = _persist(
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    n_nodes = nodes.count()  # 1-value job; also materializes the caches
    if n_nodes == 0:
        return nodes.select(
            F.col("v").alias("node"), F.lit(0).cast("long").alias("score_q")
        )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))

    base = (15 * PR_SCALE) // (100 * n_nodes)
    deg = _persist(deg)
    scores = nodes.select("v", F.lit(PR_SCALE // n_nodes).cast("long").alias("sq"))
    for _ in range(iters):
        contrib = (
            e.join(scores.withColumnRenamed("v", "src"), on="src")
            .join(deg, on="src")
            .select(F.col("dst").alias("v"), F.expr("sq div deg").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("inc"))
        )
        dang = (
            scores.join(deg.withColumnRenamed("src", "v"), on="v", how="left_anti")
            .agg(F.coalesce(F.sum("sq"), F.lit(0)).cast("long").alias("dm"))
        )
        # persist EVERY iteration's score table: one loop body references
        # `scores` three times (contribution join, dangling aggregate,
        # spine), so an unpersisted lineage re-evaluates the previous
        # iteration per reference — 3^k plan blowup by iteration k
        # (measured at sf0.1: 7.8s warm for 3 iterations, 4.1s persisted).
        # This is the "score table persisted like the edge list" the
        # module docstring promises; values are integer-exact either way.
        scores = _persist(
            scores.select("v")
            .join(contrib, on="v", how="left")
            .crossJoin(dang)
            .select(
                "v",
                (
                    F.lit(base)
                    + F.expr(
                        f"({PR_D_NUM} * (coalesce(inc, 0) + (dm div {n_nodes})))"
                        f" div {PR_D_DEN}"
                    )
                ).cast("long").alias("sq"),
            )
        )
    return scores.select(F.col("v").alias("node"), F.col("sq").alias("score_q"))


def pagerank_oracle_sql(edges_cte: str, iters: int = 3) -> str:
    """DuckDB SQL reproducing :func:`pagerank` bit-for-bit: ``edges_cte``
    must be a CTE body yielding (src, dst); iterations are unrolled."""
    parts = [
        f"e AS ({edges_cte})",
        "nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src)",
        f"s0 AS (SELECT v, CAST({PR_SCALE} AS BIGINT) // n AS sq FROM nodes, nn)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"c{i} AS (SELECT e.dst AS v, CAST(SUM(s.sq // d.deg) AS BIGINT) AS inc\n"
            f"  FROM e JOIN s{p} s ON e.src = s.v JOIN deg d ON e.src = d.src\n"
            f"  GROUP BY e.dst)"
        )
        parts.append(
            f"dang{i} AS (SELECT CAST(COALESCE(SUM(s.sq), 0) AS BIGINT) AS dm\n"
            f"  FROM s{p} s LEFT JOIN deg d ON s.v = d.src WHERE d.src IS NULL)"
        )
        parts.append(
            f"s{i} AS (SELECT s.v,\n"
            f"  CAST((15 * {PR_SCALE}) // (100 * nn.n)\n"
            f"   + ({PR_D_NUM} * (COALESCE(c.inc, 0) + (dang.dm // nn.n)))"
            f" // {PR_D_DEN} AS BIGINT) AS sq\n"
            f"  FROM s{p} s LEFT JOIN c{i} c ON s.v = c.v, nn, dang{i} dang)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT v AS node, sq AS score_q FROM s{iters}"
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected edge list ``(a, b)``
    (self-loops ignored, multi-edges deduplicated) — the standard graph
    cohesion kernel, with the standard scale trick: **degree orientation**.
    Each undirected edge is stored once, oriented from the endpoint that
    is smaller in the (degree, id) total order; a triangle is then
    enumerated EXACTLY once as the wedge (u→v, u→w, (deg,id) of v < of w)
    closed by the oriented edge (v→w). Orientation bounds each node's
    out-degree by O(√m) on any graph, so the wedge join does O(m^1.5)
    work even under power-law hubs — the un-oriented form explodes
    quadratically at every hub. The order is COMPARED, never materialized:
    no global rank window (that would be a single-reducer pass over all
    nodes); the orientation is a per-edge tuple comparison after two
    degree joins.

    Exact and engine-portable: the (degree, id) order is deterministic,
    the enumeration is a 3-way integer equi-join, and counts are integers
    — a DuckDB oracle reproduces the result bit-for-bit.

    Returns ``(node, n_tri)`` for every node in ≥1 triangle."""
    from .dedup import _persist

    e = edges.select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    e = _persist(e)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("degb"))
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = _persist(
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias("ddeg"),
        )
    )
    e1 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("ddeg").alias("dv")
    )
    e2 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("w"), F.col("ddeg").alias("dw")
    )
    v_first = (F.col("dv") < F.col("dw")) | (
        (F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w"))
    )
    wedges = e1.join(e2, "u").filter(v_first).select("u", "v", "w")
    closer = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closer, ["v", "w"])
    return (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )


def triangle_counts_oracle_sql(edges_cte: str) -> str:
    """DuckDB oracle for :func:`triangle_counts`: canonicalize to a<b
    edges, enumerate each triangle exactly once as u<v<w via a 3-way
    self-join (no degree orientation — the oracle runs at test SF where
    the quadratic wedge risk is moot), count corners. Per-node triangle
    counts are enumeration-order independent, so this matches the
    oriented distributed plan bit-for-bit."""
    return f"""WITH e_raw AS ({edges_cte}),
e0 AS (
  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
  FROM e_raw WHERE a <> b
),
tri AS (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
),
corner AS (
  SELECT u AS node FROM tri
  UNION ALL SELECT v AS node FROM tri
  UNION ALL SELECT w AS node FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM corner GROUP BY node"""


def bfs_hops(edges: DataFrame, n_seeds: int = 5, max_hops: int = 3) -> DataFrame:
    """``(node, hop)`` — minimum hop distance from a seed set over an
    undirected edge list ``(a, b)``, by frontier-expansion BFS bounded at
    ``max_hops``. The seed set is the ``n_seeds`` smallest node ids
    (a deterministic, engine-portable rule that needs no side input);
    unreached nodes are absent from the output.

    The scale shape is the textbook distributed BFS: per level, one hash
    join of the symmetric edge list against the current frontier (keyed
    on the edge source — the frontier can be graph-sized at its widest,
    so it is NEVER broadcast), a distinct on the discovered endpoints,
    and an anti-join against the visited set. Each level's frontier and
    the visited set are lazily ``localCheckpoint``ed so the loop's
    lineage (and with it the per-level PLANNING cost — persisted frames
    keep their full analyzed plans, and each level references the prior
    level's three times, so planning grew multiplicatively: measured
    0.8s/1.3s/9.3s for levels 1-3 under persist, flat ~0.8s under
    checkpoint) stays constant; the count probe is the action that
    materializes each level. An empty frontier short-circuits the
    remaining levels. min-hop correctness needs no tie-breaking: a node
    enters ``visited`` at the first level that reaches it and the
    anti-join hides it from every later level.
    """
    # canonicalize with least/greatest (matching random_walks/cheapest_paths,
    # review r6 advice): a caller passing a symmetric edge list must collapse
    # to one row per undirected edge — BFS output is insensitive to the
    # duplicate (per-level distinct), but the join does double work
    e = (
        edges.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
    )
    frontier = nodes.sort("node").limit(n_seeds).localCheckpoint(eager=False)
    visited = (
        frontier.select("node", F.lit(0).cast("long").alias("hop"))
        .localCheckpoint(eager=False)
    )
    for h in range(1, max_hops + 1):
        nxt = (
            und.join(frontier.withColumnRenamed("node", "a"), on="a")
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited, on="node", how="left_anti")
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            break
        visited = (
            visited.union(nxt.select("node", F.lit(h).cast("long").alias("hop")))
            .localCheckpoint(eager=False)
        )
        frontier = nxt
    return visited


def bfs_hops_oracle_sql(edges_cte: str, n_seeds: int = 5, max_hops: int = 3) -> str:
    """DuckDB oracle for :func:`bfs_hops`: the levels are unrolled as
    chained CTEs (frontier_i = neighbors of frontier_{i-1} minus every
    earlier level), exactly mirroring the distributed loop — an empty
    level makes every later level empty, so bounded unrolling equals the
    short-circuiting Spark loop."""
    parts = [
        f"raw AS ({edges_cte})",
        # least/greatest canonicalization mirrors the Spark loop exactly
        "e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b"
        " FROM raw WHERE a <> b)",
        "u AS (SELECT a, b FROM e UNION SELECT b, a FROM e)",
        "nodes AS (SELECT DISTINCT a AS node FROM u)",
        f"f0 AS (SELECT node FROM nodes ORDER BY node LIMIT {n_seeds})",
        "v0 AS (SELECT node, 0 AS hop FROM f0)",
    ]
    for h in range(1, max_hops + 1):
        parts.append(
            f"f{h} AS (SELECT DISTINCT u.b AS node FROM u"
            f" JOIN f{h - 1} f ON u.a = f.node"
            f" WHERE u.b NOT IN (SELECT node FROM v{h - 1}))"
        )
        parts.append(
            f"v{h} AS (SELECT node, hop FROM v{h - 1}"
            f" UNION ALL SELECT node, {h} FROM f{h})"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, CAST(hop AS BIGINT) AS hop FROM v{max_hops}"
    )


def kcore(edges: DataFrame, k: int = 3, rounds: int = 8) -> DataFrame:
    """``(node, deg)`` — ``rounds`` peel steps toward the k-core of an
    undirected edge list ``(a, b)``: per round, count degrees on the
    SURVIVING subgraph, drop nodes with degree < k, drop edges touching
    a dropped node. When the peel reaches its fixpoint within the bound,
    the output IS the k-core (the maximal subgraph where every node has
    degree ≥ k, Seidman 1983) with each survivor's within-core degree —
    pinned on a hand-built fixture in tests; on a graph whose periphery
    unravels slower (long chains peel one layer per round), the output
    is the round-``rounds`` peel state, still a strict over-approximation
    that shrinks monotonically. The bounded-iteration form is the same
    contract as PageRank's 3 steps, k-means' fixed rounds, and BFS's hop
    cap: both engines compute the identical bounded unroll at any data
    scale, instead of a convergence loop whose round count (and thus the
    oracle's shape) would be data-dependent. The k-core is the standard
    corpus-graph denoiser one step past a support threshold: a part can
    clear x85's pairwise support and still hang off the periphery; the
    core keeps only the mutually-dense region.

    Each round is one map-side-combined groupBy on the (shrinking)
    undirected edge list plus two semi-joins — no all-pairs anything.
    The edge list is undirected ONCE by a row-local explode (never a
    self-union re-evaluating the upstream pair generation — the x27
    lesson, dedup.py), and each round's survivor list is
    ``localCheckpoint``ed LAZILY so the convergence probe is the action
    that materializes it AND plan depth stays constant instead of
    multiplying per round (a persist alone leaves the logical plan
    growing ~6× per round, which OOMs the driver on plan STRINGS long
    before any data moves — measured). The loop short-circuits the
    moment a round removes nothing — every later round is identity, so
    the early exit is exactly equal to the oracle's full unroll.

    100 TB shape: the edge list halves-or-better per early round (peeling
    removes the long low-degree tail first), so total work is a small
    constant times the first-round degree count; the per-round state that
    must co-locate is keyed on node ids — hub skew is bounded because a
    hub's degree row is ONE row after the map-side-combined count.
    """
    # least/greatest canonicalization (matching random_walks, review r6
    # advice): a symmetric input must collapse to one row per undirected
    # edge BEFORE the explode doubles it, or degrees double and the k
    # threshold is effectively halved
    und = (
        edges.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .localCheckpoint(eager=False)
    )
    n_edges = und.count()
    for _ in range(rounds):
        keep = (
            und.groupBy("a")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("a")
        )
        nxt = (
            und.join(keep, on="a", how="left_semi")
            .join(keep.select(F.col("a").alias("b")), on="b", how="left_semi")
            .localCheckpoint(eager=False)
        )
        n_nxt = nxt.count()
        if n_nxt == n_edges:
            break
        und, n_edges = nxt, n_nxt
        if n_edges == 0:
            break
    return und.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )


def kcore_oracle_sql(edges_cte: str, k: int = 3, rounds: int = 8) -> str:
    """DuckDB oracle for :func:`kcore`: ``rounds`` unrolled peel levels
    (degree-filter + edge restriction per level). Because a converged
    level is a fixpoint, unrolling PAST convergence is identity — so the
    bounded unroll equals the short-circuiting Spark loop exactly,
    converged or not.

    Every level is ``MATERIALIZED``: DuckDB inlines plain CTEs at each
    reference, and a level references its predecessor ~3× — 8 inlined
    levels expand to ~3^8 copies of the base-table scan, which exhausts
    file handles before returning a row. Materialization makes the
    oracle's work linear in rounds, same as the distributed loop."""
    parts = [
        f"raw AS MATERIALIZED ({edges_cte})",
        # least/greatest canonicalization mirrors the Spark loop exactly
        "e0 AS MATERIALIZED (SELECT DISTINCT least(a, b) AS a,"
        " greatest(a, b) AS b FROM raw WHERE a <> b)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT a AS node, count(*) AS deg FROM"
            f" (SELECT a, b FROM e{p} UNION ALL SELECT b, a FROM e{p})"
            f" GROUP BY a)"
        )
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k})"
        )
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT a, b FROM e{p}"
            f" WHERE a IN (SELECT node FROM k{r})"
            f" AND b IN (SELECT node FROM k{r}))"
        )
    last = rounds
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
FROM (SELECT a, b FROM e{last} UNION ALL SELECT b, a FROM e{last})
GROUP BY a"""
    )


def random_walks(
    edges: DataFrame, n_seeds: int = 50, walk_len: int = 3
) -> DataFrame:
    """Deterministic "random" walks over an undirected edge list ``(a,
    b)`` — the DeepWalk/node2vec corpus generator (Perozzi et al. KDD
    2014): walks are the sentences a skip-gram embedding trains on, so
    this is the graph→training-data bridge operator. Seeds are the
    ``n_seeds`` smallest node ids; each walk takes ``walk_len`` steps.

    Determinism (what makes an embedding corpus reproducible AND the
    operator hash-verifiable): step t from node ``cur`` on the walk
    started at ``seed`` picks neighbor rank ``md5(seed|t|cur) mod
    deg(cur) + 1`` in the (node, neighbor-id-ordered) adjacency ranking —
    pure integer arithmetic both engines reproduce bit-for-bit, with the
    statistical mixing of a hash. No RNG state, no seed plumbing, and
    identical output at any parallelism.

    Plan: the ranked adjacency (one window over per-node neighbor lists
    — groups are node degrees, never corpus-sized) is built ONCE and
    lazily checkpointed; each step is one keyed join against it (walk
    frontier keyed on ``cur`` — never broadcast, walks can be
    graph-sized). ``walk_len`` joins total, lineage flat.

    Returns ``(seed, step, node)``: step 0 is the seed row.
    """
    # canonicalize BEFORE the explode: an input carrying both orientations
    # of an undirected edge must collapse to one, or the adjacency ranking
    # holds duplicate neighbor rows and rn/deg (hence every md5 pick)
    # diverge from the oracle's UNION-dedup'd adjacency (review r6b —
    # latent with _x85_edges' canonical a<b pairs, wrong for any caller
    # passing a symmetric edge list)
    e = (
        edges.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("a").orderBy("b")
    adj = (
        und.withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("a")).cast("long"))
        .localCheckpoint(eager=False)
    )
    nodes = und.select(F.col("a").alias("node")).distinct()
    frontier = (
        nodes.sort("node")
        .limit(n_seeds)
        .select(F.col("node").alias("seed"), F.col("node").alias("cur"))
        .localCheckpoint(eager=False)
    )
    out = frontier.select(
        "seed", F.lit(0).cast("long").alias("step"), F.col("cur").alias("node")
    )
    from .reconcile import hex_chunk

    for t in range(1, walk_len + 1):
        pick = hex_chunk(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("seed").cast("string"),
                    F.lit(str(t)),
                    F.col("cur").cast("string"),
                )
            ),
            1,
        )
        frontier = (
            frontier.join(adj, frontier["cur"] == adj["a"])
            .filter(adj["rn"] == pick % adj["deg"] + 1)
            .select("seed", adj["b"].alias("cur"))
            .localCheckpoint(eager=False)
        )
        out = out.unionAll(
            frontier.select(
                "seed", F.lit(t).cast("long").alias("step"),
                F.col("cur").alias("node"),
            )
        )
    return out


def random_walks_oracle_sql(
    edges_cte: str, n_seeds: int = 50, walk_len: int = 3
) -> str:
    """DuckDB oracle for :func:`random_walks`: the identical md5-ranked
    neighbor picks, steps unrolled as MATERIALIZED CTEs."""
    from .reconcile import hex_chunk_sql

    parts = [
        f"raw AS MATERIALIZED ({edges_cte})",
        "e AS MATERIALIZED (SELECT DISTINCT a, b FROM raw WHERE a <> b)",
        "u AS MATERIALIZED (SELECT a, b FROM e UNION SELECT b, a FROM e)",
        "adj AS MATERIALIZED (SELECT a, b,"
        " CAST(row_number() OVER (PARTITION BY a ORDER BY b) AS BIGINT) AS rn,"
        " CAST(count(*) OVER (PARTITION BY a) AS BIGINT) AS deg FROM u)",
        f"f0 AS MATERIALIZED (SELECT node AS seed, node AS cur FROM"
        f" (SELECT DISTINCT a AS node FROM u) ORDER BY node LIMIT {n_seeds})",
    ]
    sel = ["SELECT seed, CAST(0 AS BIGINT) AS step, cur AS node FROM f0"]
    for t in range(1, walk_len + 1):
        pick = hex_chunk_sql(
            f"md5(concat_ws('|', CAST(f.seed AS VARCHAR), '{t}',"
            f" CAST(f.cur AS VARCHAR)))",
            1,
        )
        parts.append(
            f"f{t} AS MATERIALIZED (SELECT f.seed, adj.b AS cur"
            f" FROM f{t - 1} f JOIN adj ON adj.a = f.cur"
            f" AND adj.rn = ({pick}) % adj.deg + 1)"
        )
        sel.append(
            f"SELECT seed, CAST({t} AS BIGINT) AS step, cur AS node FROM f{t}"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sel)


def cheapest_paths(
    edges_w: DataFrame, n_seeds: int = 5, max_edges: int = 3
) -> DataFrame:
    """``(node, cost)`` — minimum path cost from a seed set using at most
    ``max_edges`` edges, over an undirected weighted edge list ``(a, b,
    w)`` with non-negative integer weights: bounded Bellman-Ford, the
    weighted complement to :func:`bfs_hops` (hops ask "how far", costs
    ask "how cheaply"). Seeds are the ``n_seeds`` smallest node ids,
    cost 0.

    "Cheapest path using ≤ k edges" is exactly the k-round Bellman-Ford
    invariant, so the bounded form is well-defined on its own terms (not
    a truncation of some other answer) and both engines unroll the same
    k relaxations. Per round: one keyed join of the current best-cost
    table against the edge list (never broadcast — the frontier is the
    whole reached set), a map-side-combined min per node, and a min-merge
    with the previous round's table; rounds are lazily
    ``localCheckpoint``ed like every iterative kernel here. All-integer
    costs — no float accumulation anywhere.
    """
    e = (
        edges_w.select(
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
            F.col("w").cast("long").alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    und = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b"), F.col("w")),
                    F.struct(
                        F.col("b").alias("a"), F.col("a").alias("b"), F.col("w")
                    ),
                )
            ).alias("p")
        )
        .select("p.a", "p.b", "p.w")
        .localCheckpoint(eager=False)
    )
    nodes = und.select(F.col("a").alias("node")).distinct()
    best = (
        nodes.sort("node")
        .limit(n_seeds)
        .select("node", F.lit(0).cast("long").alias("cost"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_edges):
        relaxed = (
            und.join(best.withColumnRenamed("node", "a"), on="a")
            .select(F.col("b").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
            .unionAll(best)
            .groupBy("node")
            .agg(F.min("cost").cast("long").alias("cost"))
            .localCheckpoint(eager=False)
        )
        best = relaxed
    return best


def cheapest_paths_oracle_sql(
    edges_cte: str, n_seeds: int = 5, max_edges: int = 3
) -> str:
    """DuckDB oracle for :func:`cheapest_paths`: the identical k
    relaxations unrolled as MATERIALIZED CTEs. ``edges_cte`` must yield
    ``(a, b, w)``."""
    parts = [
        f"raw AS MATERIALIZED ({edges_cte})",
        "e AS MATERIALIZED (SELECT least(a, b) AS a, greatest(a, b) AS b,"
        " CAST(min(w) AS BIGINT) AS w FROM raw WHERE a <> b GROUP BY 1, 2)",
        "u AS MATERIALIZED (SELECT a, b, w FROM e"
        " UNION ALL SELECT b, a, w FROM e)",
        f"b0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS cost FROM"
        f" (SELECT DISTINCT a AS node FROM u) ORDER BY node LIMIT {n_seeds})",
    ]
    for r in range(1, max_edges + 1):
        p = r - 1
        parts.append(
            f"b{r} AS MATERIALIZED (SELECT node, CAST(min(cost) AS BIGINT)"
            f" AS cost FROM ("
            f"SELECT u.b AS node, x.cost + u.w AS cost"
            f" FROM b{p} x JOIN u ON u.a = x.node"
            f" UNION ALL SELECT node, cost FROM b{p}"
            f") GROUP BY node)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, cost FROM b{max_edges}"
    )


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """``(node, lbl)`` — ``rounds`` synchronous label-propagation steps
    over an undirected edge list (Raghavan et al. 2007, the
    community-detection kernel): labels start as node ids; each round
    every node adopts the most frequent label among its neighbors, ties
    to the SMALLEST label. Fully deterministic (unlike the paper's
    random tie-breaks — determinism is what makes the operator
    hash-verifiable AND its community assignment reproducible), and
    bounded-iteration like PageRank/k-core/BFS: both engines compute
    the identical R-round unroll, with the known synchronous-LPA
    caveat (bipartite-ish regions can oscillate) subsumed by the
    fixed-round contract rather than a data-dependent convergence loop.

    Per round: one label join keyed on the edge endpoint (never
    broadcast — labels are node-count-sized), one map-side-combined
    (node, label) count, and one max_by argmax; the label frame is
    lazily ``localCheckpoint``ed so plan depth stays constant (the
    kcore lesson). Hub skew is bounded: a hub contributes one row per
    (node, neighbor-label), collapsing at the partial-agg stage.
    """
    e = (
        edges.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .localCheckpoint(eager=False)
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        nbr_lbl = und.join(
            labels.select(F.col("node").alias("b"), "lbl"), "b"
        ).select(F.col("a").alias("node"), "lbl")
        cnt = nbr_lbl.groupBy("node", "lbl").agg(F.count("*").alias("c"))
        labels = (
            cnt.groupBy("node")
            .agg(F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("neg"))).alias("m"))
            .select("node", (-F.col("m.neg")).cast("long").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("lbl").cast("long").alias("lbl"))


def label_propagation_sql(edges_cte: str, rounds: int = 3) -> str:
    """DuckDB oracle for :func:`label_propagation`: the rounds unrolled
    as MATERIALIZED CTEs (see kcore_oracle_sql for why plain CTEs
    explode multiplicatively), tie-break (count DESC, label ASC) via
    row_number."""
    parts = [
        f"raw AS MATERIALIZED ({edges_cte})",
        "e AS MATERIALIZED (SELECT DISTINCT least(a, b) AS a,"
        " greatest(a, b) AS b FROM raw WHERE a <> b)",
        "u AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b, a FROM e)",
        "l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lbl FROM u)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT u.a AS node, l.lbl,"
            f" count(*) AS c FROM u JOIN l{p} l ON u.b = l.node"
            f" GROUP BY u.a, l.lbl)"
        )
        parts.append(
            f"l{r} AS MATERIALIZED (SELECT node, lbl FROM ("
            f"SELECT node, lbl, row_number() OVER (PARTITION BY node"
            f" ORDER BY c DESC, lbl) AS rn FROM c{r}) WHERE rn = 1)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, CAST(lbl AS BIGINT) AS lbl FROM l{rounds}"
    )
