"""Pipeline-health operators: data-quality expectations, SCD2 interval
reconstruction, exact two-pass heavy hitters, and corpus drift.

A migration engine (reference: the OP-12/13/14 repair layer assumes it
KNOWS what dirty data looks like) and a training-data pipeline both need
the inverse capability: *measure* the health of a table before and after a
load instead of silently repairing it. These four operators cover the
standard shapes:

* :func:`expectations_audit` — declarative per-table expectations
  (uniqueness, referential integrity, ranges, domains, null rates)
  evaluated in ONE aggregation pass plus one join-shaped check.
* :func:`scd2_intervals` — reconstruct slowly-changing-dimension
  validity intervals from an event/update stream (gaps-and-islands),
  the canonical warehouse shape for "what was this row's state at t".
* :func:`frequent_terms` — EXACT corpus heavy hitters via the two-pass
  candidate-generation + verification pattern (per-partition mergeable
  Misra-Gries summaries, then an exact recount of candidates only), so
  the full-vocabulary shuffle never happens.
* :func:`corpus_drift` — per-term distribution shift between two corpus
  snapshots as a smoothed odds ratio; the detector behind "did this
  crawl batch change the data mix".

Scale notes are on each function; none of them shuffles more than once on
the big table, and the only driver-side values are single-row aggregates.
"""

from __future__ import annotations

import collections
import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import textanalysis as T

# ---------------------------------------------------------------------------
# expectations audit
# ---------------------------------------------------------------------------


def expectations_audit(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Evaluate a declarative expectation suite over ``orders`` and emit a
    tall report: ``(check_name, violations, total, ok)``.

    The aggregate checks (uniqueness, nulls, ranges, domains) all fold
    into ONE pass over the table — each is a conditional sum, so Spark
    computes them as a single partial-aggregable job (the exact distinct
    count adds the standard expand+two-phase agg on the same scan).
    Referential integrity is the one join-shaped check: a left-anti count
    against the dimension's key projection (column-pruned to the key, so
    the build side is keys only). At 100 TB: one scan + one agg shuffle +
    one key-join — the same cost as any single GROUP BY over the table.

    Reported checks (violations = rows breaking the expectation):

    - ``orderkey_unique``     duplicate primary keys
    - ``custkey_not_null``    null foreign keys
    - ``custkey_refint``      foreign keys absent from ``customer``
    - ``orderdate_not_null``  null order dates
    - ``status_domain``       status outside {'O','F','P'}
    - ``priority_format``     priority not matching ``N-WORD``
    - ``totalprice_range``    price outside the (deliberately tight)
      [1000, 400000] business band — a check that FAILS on TPC-H data,
      so the report exercises both verdicts.
    """
    viol = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    status_ok = F.col("o_orderstatus").isin("O", "F", "P")
    prio_ok = F.col("o_orderpriority").rlike("^[0-9]-[A-Z ]+$")
    price_ok = F.col("o_totalprice").between(1000.0, 400000.0)
    agg = orders.agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("orderkey_unique"),
        viol(F.col("o_custkey").isNull()).alias("custkey_not_null"),
        viol(F.col("o_orderdate").isNull()).alias("orderdate_not_null"),
        viol(~status_ok.eqNullSafe(F.lit(True))).alias("status_domain"),
        viol(~prio_ok.eqNullSafe(F.lit(True))).alias("priority_format"),
        viol(~price_ok.eqNullSafe(F.lit(True))).alias("totalprice_range"),
    )
    refint = (
        orders.select("o_custkey")
        .filter(F.col("o_custkey").isNotNull())
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            on="o_custkey",
            how="left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("custkey_refint"))
    )
    checks = [
        "orderkey_unique",
        "custkey_not_null",
        "custkey_refint",
        "orderdate_not_null",
        "status_domain",
        "priority_format",
        "totalprice_range",
    ]
    # two 1-row aggregates combined and unpivoted — trivially driver-free
    stack = ", ".join(f"'{c}', {c}" for c in checks)
    return (
        agg.crossJoin(refint)
        .selectExpr("total", f"stack({len(checks)}, {stack}) AS (check_name, violations)")
        .select(
            "check_name",
            "violations",
            "total",
            (F.col("violations") == 0).alias("ok"),
        )
    )


# ---------------------------------------------------------------------------
# SCD2 validity intervals
# ---------------------------------------------------------------------------


def scd2_intervals(events: DataFrame) -> DataFrame:
    """Reconstruct SCD-type-2 validity intervals from an update stream:
    collapse each user's consecutive run of equal ``event_type`` into one
    versioned row with ``[valid_from_us, valid_to_us)`` bounds
    (``valid_to_us`` NULL for the current state).

    Classic gaps-and-islands: a change flag (lag ≠ current), a running sum
    of flags as the island id, then per-island min(ts) and a lead() for
    the exclusive upper bound. Every window and the final group share the
    SAME ``user_id`` partitioning, so Catalyst plans ONE exchange and
    reuses it — at 100 TB this is a single shuffle by user, and per-user
    state never materializes more than the user's own rows in the sort
    buffer. Timestamps are emitted as ``unix_micros`` per the engine's
    no-raw-timestamps output rule.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    change = (
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))
    ).cast("long")
    islands = events.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(change).over(wrun).alias("version"),
    )
    per_island = islands.groupBy("user_id", "version", "event_type").agg(
        F.min("ts").alias("__from")
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return per_island.select(
        "user_id",
        "event_type",
        "version",
        F.unix_micros("__from").alias("valid_from_us"),
        F.unix_micros(F.lead("__from").over(wv)).alias("valid_to_us"),
    )


# ---------------------------------------------------------------------------
# exact heavy hitters (two-pass Misra-Gries)
# ---------------------------------------------------------------------------

#: refuse to run with more per-partition counters than this — it means
#: min_count is corpus-proportionally tiny and the "heavy hitter" framing
#: no longer applies (use a plain term count instead).
MAX_MG_COUNTERS = 1 << 20


def _mg_candidates(k: int):
    """Per-partition batched Misra-Gries summary of size ≤ k (mergeable-
    summaries form: merge exact batch counts, then subtract the (k+1)-th
    largest value and drop non-positives). Guarantee: any term whose count
    in the partition exceeds n_p/(k+1) survives — so any term with GLOBAL
    count > N/(k+1) survives in at least one partition (pigeonhole)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        summary: collections.Counter = collections.Counter()

        def prune() -> None:
            if len(summary) > k:
                kth = heapq.nlargest(k + 1, summary.values())[-1]
                for t in [t for t, c in summary.items() if c <= kth]:
                    del summary[t]
                for t in summary:
                    summary[t] -= kth

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # vectorized batch count (C-speed unique, no per-doc Python
            # loop), then one dict-merge into the running summary
            flat = np.concatenate(pdf["__toks"].to_numpy())
            if len(flat):
                terms, counts = np.unique(flat, return_counts=True)
                summary.update(dict(zip(terms.tolist(), counts.tolist())))
            prune()
        yield pd.DataFrame({"term": list(summary.keys()) or pd.Series([], dtype=str)})

    return gen


def frequent_terms(
    docs: DataFrame,
    min_count: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT corpus terms with ≥ ``min_count`` occurrences, without ever
    shuffling the full vocabulary — the candidate-generation +
    verification pattern every 100 TB frequency job needs.

    Pass 0 (cheap): total token count N — one partial-aggregable sum of
    in-row array sizes (in production this is a stored table statistic).
    Pass 1: per-partition mergeable Misra-Gries summaries with
    k = ⌊N/min_count⌋ + 1 counters, which by the MG bound cannot drop any
    term with global count ≥ min_count; the candidate union is ≤ k terms
    per partition, distinct-ed into a small DataFrame (never collected).
    Pass 2: explode tokens, broadcast-semi-join against the candidates,
    exact count, filter ≥ min_count. Partial aggregation means the final
    shuffle carries at most (candidates × partitions) rows.

    False positives from pass 1 are eliminated by the exact recount;
    false negatives cannot occur by the MG guarantee — so the result is
    exactly ``HAVING count(*) >= min_count``.
    """
    toked = T._with_tokens(docs, id_col, text_col)
    n_total = toked.agg(F.sum(F.size("__toks"))).collect()[0][0] or 0
    k = int(n_total // min_count) + 1
    if k > MAX_MG_COUNTERS:
        raise ValueError(
            f"min_count={min_count} needs {k} MG counters/partition "
            f"(> {MAX_MG_COUNTERS}); use a plain term count for thresholds "
            "this far below heavy-hitter territory"
        )
    candidates = (
        toked.select("__toks")
        .mapInPandas(_mg_candidates(k), "term string")
        .distinct()
    )
    occurrences = toked.select(F.explode("__toks").alias("term"))
    return (
        occurrences.join(F.broadcast(candidates), on="term", how="left_semi")  # bounded: <= MAX_MG_COUNTERS candidates
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
    )


# ---------------------------------------------------------------------------
# corpus drift
# ---------------------------------------------------------------------------


def corpus_drift(docs: DataFrame, min_support: int = 20) -> DataFrame:
    """Per-term distribution shift between two corpus halves (here: even
    vs odd ``doc_id``; in production: yesterday's snapshot vs today's).

    Emits ``(term, n_a, n_b, drift_ratio)`` for every term with combined
    support ≥ ``min_support``, where ``drift_ratio`` is the add-one-
    smoothed odds ratio ((n_a+1)/(tot_a+V)) / ((n_b+1)/(tot_b+V)) — a
    PURE-RATIONAL statistic (two IEEE multiplies and one divide on the
    same operands in any engine), deliberately chosen over KL/log-ratio
    because transcendental libm functions are not bit-identical across
    engines and would poison the value hash.

    Plan: one tokenize pass, one explode, ONE term-keyed shuffle with
    map-side combine computing both halves' counts as conditional sums;
    the totals and vocabulary size are 1-row aggregates of the (already
    small) grouped table, combined by a 1-row crossJoin. No per-term
    join between snapshots, no second corpus scan.
    """
    toked = T._with_tokens(docs, "doc_id", "text")
    terms = toked.select(
        (F.col("doc_id") % 2 == 0).alias("__a"), F.explode("__toks").alias("term")
    )
    grouped = terms.groupBy("term").agg(
        F.sum(F.when(F.col("__a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~F.col("__a"), 1).otherwise(0)).cast("long").alias("n_b"),
    )
    # grouped feeds both the totals agg and the output projection; the two
    # subplans canonicalize identically, so ReuseExchange shares the ONE
    # term shuffle between them (asserted in tests/test_audit.py)
    totals = grouped.agg(
        F.sum("n_a").cast("double").alias("__tot_a"),
        F.sum("n_b").cast("double").alias("__tot_b"),
        F.count(F.lit(1)).cast("double").alias("__v"),
    )
    ratio = ((F.col("n_a") + 1) * (F.col("__tot_b") + F.col("__v"))) / (
        (F.col("n_b") + 1) * (F.col("__tot_a") + F.col("__v"))
    )
    return (
        grouped.filter(F.col("n_a") + F.col("n_b") >= min_support)
        .crossJoin(totals)
        .select("term", "n_a", "n_b", F.round(ratio, 6).alias("drift_ratio"))
    )


#: epoch-week quantum for cohort retention: 7 days of microseconds.
WEEK_US = 7 * 86_400_000_000


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention triangle (EXT-ANALYTICS): users are cohorted by
    the epoch-week of their FIRST event; for every week they are active
    afterward, the (cohort_week, week_offset) cell counts them — the
    standard product-analytics retention matrix ("of the users acquired
    in week W, how many came back k weeks later"), and for a training
    corpus the freshness profile of contributing users/sources.

    All-integer arithmetic: epoch-weeks are ``epoch_us div WEEK_US``
    (no calendar/timezone semantics to disagree on — the same
    fixed-quantum bucketing the tumbling windows use), offsets are week
    differences, cells are counts.

    Plan: one user-keyed aggregate for the cohort week (min over first
    events), one distinct on (user, active-week) — both map-side-combined
    — a user-keyed join back, and the final (cohort, offset) rollup whose
    output is O(weeks²/2), tiny at any corpus size. No windows, no
    per-user state.

    Returns ``(cohort_week, week_offset, n_users)``.
    """
    base = events.select(
        F.col(user_col).alias("u"),
        F.expr(f"unix_micros(CAST({ts_col} AS timestamp)) div {WEEK_US}")
        .alias("wk"),
    ).filter(F.col("wk").isNotNull())
    cohort = base.groupBy("u").agg(F.min("wk").alias("cw"))
    active = base.distinct()
    # (u, cw, off) is already unique here: active is distinct on (u, wk),
    # cohort is 1 row per u, and off is a bijection of wk for fixed u —
    # no second distinct (review r6b: it re-shuffled the whole active set
    # for no semantic effect)
    return (
        active.join(cohort, "u")
        .select("u", (F.col("wk") - F.col("cw")).alias("off"), "cw")
        .groupBy(F.col("cw").alias("cohort_week"), F.col("off").alias("week_offset"))
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def cohort_retention_sql(events_cte: str) -> str:
    """DuckDB oracle for :func:`cohort_retention`; ``events_cte`` must
    yield ``(u, us)`` with ``us`` epoch-microseconds."""
    return f"""WITH e AS ({events_cte}),
  b AS (SELECT u, us // {WEEK_US} AS wk FROM e WHERE us IS NOT NULL),
  cohort AS (SELECT u, min(wk) AS cw FROM b GROUP BY u),
  active AS (SELECT DISTINCT u, wk FROM b),
  cells AS (SELECT a.u, c.cw, a.wk - c.cw AS off
            FROM active a JOIN cohort c ON a.u = c.u)
SELECT cw AS cohort_week, off AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM cells GROUP BY cw, off"""


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over per-user event sequences
    (EXT-ANALYTICS): for every ordered pair of consecutive events of one
    user, count (from_type → to_type) and emit the per-from-state
    transition probability in integer per-mille — the behavioral
    transition matrix behind "what do users do after a click", session
    modeling, and anomalous-flow detection (a sequence-level complement
    to x71's fixed funnel: the funnel asks about ONE path, the matrix
    measures them all).

    Plan: one user-keyed window (ordered by ts, id — the SAME exchange
    every per-user sequence operator here shares) produces the lead
    type, then a (from, to) groupBy over ≤ |types|² groups and a
    broadcast-sized join to the from-state totals. Probabilities are
    integer per-mille (``1000·n div n_from``) — no float division in the
    verified surface.

    Returns ``(from_type, to_type, n, p_milli)``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    steps = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    trans = steps.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        trans.join(F.broadcast(totals), "from_type")  # bounded: one row per event type
        .select(
            "from_type", "to_type", "n",
            F.expr("(1000 * n) div n_from").cast("long").alias("p_milli"),
        )
    )


def markov_transitions_sql(events_cte: str) -> str:
    """DuckDB oracle for :func:`markov_transitions`; ``events_cte`` must
    yield ``(u, us, event_id, et)``."""
    return f"""WITH e AS ({events_cte}),
  steps AS (SELECT et AS from_type,
                   lead(et) OVER (PARTITION BY u ORDER BY us, event_id)
                     AS to_type
            FROM e),
  trans AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
            FROM steps WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type),
  tot AS (SELECT from_type, sum(n) AS n_from FROM trans GROUP BY from_type)
SELECT t.from_type, t.to_type, t.n,
       CAST((1000 * t.n) // x.n_from AS BIGINT) AS p_milli
FROM trans t JOIN tot x ON t.from_type = x.from_type"""


#: half-life for the decayed-value aggregate, in days.
DECAY_HALF_LIFE_DAYS = 7


def decayed_value(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: int = DECAY_HALF_LIFE_DAYS,
) -> DataFrame:
    """Recency-weighted per-user value (EXT-ANALYTICS): each event's
    quantized cents are halved once per ``half_life_days`` elapsed since
    the event (relative to the corpus's newest event), then summed per
    user — the freshness-decayed engagement score behind recommendation
    and churn features, where yesterday's purchase should outweigh last
    quarter's.

    The exactness trick: exponential decay is usually ``v·2^(−age/h)``
    in floats — unhashable across engines. Quantizing the exponent to
    WHOLE half-lives makes the weight an integer right-shift
    (``cents >> (age_days div h)``): a staircase approximation of the
    exponential (each event keeps full value until its next half-life
    boundary), fully deterministic, order-free integer sums. The
    reference point (max ts) is a 1-row aggregate broadcast into the
    row-local shift — one scan, one user-keyed aggregate.

    Returns ``(user, n_events, raw_cents, decayed_cents)``.
    """
    base = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long").alias("cents"),
    ).filter(F.col("us").isNotNull())
    mx = base.agg(F.max("us").alias("mx"))
    h_us = half_life_days * 86_400_000_000
    return (
        base.join(F.broadcast(mx))  # bounded: 1-row scalar aggregate
        .select(
            "u", "cents",
            # clamp: Java shiftright masks the shift mod 64 (a 64-shift
            # would WRAP to 0 shift); clamping BOTH engines at 62 floors
            # any ancient event to 0 (or -1 for negative cents) the same
            # way — the oracle (decayed_value_sql) carries the same clamp
            F.expr(
                f"shiftright(cents,"
                f" CAST(least((mx - us) div {h_us}, 62) AS INT))"
            )
            .cast("long")
            .alias("dec"),
        )
        .groupBy(F.col("u").alias(user_col))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("raw_cents"),
            F.sum("dec").cast("long").alias("decayed_cents"),
        )
    )


def decayed_value_sql(
    events_cte: str, user_col: str, half_life_days: int = DECAY_HALF_LIFE_DAYS
) -> str:
    """DuckDB oracle for :func:`decayed_value`; ``events_cte`` must yield
    ``(u, us, cents)``."""
    h_us = half_life_days * 86_400_000_000
    return f"""WITH e AS ({events_cte}),
  nn AS (SELECT u, us, cents FROM e WHERE us IS NOT NULL),
  mx AS (SELECT max(us) AS mx FROM nn)
SELECT u AS {user_col}, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS raw_cents,
       CAST(sum(cents >> CAST(least((mx - us) // {h_us}, 62) AS INTEGER))
            AS BIGINT) AS decayed_cents
FROM nn, mx GROUP BY u"""


def frequent_trigrams(
    events: DataFrame,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-k most frequent length-3 event sequences across users
    (EXT-ANALYTICS): the sequence-mining step past x109's transition
    matrix — a Markov matrix can score any path as a product of pairs,
    but real behavioral motifs ("view→view→purchase") are only visible
    as counted n-grams (a transition matrix cannot distinguish ABA from
    ABB traffic mixes with identical pair counts).

    Plan: TWO leads over the same user-keyed window (one exchange — the
    shared per-user sequence partitioning), a (t1, t2, t3) groupBy over
    ≤ |types|³ groups, and a rank-free distributed top-k
    (TakeOrderedAndProject via sort+limit) with the trigram text as a
    deterministic tiebreak.

    Returns ``(rk, trigram, n)``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    tri = (
        events.select(
            F.col(type_col).alias("t1"),
            F.lead(type_col, 1).over(w).alias("t2"),
            F.lead(type_col, 2).over(w).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
        .select(F.concat_ws(">", "t1", "t2", "t3").alias("trigram"))
        .groupBy("trigram")
        .agg(F.count("*").cast("long").alias("n"))
        .sort(F.desc("n"), F.asc("trigram"))
        .limit(k)
    )
    wr = Window.orderBy(F.desc("n"), F.asc("trigram"))
    return tri.select(
        F.row_number().over(wr).cast("long").alias("rk"), "trigram", "n"
    )


def frequent_trigrams_sql(events_cte: str, k: int = 20) -> str:
    """DuckDB oracle for :func:`frequent_trigrams`; ``events_cte`` must
    yield ``(u, us, event_id, et)``."""
    return f"""WITH e AS ({events_cte}),
  s AS (SELECT et AS t1,
               lead(et, 1) OVER w AS t2,
               lead(et, 2) OVER w AS t3
        FROM e WINDOW w AS (PARTITION BY u ORDER BY us, event_id)),
  tri AS (SELECT concat_ws('>', t1, t2, t3) AS trigram,
                 CAST(count(*) AS BIGINT) AS n
          FROM s WHERE t3 IS NOT NULL GROUP BY 1),
  top AS (SELECT * FROM tri ORDER BY n DESC, trigram LIMIT {k})
SELECT CAST(row_number() OVER (ORDER BY n DESC, trigram) AS BIGINT) AS rk,
       trigram, n
FROM top"""


#: gap that closes a session, in microseconds (30 minutes — the classic
#: web-analytics default).
SESSION_GAP_US = 30 * 60 * 1_000_000


def sessionize(
    events: DataFrame,
    gap_us: int = SESSION_GAP_US,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch gap-based sessionization (EXT-ANALYTICS): per user, a new
    session starts when the gap since the previous event exceeds
    ``gap_us``; output is one row per session with its ordinal, event
    count and span — the batch complement of the x19 STREAMING
    ``session_window`` (same semantics, but over history at rest, where
    a watermarked stream operator would be the wrong tool).

    Plan: the classic two-window cascade on ONE user-keyed exchange
    (lag → new-session flag → running sum = session ordinal), then a
    (user, session) groupBy. Both windows share the exact partitioning/
    ordering, so Catalyst plans a single Exchange+Sort; at 100 TB the
    only data motion is that one shuffle of (user, ts) pairs.

    Returns ``(user_id, session_idx, n_events, start_us, end_us,
    duration_us)`` with epoch-microsecond timestamps (hash-stable — see
    the module convention on raw timestamps)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    base = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).alias("eid"),
    ).filter(F.col("us").isNotNull())
    wu = Window.partitionBy("u").orderBy("us", "eid")
    flagged = base.select(
        "u", "us",
        F.when(
            (F.col("us") - F.lag("us").over(wu)) > gap_us, 1
        ).otherwise(0).alias("new_s"),
        F.col("eid"),
    )
    with_idx = flagged.select(
        "u", "us",
        F.sum("new_s").over(
            Window.partitionBy("u").orderBy("us", "eid")
            .rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("sidx"),
    )
    return (
        with_idx.groupBy(F.col("u").alias(user_col), F.col("sidx").alias("session_idx"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("us").cast("long").alias("start_us"),
            F.max("us").cast("long").alias("end_us"),
        )
        .select(
            user_col, "session_idx", "n_events", "start_us", "end_us",
            (F.col("end_us") - F.col("start_us")).cast("long").alias("duration_us"),
        )
    )


def sessionize_sql(
    events_cte: str, gap_us: int = SESSION_GAP_US, user_col: str = "user_id"
) -> str:
    """DuckDB oracle for :func:`sessionize`; ``events_cte`` must yield
    ``(u, us, eid)``."""
    return f"""WITH e AS ({events_cte}),
nn AS (SELECT u, us, eid FROM e WHERE us IS NOT NULL),
flagged AS (SELECT u, us, eid,
                   CASE WHEN us - lag(us) OVER w > {gap_us} THEN 1 ELSE 0 END
                     AS new_s
            FROM nn WINDOW w AS (PARTITION BY u ORDER BY us, eid)),
idx AS (SELECT u, us,
               sum(new_s) OVER (PARTITION BY u ORDER BY us, eid
                                ROWS UNBOUNDED PRECEDING) AS sidx
        FROM flagged)
SELECT u AS {user_col}, CAST(sidx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(us) AS BIGINT) AS start_us,
       CAST(max(us) AS BIGINT) AS end_us,
       CAST(max(us) - min(us) AS BIGINT) AS duration_us
FROM idx GROUP BY u, sidx"""


def autocorr_daily(
    df: DataFrame,
    ts_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Lag-k autocorrelation of the daily ROW-COUNT series
    (EXT-ANALYTICS): build the per-day count once, then for each lag
    1..max_lag compute Pearson r over the (x_t, x_{t-k}) pairs — the
    seasonality probe behind "is weekly periodicity real"
    (TPC-H-date-spread order arrivals here; any event series in
    production).

    Hash-portable float discipline: all five accumulators (n, Σx, Σy,
    Σxy, Σx², Σy²) are EXACT int64 sums; r is then ONE deterministic
    IEEE expression over those exact integers — num/(sqrt(d1)·sqrt(d2)),
    rounded to 4 — so both engines compute bit-identical doubles (no
    reordered float accumulation anywhere). Counts keep the moment
    algebra inside int64 at ANY tested scale: with ~2 400 days,
    n·Σx² < 2^63 holds through sf1000 (~600 k rows/day) — a
    revenue-cents series overflows the same identity at sf0.001
    already, which is WHY the series is counts (a value series must
    pre-scale its unit so n·Σx² fits, or center on a pivot).
    The lag join is a self-join of the tiny day-series on day+k: at any
    corpus scale the series is |days| rows, so every per-lag pass is
    broadcast-sized by construction.

    Returns ``(lag, n_pairs, r)``."""
    daily = (
        df.select(
            F.expr(f"unix_micros(CAST({ts_col} AS timestamp)) div 86400000000")
            .alias("day"),
        )
        .filter(F.col("day").isNotNull())
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("v"))
    )
    # Route through the shared tracked-persist pool (ADVICE r7): the day
    # series must stay materialized while the 7 lag passes consume it, so
    # ownership passes to the caller via release_cached_intermediates().
    from .dedup import _persist

    daily = _persist(daily)
    out = None
    for k in range(1, max_lag + 1):
        lagged = daily.select(
            (F.col("day") + k).alias("day"), F.col("v").alias("vlag")
        )
        pairs = daily.join(lagged, "day").select(
            F.col("v").alias("x"), F.col("vlag").alias("y")
        )
        acc = pairs.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
        row = acc.select(
            F.lit(k).cast("long").alias("lag"),
            F.col("n").alias("n_pairs"),
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                .cast("double")
                / (
                    F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
                    * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
                ),
                4,
            ).alias("r"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def autocorr_daily_sql(rows_cte: str, max_lag: int = 7) -> str:
    """DuckDB oracle for :func:`autocorr_daily`; ``rows_cte`` must yield
    ``day`` pre-aggregation rows."""
    parts = [f"""WITH raw AS ({rows_cte}),
daily AS (SELECT day, CAST(count(*) AS BIGINT) AS v
          FROM raw WHERE day IS NOT NULL GROUP BY day)"""]
    sel = []
    for k in range(1, max_lag + 1):
        parts.append(f""",
p{k} AS (SELECT a.v AS x, b.v AS y FROM daily a JOIN daily b ON a.day = b.day + {k}),
a{k} AS (SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx,
                CAST(sum(y * y) AS BIGINT) AS syy
         FROM p{k})""")
        sel.append(
            f"""SELECT CAST({k} AS BIGINT) AS lag, n AS n_pairs,
round(CAST(n * sxy - sx * sy AS DOUBLE)
      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 4) AS r
FROM a{k}"""
        )
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


def cusum_changepoint(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-type CUSUM changepoint over the daily-count series
    (EXT-ANALYTICS/EXT-ANOM): for each event type, the observed-day
    where the cumulative deviation from the series mean peaks — the
    classic level-shift detector (Page 1954) behind "when did this
    event's rate change", complementing x75's pointwise z-score (a
    single-row outlier) with a SERIES-level break locator.

    Integer-exact algebra: the textbook statistic S_d = Σ_{i≤d}(v_i −
    T/n) carries a rational mean; scaling by n gives S'_d = n·Σ_{i≤d}v_i
    − d·T — pure int64 (|S'| ≤ n·T, far under 2^63 at any realistic
    series), so the argmax is exact in both engines. Tie rule: largest
    \\|S'\\|, then earliest day.

    Plan: one daily-count aggregate, one per-type window cumsum sharing
    the same type-keyed exchange, a broadcast-sized per-type totals
    join, and a max_by argmax — the series is |types|·|days| rows at
    any corpus scale.

    Returns ``(event_type, cp_day, s_abs, n_days, total)``."""
    daily = (
        events.select(
            F.col(type_col).alias("et"),
            F.expr(f"unix_micros(CAST({ts_col} AS timestamp)) div 86400000000")
            .alias("day"),
        )
        .filter(F.col("day").isNotNull())
        .groupBy("et", "day")
        .agg(F.count("*").cast("long").alias("v"))
    )
    tot = daily.groupBy("et").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("v").cast("long").alias("total"),
    )
    w = Window.partitionBy("et").orderBy("day")
    cum = daily.select(
        "et", "day",
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long").alias("cv"),
        F.row_number().over(w).cast("long").alias("k"),
    )
    s = cum.join(F.broadcast(tot), "et").select(  # bounded: one row per event type
        "et", "day", "n_days", "total",
        F.abs(F.col("n_days") * F.col("cv") - F.col("k") * F.col("total"))
        .cast("long").alias("s_abs"),
    )
    return (
        s.groupBy(F.col("et").alias(type_col))
        .agg(
            F.max(F.struct(F.col("s_abs"), (-F.col("day")).alias("nd"),
                           F.col("day"), F.col("n_days"), F.col("total")))
            .alias("m")
        )
        .select(
            type_col,
            F.col("m.day").alias("cp_day"),
            F.col("m.s_abs").alias("s_abs"),
            F.col("m.n_days").alias("n_days"),
            F.col("m.total").alias("total"),
        )
    )


def cusum_changepoint_sql(events_cte: str, type_col: str = "event_type") -> str:
    """DuckDB oracle for :func:`cusum_changepoint`; ``events_cte`` must
    yield ``(et, us)``."""
    return f"""WITH e AS ({events_cte}),
daily AS (SELECT et, us // 86400000000 AS day,
                 CAST(count(*) AS BIGINT) AS v
          FROM e WHERE us IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT et, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(v) AS BIGINT) AS total
        FROM daily GROUP BY et),
cum AS (SELECT et, day,
               CAST(sum(v) OVER (PARTITION BY et ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cv,
               CAST(row_number() OVER (PARTITION BY et ORDER BY day)
                    AS BIGINT) AS k
        FROM daily),
s AS (SELECT c.et, c.day, t.n_days, t.total,
             abs(t.n_days * c.cv - c.k * t.total) AS s_abs
      FROM cum c JOIN tot t ON c.et = t.et),
rk AS (SELECT *, row_number() OVER (PARTITION BY et
                                    ORDER BY s_abs DESC, day) AS rn FROM s)
SELECT et AS {type_col}, day AS cp_day, CAST(s_abs AS BIGINT) AS s_abs,
       n_days, total
FROM rk WHERE rn = 1"""


def runs_test_daily(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-type Wald–Wolfowitz runs test over the daily-count series
    (EXT-ANALYTICS/EXT-ANOM): are days above/below the series median
    RANDOMLY interleaved, or do they clump (regime behavior, batch
    traffic) / alternate (load-balancer ping-pong)? The randomness
    screen next to x117's autocorrelation and x129's trend test —
    sensitive to structure neither catches (a perfectly trend-free,
    autocorrelation-free series can still fail the runs test).

    Integer-exact algebra: the median never materializes as a fraction —
    m2 = v_(⌈n/2⌉) + v_(⌈(n+1)/2⌉) is TWICE the median as an exact
    int64, days classify by sign(2v − m2) and exact-median days drop
    (the textbook treatment). The run count R, n1, n2 and m = 2·n1·n2
    are exact int64; only the final z = (R − (1 + m/N)) /
    sqrt(m(m−N)/(N²(N−1))) is one deterministic IEEE expression over
    exact integers, rounded to 4 (0.0 when either side is empty or the
    variance is 0 — mirrored in the oracle, the mann_kendall z=0
    convention).

    Plan: the daily aggregate shares the series family's type-keyed
    exchange; every window and join runs on |types|·|days| rows —
    calendar-bounded at any corpus scale.

    Returns ``(event_type, n1, n2, runs, z)`` — one row per type."""
    daily = (
        events.select(
            F.col(type_col).alias("et"),
            F.expr(f"unix_micros(CAST({ts_col} AS timestamp)) div 86400000000")
            .alias("day"),
        )
        .filter(F.col("day").isNotNull())
        .groupBy("et", "day")
        .agg(F.count("*").cast("long").alias("v"))
    )
    wv = Window.partitionBy("et").orderBy("v", "day")
    tot = daily.groupBy("et").agg(F.count("*").cast("long").alias("n"))
    ranked = daily.select(
        "et", "v", F.row_number().over(wv).cast("long").alias("rn")
    ).join(F.broadcast(tot), "et")  # bounded: one row per event type
    m2 = ranked.groupBy("et").agg(
        (
            F.sum(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("v")).otherwise(0)
            )
            + F.sum(
                F.when(F.col("rn") == F.expr("(n + 2) div 2"), F.col("v")).otherwise(0)
            )
        )
        .cast("long")
        .alias("m2")
    )
    signed = (
        daily.join(F.broadcast(m2), "et")  # bounded: one row per event type
        .filter(2 * F.col("v") != F.col("m2"))
        .select(
            "et", "day",
            F.signum(2 * F.col("v") - F.col("m2")).cast("long").alias("s"),
        )
    )
    wd = Window.partitionBy("et").orderBy("day")
    flips = signed.select(
        "et", "s",
        F.when(F.lag("s").over(wd).isNull(), 0)
        .when(F.lag("s").over(wd) != F.col("s"), 1)
        .otherwise(0)
        .alias("flip"),
    )
    acc = flips.groupBy(F.col("et").alias(type_col)).agg(
        F.sum(F.when(F.col("s") > 0, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("s") < 0, 1).otherwise(0)).cast("long").alias("n2"),
        (F.lit(1) + F.sum("flip")).cast("long").alias("runs"),
    )
    m = (2 * F.col("n1") * F.col("n2")).cast("long")
    big_n = (F.col("n1") + F.col("n2")).cast("long")
    z = (
        F.col("runs").cast("double")
        - (F.lit(1.0) + m.cast("double") / big_n.cast("double"))
    ) / F.sqrt(
        (m.cast("double") * (m - big_n).cast("double"))
        / (
            big_n.cast("double")
            * big_n.cast("double")
            * (big_n - 1).cast("double")
        )
    )
    return acc.select(
        type_col, "n1", "n2", "runs",
        F.when(
            (F.col("n1") == 0) | (F.col("n2") == 0) | (m - big_n <= 0),
            F.lit(0.0),
        )
        .otherwise(F.round(z, 4))
        .alias("z"),
    )


def runs_test_daily_sql(events_cte: str, type_col: str = "event_type") -> str:
    """DuckDB oracle for :func:`runs_test_daily`; ``events_cte`` must
    yield ``(et, us)``."""
    return f"""WITH e AS ({events_cte}),
daily AS (SELECT et, us // 86400000000 AS day,
                 CAST(count(*) AS BIGINT) AS v
          FROM e WHERE us IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT et, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY et),
ranked AS (SELECT daily.et, v,
                  CAST(row_number() OVER (PARTITION BY daily.et
                                          ORDER BY v, day) AS BIGINT) AS rn,
                  n
           FROM daily JOIN tot ON daily.et = tot.et),
m2t AS (SELECT et,
               CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN v ELSE 0 END)
                    + sum(CASE WHEN rn = (n + 2) // 2 THEN v ELSE 0 END)
                    AS BIGINT) AS m2
        FROM ranked GROUP BY et),
signed AS (SELECT daily.et, day,
                  CAST(sign(2 * v - m2) AS BIGINT) AS s
           FROM daily JOIN m2t ON daily.et = m2t.et
           WHERE 2 * v <> m2),
flips AS (SELECT et, s,
                 CASE WHEN lag(s) OVER (PARTITION BY et ORDER BY day) IS NULL
                      THEN 0
                      WHEN lag(s) OVER (PARTITION BY et ORDER BY day) <> s
                      THEN 1 ELSE 0 END AS flip
          FROM signed),
acc AS (SELECT et AS {type_col},
               CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(1 + sum(flip) AS BIGINT) AS runs
        FROM flips GROUP BY et)
SELECT {type_col}, n1, n2, runs,
       CASE WHEN n1 = 0 OR n2 = 0 OR 2 * n1 * n2 - (n1 + n2) <= 0 THEN 0.0
            ELSE round(
                (CAST(runs AS DOUBLE)
                 - (1.0 + CAST(2 * n1 * n2 AS DOUBLE)
                          / CAST(n1 + n2 AS DOUBLE)))
                / sqrt((CAST(2 * n1 * n2 AS DOUBLE)
                        * CAST(2 * n1 * n2 - (n1 + n2) AS DOUBLE))
                       / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                          * CAST(n1 + n2 - 1 AS DOUBLE))), 4)
       END AS z
FROM acc"""


def ordinal_patterns_daily(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-type ordinal-pattern histogram (order-3 permutation-entropy
    support, Bandt & Pompe 2002) over the daily-count series
    (EXT-ANALYTICS): every 3 consecutive OBSERVED days (sequence
    positions, not calendar gaps — documented contract) maps to one of
    6 rank patterns; organic traffic spreads mass across patterns,
    templated/batch traffic collapses onto the monotone two. The
    pattern histogram is the series-shape fingerprint the moment-based
    screens (x117/x129/x149) can't see.

    Integer-exact: ranks use the position-stable tie rule r_i counted
    with <= for earlier positions (every rank an exact 0..2 int, every
    pattern the exact 3-digit code r1·100 + r2·10 + r3); no floats
    anywhere.

    Plan: two lead() windows on the series family's shared type-keyed
    exchange, then a (type, pattern) map-side-combined aggregate —
    ≤ |types|·6 rows out, series calendar-bounded.

    Returns ``(event_type, pattern, n_windows)``."""
    daily = (
        events.select(
            F.col(type_col).alias("et"),
            F.expr(f"unix_micros(CAST({ts_col} AS timestamp)) div 86400000000")
            .alias("day"),
        )
        .filter(F.col("day").isNotNull())
        .groupBy("et", "day")
        .agg(F.count("*").cast("long").alias("v"))
    )
    w = Window.partitionBy("et").orderBy("day")
    tri = daily.select(
        "et",
        F.col("v").alias("v1"),
        F.lead("v", 1).over(w).alias("v2"),
        F.lead("v", 2).over(w).alias("v3"),
    ).filter(F.col("v3").isNotNull())
    r1 = (F.col("v2") < F.col("v1")).cast("long") + (
        F.col("v3") < F.col("v1")
    ).cast("long")
    r2 = (F.col("v1") <= F.col("v2")).cast("long") + (
        F.col("v3") < F.col("v2")
    ).cast("long")
    r3 = (F.col("v1") <= F.col("v3")).cast("long") + (
        F.col("v2") <= F.col("v3")
    ).cast("long")
    return (
        tri.select(
            "et", (r1 * 100 + r2 * 10 + r3).cast("long").alias("pattern")
        )
        .groupBy(F.col("et").alias(type_col), "pattern")
        .agg(F.count("*").cast("long").alias("n_windows"))
    )


def ordinal_patterns_daily_sql(
    events_cte: str, type_col: str = "event_type"
) -> str:
    """DuckDB oracle for :func:`ordinal_patterns_daily`; ``events_cte``
    must yield ``(et, us)``."""
    return f"""WITH e AS ({events_cte}),
daily AS (SELECT et, us // 86400000000 AS day,
                 CAST(count(*) AS BIGINT) AS v
          FROM e WHERE us IS NOT NULL GROUP BY 1, 2),
tri AS (SELECT et, v AS v1,
               lead(v, 1) OVER (PARTITION BY et ORDER BY day) AS v2,
               lead(v, 2) OVER (PARTITION BY et ORDER BY day) AS v3
        FROM daily),
pat AS (SELECT et,
               CAST((CASE WHEN v2 < v1 THEN 1 ELSE 0 END
                     + CASE WHEN v3 < v1 THEN 1 ELSE 0 END) * 100
                    + (CASE WHEN v1 <= v2 THEN 1 ELSE 0 END
                       + CASE WHEN v3 < v2 THEN 1 ELSE 0 END) * 10
                    + (CASE WHEN v1 <= v3 THEN 1 ELSE 0 END
                       + CASE WHEN v2 <= v3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pattern
        FROM tri WHERE v3 IS NOT NULL)
SELECT et AS {type_col}, pattern, CAST(count(*) AS BIGINT) AS n_windows
FROM pat GROUP BY 1, 2"""


#: The 6 valid order-3 ordinal pattern codes (permutations of ranks
#: 0..2 under ordinal_patterns_daily's position-stable tie rule,
#: rendered as r1·100 + r2·10 + r3).
PE_CODES = (12, 21, 102, 120, 201, 210)


def permutation_entropy_daily(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-type normalized permutation entropy (Bandt & Pompe 2002, the
    statistic the x150 ordinal-pattern histogram exists to support):
    H = ln(N) − Σ nᵢ·ln(nᵢ)/N over the 6 order-3 pattern counts,
    normalized by ln(6) to [0, 1] — 1 = the maximally irregular series,
    0 = a single repeated shape (pure monotone/templated traffic). The
    one-number series-complexity score next to the runs test's
    clustering z (x149).

    Determinism: the 6 counts pivot into FIXED named columns, so the
    ln-term chain is one textual expression evaluated in the same
    left-to-right order by both engines (the x129/x149 rounded-IEEE
    convention; round 4 absorbs libm ln ulp skew). Zero counts
    contribute exactly 0 via the guard, never ln(0).

    Plan: rides the x150 histogram (two lead() windows on the shared
    type-keyed day-series exchange) plus one ≤|types|·6-row pivot
    aggregate. Returns ``(event_type, n_win, pe)``."""
    hist = ordinal_patterns_daily(events, ts_col, type_col)
    ncols = [
        F.sum(
            F.when(F.col("pattern") == c, F.col("n_windows")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias(f"n{i}")
        for i, c in enumerate(PE_CODES)
    ]
    agg = hist.groupBy(type_col).agg(
        *ncols, F.sum("n_windows").cast("long").alias("n_win")
    )

    def term(i: int):
        nd = F.col(f"n{i}").cast("double")
        return F.when(F.col(f"n{i}") > 0, nd * F.log(nd)).otherwise(F.lit(0.0))

    chain = term(0)
    for i in range(1, len(PE_CODES)):
        chain = chain + term(i)
    nw = F.col("n_win").cast("double")
    pe = F.round((F.log(nw) - chain / nw) / F.log(F.lit(6.0)), 4)
    return agg.select(type_col, "n_win", pe.alias("pe"))


def permutation_entropy_daily_sql(
    events_cte: str, type_col: str = "event_type"
) -> str:
    """DuckDB oracle for :func:`permutation_entropy_daily` — identical
    pivot columns and term chain in the same textual order."""
    hist = ordinal_patterns_daily_sql(events_cte, type_col)
    ns = ",\n       ".join(
        f"CAST(sum(CASE WHEN pattern = {c} THEN n_windows ELSE 0 END)"
        f" AS BIGINT) AS n{i}"
        for i, c in enumerate(PE_CODES)
    )
    chain = "\n         + ".join(
        f"CASE WHEN n{i} > 0 THEN CAST(n{i} AS DOUBLE)"
        f" * ln(CAST(n{i} AS DOUBLE)) ELSE 0.0 END"
        for i in range(len(PE_CODES))
    )
    return f"""WITH hist AS (SELECT * FROM ({hist}) z),
agg AS (SELECT {type_col},
       {ns},
       CAST(sum(n_windows) AS BIGINT) AS n_win
       FROM hist GROUP BY {type_col})
SELECT {type_col}, n_win,
       round((ln(CAST(n_win AS DOUBLE)) - ({chain}
         ) / CAST(n_win AS DOUBLE)) / ln(6.0), 4) AS pe
FROM agg"""


def spearman_daily(
    orders: DataFrame,
    ts_col: str = "o_orderdate",
    price_col: str = "o_totalprice",
) -> DataFrame:
    """Spearman rank correlation between the daily ORDER-COUNT series and
    the daily REVENUE-CENTS series (EXT-ANALYTICS): "do busy days earn
    proportionally more" measured on ranks, so one whale order can't fake
    the relationship the way it can for Pearson — the monotone-association
    probe next to x117's lag autocorrelation (same day-series base).

    Integer-exact algebra: both rank vectors are DETERMINISTIC permutations
    (row_number ordered by value with day as tiebreak — the textbook
    mid-rank tie treatment would introduce .5 fractions; the deterministic
    variant keeps every intermediate an exact int64 and is documented as
    the operator's contract), so Σd² is an exact int64 (≤ n³/3 with
    n = |days| ≈ 2.4k — bounded by the CALENDAR at any corpus scale) and
    ρ = 1 − 6Σd²/(n(n²−1)) is ONE deterministic IEEE expression over two
    exact integers, rounded to 4. Revenue rides half-up cents (the x118
    convention), summed exactly in int64.

    Plan: one day-keyed partial-aggregated groupBy of the scan; the rank
    windows and the final 1-row reduce run on the |days|-row series, which
    is broadcast-sized by construction at any corpus scale.

    Returns ``(n_days, sum_d2, rho)`` — a single row."""
    daily = (
        orders.select(
            F.expr(f"unix_micros(CAST({ts_col} AS timestamp)) div 86400000000")
            .alias("day"),
            F.floor(F.col(price_col) * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .filter(F.col("day").isNotNull())
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("cents").cast("long").alias("rev"),
        )
    )
    r1 = Window.orderBy("cnt", "day")
    r2 = Window.orderBy("rev", "day")
    ranked = daily.select(
        F.row_number().over(r1).cast("long").alias("ra"),
        F.row_number().over(r2).cast("long").alias("rb"),
    )
    d2 = (F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))
    return ranked.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(d2).cast("long").alias("sum_d2"),
    ).select(
        "n_days", "sum_d2",
        F.round(
            F.lit(1.0)
            - (F.lit(6.0) * F.col("sum_d2").cast("double"))
            / (
                F.col("n_days").cast("double")
                * (F.col("n_days") * F.col("n_days") - F.lit(1)).cast("double")
            ),
            4,
        ).alias("rho"),
    )


def spearman_daily_sql(rows_cte: str) -> str:
    """DuckDB oracle for :func:`spearman_daily`; ``rows_cte`` must yield
    ``(day, cents)`` pre-aggregation rows."""
    return f"""WITH raw AS ({rows_cte}),
daily AS (SELECT day, CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(cents) AS BIGINT) AS rev
          FROM raw WHERE day IS NOT NULL GROUP BY day),
ranked AS (SELECT CAST(row_number() OVER (ORDER BY cnt, day) AS BIGINT) AS ra,
                  CAST(row_number() OVER (ORDER BY rev, day) AS BIGINT) AS rb
           FROM daily),
acc AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2
        FROM ranked)
SELECT n_days, sum_d2,
       round(1.0 - (6.0 * CAST(sum_d2 AS DOUBLE))
             / (CAST(n_days AS DOUBLE)
                * CAST(n_days * n_days - 1 AS DOUBLE)), 4) AS rho
FROM acc"""


def _daily_counts(df: DataFrame, ts_col: str) -> DataFrame:
    """The shared (day, v) daily row-count series base of the day-series
    analytics family (x117 autocorr / x126 Spearman / x129 Mann-Kendall /
    x130 Theil-Sen): one partial-aggregated groupBy of the scan; the
    result is |days| rows — bounded by the CALENDAR, not the corpus —
    so every downstream pass is broadcast-sized by construction."""
    return (
        df.select(
            F.expr(f"unix_micros(CAST({ts_col} AS timestamp)) div 86400000000")
            .alias("day"),
        )
        .filter(F.col("day").isNotNull())
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("v"))
    )


_DAILY_SQL = """daily AS (SELECT day, CAST(count(*) AS BIGINT) AS v
          FROM raw WHERE day IS NOT NULL GROUP BY day)"""


def mann_kendall_daily(df: DataFrame, ts_col: str = "o_orderdate") -> DataFrame:
    """Mann–Kendall trend test over the daily row-count series
    (EXT-ANALYTICS): S = Σ_{i<j} sign(v_j − v_i) — the nonparametric
    "is this series trending" complement to x103's parametric OLS slope
    and x126's rank correlation: no linearity assumption, robust to
    outliers, exact under ties.

    Integer-exact algebra: S is a sum of {-1,0,1} over the ordered day
    pairs (exact int64); the tie-corrected variance is kept SCALED —
    var18 = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5), i.e. 18·Var(S) —
    so it is a plain int64 at any calendar length (n = 2 400 days →
    var18 ≈ 2.8·10¹⁰). Only the final continuity-corrected z =
    (S ∓ 1)/sqrt(var18/18) is ONE deterministic IEEE expression over
    the two exact integers, rounded to 4.

    Plan: the day-pair self-join and every aggregate run on the |days|-
    row series (≤ ~3M pairs forever — calendar², corpus-independent).

    Returns ``(n_days, s_stat, var18, z)`` — a single row."""
    daily = _daily_counts(df, ts_col)
    a = daily.select(F.col("day").alias("da"), F.col("v").alias("va"))
    b = daily.select(F.col("day").alias("db"), F.col("v").alias("vb"))
    s = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(F.signum(F.col("vb") - F.col("va")).cast("long"))
            .cast("long")
            .alias("s_stat")
        )
    )
    nrow = daily.agg(F.count("*").cast("long").alias("n"))
    ties = (
        daily.groupBy("v")
        .agg(F.count("*").cast("long").alias("t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie18")
        )
    )
    z_abs = (
        (F.abs(F.col("s_stat")) - F.lit(1)).cast("double")
        / F.sqrt((F.col("var18")).cast("double") / F.lit(18.0))
    )
    # bounded: three 1-row aggregates combined
    return (
        s.join(F.broadcast(nrow))
        .join(F.broadcast(ties))
        .select(
            F.col("n").alias("n_days"),
            "s_stat",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie18")
            )
            .cast("long")
            .alias("var18"),
        )
        .select(
            "n_days", "s_stat", "var18",
            F.when(F.col("s_stat") == 0, F.lit(0.0))
            .otherwise(
                F.round(F.signum(F.col("s_stat")) * z_abs, 4)
            )
            .alias("z"),
        )
    )


def mann_kendall_daily_sql(rows_cte: str) -> str:
    """DuckDB oracle for :func:`mann_kendall_daily`; ``rows_cte`` must
    yield ``day`` rows."""
    return f"""WITH raw AS ({rows_cte}),
{_DAILY_SQL},
s AS (SELECT CAST(sum(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON a.day < b.day),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
ties AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                AS tie18
         FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY v)),
acc AS (SELECT n.n AS n_days, s.s_stat,
               CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie18 AS BIGINT)
               AS var18
        FROM s, n, ties)
SELECT n_days, s_stat, var18,
       CASE WHEN s_stat = 0 THEN 0.0
            ELSE round(CAST(sign(s_stat) AS DOUBLE)
                       * (CAST(abs(s_stat) - 1 AS DOUBLE)
                          / sqrt(CAST(var18 AS DOUBLE) / 18.0)), 4)
       END AS z
FROM acc"""


def theil_sen_daily(df: DataFrame, ts_col: str = "o_orderdate") -> DataFrame:
    """Theil–Sen robust trend slope over the daily row-count series
    (EXT-ANALYTICS): the MEDIAN of all pairwise slopes
    (v_j − v_i)/(d_j − d_i), i < j — up to ~29% contaminated days cannot
    move it (OLS x103 breaks at one outlier), the standard robust rate
    estimate for "how fast is traffic actually growing".

    Integer-exact algebra: each pairwise slope is kept as per-mille
    slope_milli = (1000·Δv) div Δd — integer division TRUNCATING TOWARD
    ZERO, which Spark's ``div`` and DuckDB's ``//`` both implement for
    negative numerators (probed, not assumed) — and the median is the
    deterministic upper median (CDF position ⌊n/2⌋+1) located on the
    (slope value → pair count) CDF, so both engines pick the identical
    integer. Δd > 0 always (pairs are day-ordered).

    Plan: the pair join and CDF run on the |days|-row series (calendar-
    bounded; ≤ ~3M pairs forever); the CDF window is single-partition
    over ≤ |distinct slopes| rows, the p2/x111 trade.

    Returns ``(n_days, n_pairs, slope_milli)`` — a single row."""
    daily = _daily_counts(df, ts_col)
    a = daily.select(F.col("day").alias("da"), F.col("v").alias("va"))
    b = daily.select(F.col("day").alias("db"), F.col("v").alias("vb"))
    slopes = (
        a.join(b, F.col("da") < F.col("db"))
        .select(
            F.expr("(1000 * (vb - va)) div (db - da)").alias("sm")
        )
        .groupBy("sm")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = Window.orderBy("sm").rowsBetween(Window.unboundedPreceding, 0)
    cdf = slopes.select(
        "sm", F.sum("c").over(w).cast("long").alias("cum")
    )
    tot = slopes.agg(
        F.sum("c").cast("long").alias("n_pairs"),
    )
    nrow = daily.agg(F.count("*").cast("long").alias("n_days"))
    # bounded: 1-row totals broadcast into the ≤|distinct-slope| CDF
    med = (
        cdf.join(F.broadcast(tot))
        .filter(F.col("cum") >= (F.col("n_pairs") + 1) / 2)
        .agg(F.min("sm").cast("long").alias("slope_milli"))
    )
    return (
        nrow.join(F.broadcast(tot))  # bounded: 1-row totals
        .join(F.broadcast(med))  # bounded: 1-row median
        .select("n_days", "n_pairs", "slope_milli")
    )


def theil_sen_daily_sql(rows_cte: str) -> str:
    """DuckDB oracle for :func:`theil_sen_daily`; ``rows_cte`` must yield
    ``day`` rows."""
    return f"""WITH raw AS ({rows_cte}),
{_DAILY_SQL},
slopes AS (SELECT (1000 * (b.v - a.v)) // (b.day - a.day) AS sm,
                  CAST(count(*) AS BIGINT) AS c
           FROM daily a JOIN daily b ON a.day < b.day GROUP BY 1),
cdf AS (SELECT sm, CAST(sum(c) OVER (ORDER BY sm
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum
        FROM slopes),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_pairs FROM slopes),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
med AS (SELECT CAST(min(sm) AS BIGINT) AS slope_milli
        FROM cdf, tot WHERE cum >= (n_pairs + 1) / 2)
SELECT n.n_days, tot.n_pairs, med.slope_milli FROM n, tot, med"""


def interarrival_burstiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user inter-arrival burstiness (EXT-ANALYTICS/EXT-ANOM): the
    squared coefficient of variation of the gaps between a user's
    consecutive events, in integer milli — CV² ≈ 1000 is Poisson
    (memoryless), far above is bursty (bot bursts, retry storms), far
    below is metronomic (cron traffic). The behavioral-shape screen next
    to x116's sessionize (which counts sessions, not their rhythm).

    Integer-exact algebra: gaps quantize to whole SECONDS ((Δµs) div
    10⁶, truncation identical in both engines), so n·Σg² stays inside
    int64 for month-scale user spans with thousands of events
    (g ≤ 2.6·10⁶ s/month → g² ≤ 6.8·10¹²; 10³ gaps → 10³·n·Σg² ≈
    6.8·10¹⁸ < 2^63 at the 1000× milli rescale — quantize to minutes
    past that). cv2_milli = (1000·n·Σg²) div (Σg)², exact integer
    division; NULL when every gap is zero (sub-second burst — CV
    undefined).

    Plan: one user-keyed exchange carries the lag window AND the final
    per-user aggregate (the x62/x116 shared-exchange shape).

    Returns ``(user_id, n_gaps, sum_g, sum_g2, cv2_milli)`` for users
    with ≥ 2 events."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        events.select(
            F.col(user_col).alias("u"),
            ((us - F.lag(us).over(w)) / F.lit(1_000_000))
            .cast("long")
            .alias("g_f"),
        )
        .filter(F.col("g_f").isNotNull())
        .select("u", F.col("g_f").alias("g"))
    )
    return (
        gaps.groupBy(F.col("u").alias(user_col))
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.sum("g").cast("long").alias("sum_g"),
            F.sum(F.col("g") * F.col("g")).cast("long").alias("sum_g2"),
        )
        .select(
            user_col, "n_gaps", "sum_g", "sum_g2",
            # overflow guard (ADVICE r8): past the documented bound
            # (≳10⁴ month-span gaps) 1000·n·Σg² exceeds int64 — Spark
            # wraps silently where DuckDB raises, so without the guard
            # the failure mode is a silent diverging value. NULL the
            # user in BOTH engines instead: Σg² ≤ MAXI64 div (1000·n)
            # (1000·n itself cannot overflow: n < 2^53 events) and
            # Σg ≤ isqrt(MAXI64) for the (Σg)² term.
            F.when(
                (F.col("sum_g") > 0)
                & (F.col("sum_g") <= F.lit(3037000499))
                & (
                    F.col("sum_g2")
                    <= F.expr(
                        "9223372036854775807 DIV (1000 * n_gaps)"
                    )
                ),
                F.expr(
                    "CAST((1000 * n_gaps * sum_g2) DIV (sum_g * sum_g)"
                    " AS BIGINT)"
                ),
            ).alias("cv2_milli"),
        )
    )


def interarrival_burstiness_sql(
    events_cte: str, user_col: str = "user_id"
) -> str:
    """DuckDB oracle for :func:`interarrival_burstiness`; ``events_cte``
    must yield ``(u, us, eid)``."""
    return f"""WITH e AS ({events_cte}),
gaps AS (SELECT u,
                CAST((us - lag(us) OVER (PARTITION BY u
                                         ORDER BY us, eid)) // 1000000
                     AS BIGINT) AS g
         FROM e),
acc AS (SELECT u, CAST(count(*) AS BIGINT) AS n_gaps,
               CAST(sum(g) AS BIGINT) AS sum_g,
               CAST(sum(g * g) AS BIGINT) AS sum_g2
        FROM gaps WHERE g IS NOT NULL GROUP BY u)
SELECT u AS {user_col}, n_gaps, sum_g, sum_g2,
       CASE WHEN sum_g > 0
             AND sum_g <= 3037000499
             AND sum_g2 <= 9223372036854775807 // (1000 * n_gaps)
            THEN (1000 * n_gaps * sum_g2) // (sum_g * sum_g)
            ELSE NULL END AS cv2_milli
FROM acc"""
