"""Physical-plan inspection helpers — the engine's scale contract, testable.

The 100 TB design notes in SURVEY §4 reduce to assertions a plan either
satisfies or doesn't: filters reach the scan (``PushedFilters``), the scan
reads only what the projection needs (``ReadSchema``), small build sides
broadcast instead of shuffling, Python appears only where the operator
contract says it may, and the shuffle count matches the algorithm's minimum.
tests/test_plans.py pins these for the headline queries so a regression
shows up as a failing test, not as a 10× bench slowdown three rounds later.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same text .explain prints
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def final_adaptive_plan(df: DataFrame) -> str:
    """Execute ``df`` and return ONLY the final-plan section of its
    executed plan. AQE's runtime join re-planning (sort-merge →
    broadcast conversion once the build side's true size is known) is
    invisible in every pre-execution explain — the static text is
    ``AdaptiveSparkPlan isFinalPlan=false`` over the INITIAL plan, which
    is exactly how the r8 q2-class pins passed while unable to
    distinguish a converted broadcast from a shuffle regression (VERDICT
    r8 'What's wrong #1'). After the action, ``executedPlan.toString``
    prints ``== Final Plan ==`` followed by ``== Initial Plan ==``; the
    initial section is dropped so a ``SortMergeJoin`` that AQE replaced
    cannot satisfy (or trip) an assertion."""
    df.collect()
    text = simple_plan(df)
    assert "isFinalPlan=true" in text, "plan did not finalize — no action ran?"
    return text.split("== Initial Plan ==", 1)[0]


def shuffle_joins_on_key(plan_text: str, key_prefix: str) -> list[str]:
    """Lines in ``plan_text`` where a shuffle join (SortMergeJoin /
    ShuffledHashJoin) carries a join key starting with ``key_prefix``
    (e.g. ``s_suppkey``) — the witness that a dimension-keyed join
    regressed off the broadcast path. Join keys print on the node line
    itself (``SortMergeJoin [l_suppkey#2L], [s_suppkey#47L], Inner``), so
    a line scan is exact; the attribute-id suffix (``#47L``) is why the
    match anchors on ``<key>#`` rather than equality, and the left
    boundary exists because plain containment also matched OTHER columns
    ending in the key (``ps_suppkey`` contains ``s_suppkey`` — a
    legitimate partsupp-keyed shuffle join would false-trip the supplier
    pins; ADVICE r9)."""
    pat = key_pattern(key_prefix)
    return [
        ln
        for ln in plan_text.split("\n")
        if ("SortMergeJoin" in ln or "ShuffledHashJoin" in ln)
        and pat.search(ln)
    ]


def key_pattern(key_prefix: str) -> re.Pattern:
    """The ONE boundary-anchored plan-text column matcher (``<key>#`` with
    a left letter/underscore boundary) — shared by
    :func:`shuffle_joins_on_key` and the broadcast-side scans in
    tests/test_aqe_broadcast_pins.py so the two rules cannot drift
    (review r10: the test had grown a private copy)."""
    return re.compile(r"(?<![A-Za-z_])" + re.escape(key_prefix) + r"#")


def _split_top_level(s: str) -> list[str]:
    """Split on commas at bracket depth 0 — ``GreaterThan(a,b)`` and
    ``In(col, [v1,v2])`` stay whole, ``struct<a:int,b:int>`` fields don't
    leak across type parameters."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


def _bracketed(text: str, open_idx: int, open_ch: str, close_ch: str) -> str:
    """The content between the bracket at ``open_idx`` and its MATCHING
    close — a greedy/first-close regex truncates at the first nested
    terminator (the bug that hid pruning regressions behind nested
    struct/array types)."""
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == open_ch:
            depth += 1
        elif text[i] == close_ch:
            depth -= 1
            if depth == 0:
                return text[open_idx + 1 : i]
    return text[open_idx + 1 :]


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet/DSv2 scan, one WHOLE
    predicate per element (depth-aware: binary filters and In-lists are
    not fragmented at their internal commas)."""
    text = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[", text):
        body = _bracketed(text, m.end() - 1, "[", "]")
        out.extend(_split_top_level(body))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Union of column names the scans actually read (column pruning
    check). Bracket-matched: a nested/parameterized field type
    (``struct<...>``, ``array<...>``, ``map<...>``) must not swallow the
    columns after it."""
    text = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<", text):
        body = _bracketed(text, m.end() - 1, "<", ">")
        for fieldspec in _split_top_level(body):
            name = fieldspec.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


#: shuffle partitionings an Exchange node can carry. Broadcast exchanges
#: (``BroadcastExchange`` nodes / ``HashedRelationBroadcastMode``) are
#: deliberately NOT shuffles and must not count.
_SHUFFLE_PARTITIONINGS = ("hashpartitioning", "rangepartitioning", "SinglePartition")


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan — hash, range AND single-partition
    (a global agg/limit that regresses into an extra shuffle counts).

    Formatted mode prints the node as ``(3) Exchange`` with the
    partitioning on a separate ``Arguments: hashpartitioning(...)`` line —
    the node header and its partitioning NEVER share a line, so substring
    counting on ``"Exchange hashpartitioning"`` is always 0 (the r5
    vacuous-zero bug). Parse the node-detail blocks instead: a block whose
    header is an ``Exchange`` node counts iff its Arguments line starts
    with a shuffle partitioning.
    """
    text = formatted_plan(df)
    count = 0
    node_header = re.compile(r"^\(\d+\) Exchange\b")
    for block in re.split(r"\n\s*\n", text):
        lines = block.lstrip("\n").split("\n")
        if not lines or not node_header.match(lines[0].strip()):
            continue
        for line in lines[1:]:
            line = line.strip()
            if line.startswith("Arguments: "):
                arg = line[len("Arguments: ") :]
                if arg.startswith(_SHUFFLE_PARTITIONINGS):
                    count += 1
                break
    return count


def broadcast_join_count(df: DataFrame) -> int:
    """Broadcast hash joins in the plan, counted on the numbered node
    headers only — formatted mode prints every node TWICE (once in the
    tree summary, once as a detail block), so a raw substring count
    reports 2× the truth."""
    return len(re.findall(r"^\(\d+\) BroadcastHashJoin\b", formatted_plan(df), re.MULTILINE))


def broadcast_build_subtrees(df: DataFrame) -> list[str]:
    """The plan-text subtree under each ``BroadcastExchange`` node — i.e.
    what the plan proposes to MATERIALIZE ON EVERY EXECUTOR. The r7 x120
    defect class (VERDICT r7 'What's wrong #1') is a broadcast hint on an
    unbounded side: the hint site looks symmetrical in the Python, and only
    the plan shows which relation actually became the build side. Tests
    assert each subtree contains a boundedness witness (a
    ``TakeOrderedAndProject``/``Limit`` for top-k builds, ``keys=[]`` for
    1-row scalar aggregates) so an unbounded build side fails loudly.

    Parses the executedPlan tree text by indentation: a node's subtree is
    the following lines whose tree-prefix depth is strictly greater, up to
    the first line at the same or shallower depth.
    """
    lines = simple_plan(df).split("\n")

    def depth(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-"))

    out: list[str] = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = depth(line)
        sub: list[str] = []
        for nxt in lines[i + 1 :]:
            if nxt.strip() and depth(nxt) <= d:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


#: every plan-node name that executes Python. ``FlatMapCoGroupsInPandas``
#: does NOT contain the substring ``FlatMapGroupsInPandas`` (the ``Co``
#: breaks it) and must be listed separately; none of these is a substring
#: of another, so summing counts never double-counts.
_PYTHON_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInPandas",
    "PythonMapInArrow",
)


def python_eval_count(df: DataFrame) -> int:
    """Python-executed operators in the plan (row UDFs, pandas UDFs, the
    grouped/cogrouped/iterator Arrow forms, mapInArrow). The hot-path
    contract: zero unless the operator is explicitly UDF-tier (OP-31
    normalize, multimodal decode, grouped threading, BLAS kernels).
    Counted on numbered node headers only — formatted mode prints every
    node twice (tree summary + detail block) — and EXCLUDING nodes that
    appear only under an ``== Initial Plan ==`` branch: a MATERIALIZED
    cached relation prints its AdaptiveSparkPlan twice (final + initial),
    so without the exclusion the same kernel counts once per print and
    the result depends on whether the cache happens to be materialized."""
    text = formatted_plan(df)
    tree_lines = text.split("== Physical Plan ==", 1)[-1].splitlines()
    # Walk the TREE section (it ends where the "(N) NodeName" detail
    # blocks begin) with an indent stack of active Initial-Plan branches;
    # id-based exclusion is impossible because Spark REUSES a node's id
    # between the final and initial prints of the same adaptive plan.
    # Distinct ids outside initial branches preserve the original
    # detail-header semantics (a node referenced twice counts once).
    final_ids: set[str] = set()
    initial_indents: list[int] = []
    marker_re = re.compile(
        r"\b(" + "|".join(_PYTHON_MARKERS) + r") \((\d+)\)"
    )
    for line in tree_lines:
        if re.match(r"^\(\d+\) ", line):
            break  # detail section begins
        if not line.strip():
            continue
        # space-only indent: initial-plan children print WITHOUT a "+-"
        # connector, so stripping tree glyphs would misplace them
        indent = len(line) - len(line.lstrip(" "))
        while initial_indents and indent <= initial_indents[-1]:
            initial_indents.pop()
        if "== Initial Plan ==" in line:
            initial_indents.append(indent)
            continue
        if initial_indents:
            continue
        m = marker_re.search(line)
        if m:
            final_ids.add(m.group(2))
    return len(final_ids)
