"""Market-basket co-occurrence mining: association lift over (basket,
item) pairs — the classic retail-analytics kernel the reference's
migrated schema (orders → lineitem) exists to serve downstream.

Scale shape: the pair generator is a per-basket self-join, so its output
is bounded by Σ |basket|² — with bounded basket sizes (≤ 7 lines per
order in this schema) that is LINEAR in the fact table, not quadratic in
the catalog. Marginals are one groupBy on item; the basket total is a
1-row scalar cross-joined (the audit-module totals pattern — no
``collect`` round-trip, the plan stays fully distributed); the final
top-k compiles to TakeOrderedAndProject (per-partition partial top-k,
no global sort).

Lift stays engine-exact: every count is < 2^53 so its double cast is
exact, the two IEEE products and the one division are correctly rounded
the same way in both engines — same bits in Spark and the DuckDB
oracle, so ordering and selection at the top-k boundary cannot diverge
(and, unlike BIGINT products, the doubles cannot overflow at 10^10+
baskets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pairs(
    baskets: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """One ``(a, b)`` row per basket that contains BOTH items, a < b —
    the shared co-occurrence generator behind association lift (pair
    counts) and the co-purchase graph (x85 triangles, which deduplicates
    downstream). Output volume is Σ |basket|²/2, linear in the fact
    table when basket sizes are bounded."""
    items = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    return (
        items.alias("x")
        .join(items.alias("y"), "b")
        .filter(F.col("x.i") < F.col("y.i"))
        .select(F.col("x.i").alias("a"), F.col("y.i").alias("b"))
    )


def cooc_pairs_sql(table: str, basket_col: str, item_col: str) -> str:
    """DuckDB mirror of :func:`cooccurrence_pairs` — the ONE oracle-side
    rendering of the per-basket self-join, shared by the x85 edge CTE
    and the x90 pair-count CTE so the construction cannot drift."""
    return f"""SELECT x.i AS a, y.i AS b
FROM (SELECT DISTINCT {basket_col} AS bk, {item_col} AS i FROM {table}) x
JOIN (SELECT DISTINCT {basket_col} AS bk, {item_col} AS i FROM {table}) y
  ON x.bk = y.bk AND x.i < y.i"""


def association_lift(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 50,
) -> DataFrame:
    """Top-k item pairs by lift ``(c_ab · N) / (c_a · c_b)`` with their
    support counts. Ties are impossible at the boundary: the tiebreak is
    the (item_a, item_b) key itself.

    Each lift factor is cast to double BEFORE its multiply: the counts
    themselves are < 2^53 so the casts are exact and the IEEE products
    are correctly rounded identically in both engines, while BIGINT
    products of two multi-billion counts would overflow int64 — wrapping
    silently in Spark and raising in DuckDB."""
    items = (
        baskets.select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("i")
        )
        .distinct()
    )
    totals = items.select(
        F.countDistinct("b").cast("long").alias("n_baskets")
    )
    ic = items.groupBy("i").agg(F.count("*").cast("long").alias("c"))
    pc = (
        cooccurrence_pairs(baskets, basket_col, item_col)
        .groupBy(
            F.col("a").alias("item_a"), F.col("b").alias("item_b")
        )
        .agg(F.count("*").cast("long").alias("c_ab"))
    )
    ca = ic.select(F.col("i").alias("item_a"), F.col("c").alias("c_a"))
    cb = ic.select(F.col("i").alias("item_b"), F.col("c").alias("c_b"))
    return (
        pc.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(totals))  # bounded: 1-row scalar total
        .select(
            "item_a",
            "item_b",
            "c_ab",
            "c_a",
            "c_b",
            "n_baskets",
            (
                (F.col("c_ab").cast("double") * F.col("n_baskets"))
                / (F.col("c_a").cast("double") * F.col("c_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(top_k)
    )
