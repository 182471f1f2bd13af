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

Lift stays engine-exact: the numerator ``c_ab · N`` and denominator
``c_a · c_b`` are BIGINT products (exact in both engines), and the
single double division is the only float operation — same bits in Spark
and the DuckDB oracle, so ordering and selection at the top-k boundary
cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_lift(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 50,
) -> DataFrame:
    """Top-k item pairs by lift ``(c_ab · N) / (c_a · c_b)`` with their
    support counts. Ties are impossible at the boundary: the tiebreak is
    the (item_a, item_b) key itself."""
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
        items.alias("x")
        .join(items.alias("y"), "b")
        .filter(F.col("x.i") < F.col("y.i"))
        .groupBy(
            F.col("x.i").alias("item_a"), F.col("y.i").alias("item_b")
        )
        .agg(F.count("*").cast("long").alias("c_ab"))
    )
    ca = ic.select(F.col("i").alias("item_a"), F.col("c").alias("c_a"))
    cb = ic.select(F.col("i").alias("item_b"), F.col("c").alias("c_b"))
    return (
        pc.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "item_a",
            "item_b",
            "c_ab",
            "c_a",
            "c_b",
            "n_baskets",
            (
                (F.col("c_ab") * F.col("n_baskets"))
                / (F.col("c_a") * F.col("c_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(top_k)
    )
