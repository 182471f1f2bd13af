"""Inline data-quality observation (`DataFrame.observe`).

A 100 TB pipeline cannot afford a second pass just to count what it
filtered: `observe` attaches named aggregate metrics to a plan and the
executors accumulate them DURING the action that was running anyway —
zero extra scans, zero extra shuffles. The reference had no equivalent
(its only instrumentation is a wall-clock `console.time`,
index.mjs:136,158); here every sink write can carry its own audit counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality_gate(
    df: DataFrame,
    metrics: dict[str, Column] | None = None,
    name: str = "quality_gate",
) -> tuple[DataFrame, Observation]:
    """Attach audit metrics to ``df``; returns (df, observation).

    After ANY action on the returned DataFrame, ``observation.get`` yields
    the metric values accumulated during that same action. Default metrics:
    row count plus a per-column null count for every nullable column —
    the minimal load-audit a migration sink wants (SURVEY OP-04/05 write
    paths assert row counts today by re-counting; this removes the second
    job at scale).
    """
    if metrics is None:
        metrics = {"rows": F.count(F.lit(1))}
        for f in df.schema.fields:
            if f.nullable:
                metrics[f"null_{f.name}"] = F.sum(
                    F.when(F.col(f.name).isNull(), 1).otherwise(0)
                )
    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return observed, obs
