"""Per-stage profile of one query's action (guide §1.1 — find where the
time actually goes before changing anything): runs QUERY once cold
(compile/JIT) and once warm with the bench's noop-sink methodology, then
lists the warm action's completed stages (task count, executor run time,
wall, input / shuffle-read / shuffle-write bytes) via the local Spark UI
REST API, sorted by executor run time.

Usage:
    python tools/profile_query.py QUERY [--sf DIR] [--cpus N] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mariadb_postgres_migration_spark.registry import (  # noqa: E402
    REGISTRY,
    load_all_query_modules,
)
from mariadb_postgres_migration_spark.session import get_session  # noqa: E402
from tools.qbench import _hygiene, _run  # noqa: E402

UI_PORT = 4055


def _rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.load(r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--cpus",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--top", type=int, default=18)
    args = ap.parse_args()

    load_all_query_modules()
    if args.query not in REGISTRY:
        raise SystemExit(f"unknown query: {args.query}")

    spark = get_session(
        app_name="mps-profile",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "5000",
            "spark.driver.memory": "16g",
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    REGISTRY["op01_full_scan"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    _run(spark, args.query, args.sf)  # cold (compile/JIT), then hygiene

    for r in range(args.runs):
        done_before = {
            s["stageId"]
            for s in _rest(f"applications/{app_id}/stages")
        }
        t0 = time.time()
        el = _run(spark, args.query, args.sf)
        stages = [
            s
            for s in _rest(f"applications/{app_id}/stages?status=COMPLETE")
            if s["stageId"] not in done_before
        ]
        total_cpu = sum(s["executorRunTime"] for s in stages) / 1e3
        print(
            f"\n== {args.query} warm run {r}: wall {el:.2f}s, "
            f"{len(stages)} stages, executor cpu {total_cpu:.1f}s =="
        )
        print(
            f"{'stage':>6} {'tasks':>5} {'cpu_s':>7} {'in_MB':>7}"
            f" {'shR_MB':>7} {'shW_MB':>7}  name"
        )
        stages.sort(key=lambda s: -s["executorRunTime"])
        for s in stages[: args.top]:
            print(
                f"{s['stageId']:>6} {s['numCompleteTasks']:>5}"
                f" {s['executorRunTime'] / 1e3:>7.2f}"
                f" {s['inputBytes'] / 1e6:>7.1f}"
                f" {s['shuffleReadBytes'] / 1e6:>7.1f}"
                f" {s['shuffleWriteBytes'] / 1e6:>7.1f}"
                f"  {s['name'][:70]}"
            )
        _ = t0  # wall already printed via el
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
