"""Same-session interleaved env-flag A/B — the round's adjudication
instrument for changes guarded by an environment bypass (the
MPS_PAYLOAD_MEMO_OFF / MPS_X144_SELFJOIN / MPS_STREAM_SHUFFLE_PARTITIONS
convention). Arm A runs with the flag UNSET (the shipped form), arm B
with the flag set to VALUE (the bypass/old form); arms alternate
A/B/A/B within one session so host drift hits both equally, with the
bench's own noop-sink timing + cache hygiene between runs and jvm
probes bracketing the series.

Usage:
    python tools/abenv.py QUERY [QUERY...] --flag NAME=VALUE [--runs N]
        [--sf DIR] [--cpus N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mariadb_postgres_migration_spark.registry import (  # noqa: E402
    REGISTRY,
    load_all_query_modules,
)
from mariadb_postgres_migration_spark.session import get_session  # noqa: E402
from tools.qbench import _hygiene, _jvm_probe, _run  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--flag", required=True, metavar="NAME=VALUE")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--cpus",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    args = ap.parse_args()
    flag, _, value = args.flag.partition("=")
    value = value or "1"

    load_all_query_modules()
    unknown = [q for q in args.queries if q not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_session(
        app_name="mps-abenv",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.environ.pop(flag, None)

    REGISTRY["op01_full_scan"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"probe_start {_jvm_probe(spark)}")
    _hygiene(spark)

    def arm(q: str, on: bool) -> float:
        if on:
            os.environ[flag] = value
        else:
            os.environ.pop(flag, None)
        try:
            return round(_run(spark, q, args.sf), 3)
        finally:
            os.environ.pop(flag, None)

    a: dict[str, list[float]] = {q: [] for q in args.queries}
    b: dict[str, list[float]] = {q: [] for q in args.queries}
    for q in args.queries:  # cold pass per arm (compile/JIT)
        ca, cb = arm(q, False), arm(q, True)
        print(f"{q}: cold A={ca} B={cb}")
    for _ in range(args.runs):
        for q in args.queries:
            a[q].append(arm(q, False))
            b[q].append(arm(q, True))
    print(f"probe_end {_jvm_probe(spark)}")
    for q in args.queries:
        ma = sorted(a[q])[len(a[q]) // 2]
        mb = sorted(b[q])[len(b[q]) // 2]
        print(
            f"{q}: A(unset)={a[q]} median={ma} | "
            f"B({flag}={value})={b[q]} median={mb}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
