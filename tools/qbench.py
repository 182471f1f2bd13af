"""Per-query isolated measurement + plan capture, same methodology as
bench.py (engine session, noop sink, warm steady-state, cache hygiene
between runs, jvm probe bracketing) — the round's A/B instrument.

Usage:
    python tools/qbench.py QUERY [QUERY...] [--runs N] [--explain TAG]
        [--sf DIR] [--cpus N] [--interleave]

--explain TAG writes plans/$MPS_PLANS_DIR/<query>_<TAG>.txt (explain
formatted; default plans/r13) and skips timing. --interleave times the queries round-robin (A/B/A/B...) so
host drift hits both arms equally; default times each query's runs
back-to-back.
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


def _hygiene(spark) -> None:
    from mariadb_postgres_migration_spark.operators.dedup import (
        release_cached_intermediates,
    )

    release_cached_intermediates()
    spark.catalog.clearCache()
    import gc

    gc.collect()
    spark._jvm.System.gc()


def _run(spark, name: str, sf_dir: str) -> float:
    spark.sparkContext.setJobDescription(f"qbench:{name}")
    t0 = time.time()
    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    elapsed = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    _hygiene(spark)
    return elapsed


def _jvm_probe(spark) -> float:
    t0 = time.time()
    spark.range(20_000_000).selectExpr("id % 97 AS k").groupBy("k").count().write.format(
        "noop"
    ).mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--interleave", action="store_true")
    ap.add_argument(
        "--conf", action="append", default=[], metavar="K=V",
        help="extra session conf (repeatable) — for config A/B arms",
    )
    args = ap.parse_args()

    load_all_query_modules()
    unknown = [q for q in args.queries if q not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_session(
        app_name="mps-qbench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
            **dict(kv.split("=", 1) for kv in args.conf),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.explain:
        outdir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            os.environ.get("MPS_PLANS_DIR", "r13"),
        )
        os.makedirs(outdir, exist_ok=True)
        from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

        for name in args.queries:
            df = REGISTRY[name].fn(spark, args.sf)
            plan = formatted_plan(df)
            path = os.path.join(outdir, f"{name}_{args.explain}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
            _hygiene(spark)
        return 0

    # session warmup
    REGISTRY["op01_full_scan"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"probe_start {_jvm_probe(spark)}")
    times: dict[str, list[float]] = {q: [] for q in args.queries}
    cold: dict[str, float] = {}
    for q in args.queries:  # cold pass first (compile/JIT)
        cold[q] = round(_run(spark, q, args.sf), 3)
    order = []
    if args.interleave:
        for i in range(args.runs):
            order += args.queries
    else:
        for q in args.queries:
            order += [q] * args.runs
    for q in order:
        times[q].append(round(_run(spark, q, args.sf), 3))
    print(f"probe_end {_jvm_probe(spark)}")
    for q in args.queries:
        runs = times[q]
        med = sorted(runs)[len(runs) // 2]
        print(
            f"{q}: cold={cold[q]} warm={runs} min={min(runs)} median={med}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
