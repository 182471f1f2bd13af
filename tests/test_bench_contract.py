"""The driver consumes bench.py's stdout as ONE JSON line with a fixed
shape — pin that contract so a refactor can't silently break the
per-round BENCH_r{N}.json recording."""

import json
import os
import subprocess
import sys


def test_bench_emits_one_valid_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_QUERIES="q1_pricing_summary,op19_max_id",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-500:]
    line = out.stdout.strip().splitlines()[-1]
    b = json.loads(line)
    assert b["metric"] == "headline_suite_seconds" and b["unit"] == "sec"
    assert set(b["queries"]) == {"q1_pricing_summary", "op19_max_id"}
    assert b["value"] == round(sum(b["queries"].values()), 3)
    assert b["sf"] == 0.001 and b["cpus"] == 4
    assert set(b["cold_queries"]) == set(b["queries"])
