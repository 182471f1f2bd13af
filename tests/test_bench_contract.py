"""The driver consumes bench.py's stdout tail (~2000 chars) and parses the
LAST line as JSON — pin both the shape AND the size of that line so a
refactor (or a growing query list) can't silently break the per-round
BENCH_r{N}.json recording again (rounds 2-4 were lost to an oversized line)."""

import json
import os
import subprocess
import sys

from bench import FINAL_LINE_BUDGET, HEADLINE, compact_final_line


def test_bench_emits_valid_compact_final_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_QUERIES="q1_pricing_summary,op19_max_id",
        # pin the artifact round so the test never clobbers a real
        # .benchmarks/per_query_r{N}.json recording
        SPARK_GRAFT_ROUND="99",
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
    lines = out.stdout.strip().splitlines()
    final = lines[-1]
    assert len(final) <= FINAL_LINE_BUDGET
    b = json.loads(final)
    assert b["metric"] == "headline_suite_seconds" and b["unit"] == "sec"
    assert set(b["queries"]) == {"q1_pricing_summary", "op19_max_id"}
    assert b["value"] == round(sum(b["queries"].values()), 3)
    assert b["sf"] == 0.001 and b["cpus"] == 4
    assert b["n_queries"] == 2 and b["n_elided"] == 0
    # full per-query detail (incl. cold) lives on the preceding line
    detail = json.loads(lines[-3])
    assert set(detail["cold_queries"]) == set(detail["queries"]) == set(b["queries"])
    # ... and in a committed per-round artifact (r13: the final line elides
    # the fastest rows, so the full warm/cold map must live in the repo)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, ".benchmarks", "per_query_r99.json")
    assert os.path.exists(path), "bench.py must write .benchmarks/per_query_r{N}.json"
    try:
        with open(path) as f:
            art = json.load(f)
        assert art["roster"] == ["q1_pricing_summary", "op19_max_id"]
        assert set(art["warm"]) == set(art["cold"]) == set(b["queries"])
        assert art["sf"] == 0.001 and art["cpus"] == 4
    finally:
        os.remove(path)


def test_final_line_bounded_for_full_headline_suite():
    # Simulate the real suite (and 3x its size) with worst-case long names:
    # the final line must stay under the tail-capture budget regardless.
    fake = {name: 123.456 for name in HEADLINE}
    fake.update({f"x{i:02d}_some_future_long_query_name_suffix": 9.9 for i in range(60, 120)})
    line = compact_final_line(
        fake, total=999.999, cold_value=1999.999, sf=0.1, cpus=32
    )
    assert len(line) <= FINAL_LINE_BUDGET
    b = json.loads(line)
    assert b["n_queries"] == len(fake)
    assert b["n_elided"] == len(fake) - len(b["queries"])
    # the SLOWEST queries are the ones kept
    if b["n_elided"]:
        kept_min = min(b["queries"].values())
        elided = {k: v for k, v in fake.items() if k not in b["queries"]}
        assert all(v <= kept_min for v in elided.values())
