"""Pin interval_join's bucketing against a brute-force cross join,
specifically the ADVICE-r1 failure modes: negative epoch micros (pre-1970
timestamps) where truncating division mis-buckets, and fractional second
bounds where float width arithmetic could break the two-adjacent-buckets
coverage invariant."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from mariadb_postgres_migration_spark.operators.joins import interval_join


def _brute_force(left, right, lo_s, hi_s):
    lo_us, hi_us = int(lo_s * 1_000_000), int(hi_s * 1_000_000)
    out = set()
    for lid, lts in left:
        for rid, rts in right:
            delta = int((rts - lts).total_seconds() * 1_000_000)
            if lo_us <= delta <= hi_us:
                out.add((lid, rid))
    return out


def _run(spark, left, right, lo_s, hi_s):
    ldf = spark.createDataFrame(
        [(i, 1, t) for i, t in left], "lid long, k long, lts timestamp"
    )
    rdf = spark.createDataFrame(
        [(i, 1, t) for i, t in right], "rid long, k long, rts timestamp"
    )
    got = interval_join(ldf, rdf, ["k"], "lts", "rts", lo_s, hi_s)
    return {(r["lid"], r["rid"]) for r in got.collect()}


def test_negative_epochs_pre_1970(spark):
    """Pre-1970 timestamps: floor bucketing must keep qualifying pairs that
    truncation toward zero silently dropped."""
    base = datetime(1969, 12, 31, 22, 0, 0)  # negative epoch micros
    left = [(i, base + timedelta(minutes=37 * i % 300)) for i in range(24)]
    right = [(i, base + timedelta(minutes=11 * i % 300, seconds=13)) for i in range(40)]
    lo_s, hi_s = 1.0, 3600.0
    assert _run(spark, left, right, lo_s, hi_s) == _brute_force(left, right, lo_s, hi_s)
    assert _brute_force(left, right, lo_s, hi_s), "fixture produced no pairs"


def test_epoch_straddling_zero(spark):
    """Windows that straddle the 1970 epoch boundary (bucket 0/-1 edge)."""
    base = datetime(1969, 12, 31, 23, 59, 0)
    left = [(i, base + timedelta(seconds=17 * i)) for i in range(20)]
    right = [(i, base + timedelta(seconds=5 * i)) for i in range(60)]
    lo_s, hi_s = 0.0, 90.0
    assert _run(spark, left, right, lo_s, hi_s) == _brute_force(left, right, lo_s, hi_s)


@pytest.mark.parametrize("lo_s,hi_s", [(0.1, 0.7), (0.3, 1.1), (1.0, 2.0)])
def test_fractional_bounds_width_invariant(spark, lo_s, hi_s):
    """Width must come from the integer micro bounds: fractional-second
    bounds where int((hi-lo)*1e6) can disagree with hi_us-lo_us by 1µs."""
    base = datetime(2024, 6, 1, 12, 0, 0)
    left = [(i, base + timedelta(milliseconds=137 * i)) for i in range(30)]
    right = [(i, base + timedelta(milliseconds=61 * i)) for i in range(70)]
    assert _run(spark, left, right, lo_s, hi_s) == _brute_force(left, right, lo_s, hi_s)
