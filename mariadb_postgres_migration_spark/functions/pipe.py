"""OP-31 tier (a): the external line-protocol transform, literal parity.

The reference spawns the ``normalize`` Rust binary ONCE on the driver,
writes every tag newline-joined to stdin, and zips stdout lines back by
position (/root/reference/src/normalize_tags.mjs:4-19) — bounded by a
1200 KiB stdout buffer (config.json:16) that the README documents as the
thing that breaks first (README.md:17).

Here the same protocol runs per PARTITION inside ``mapPartitions``: each
executor core owns one subprocess round-trip over its slice, so the buffer
ceiling and the single-process bottleneck both disappear while the observable
contract is preserved exactly: one input line per value, strict 1:1
positional output mapping, trailing empty line dropped (normalize_tags.mjs:
6-9). Any executable honoring the protocol plugs in — including the original
binary, unmodified.

This is the parity tier; the engine's default normalize is the Arrow
pandas UDF (functions.text.normalize_text), and the pure-native tier is
normalize_text_native. Same spec, three execution strategies.
"""

from __future__ import annotations

import subprocess
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


def pipe_transform(
    df: DataFrame,
    input_col: str,
    command: list[str],
    id_col: str,
    out_col: str = "normalized",
    max_batch_lines: int = 100_000,
) -> DataFrame:
    """Run every ``input_col`` value through ``command`` (line protocol),
    keeping ``id_col`` paired by position. Values must not contain newlines
    (the protocol's own precondition — the reference's tags can't either,
    README.md:13).

    ``max_batch_lines`` chunks one partition into several subprocess
    round-trips: the engine-side replacement for the reference's fixed
    stdout buffer — a knob that bounds subprocess memory instead of
    crashing at 1200 KiB.
    """
    schema = StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            StructField(out_col, StringType(), True),
        ]
    )

    def run_partition(rows) -> Iterator[tuple]:
        batch: list[tuple] = []

        def flush() -> Iterator[tuple]:
            if not batch:
                return
            payload = "\n".join(v for _, v in batch) + "\n"
            proc = subprocess.run(
                command, input=payload, capture_output=True, text=True, check=True
            )
            out = proc.stdout.split("\n")
            if out and out[-1] == "":  # trailing empty line (normalize_tags.mjs:6-8)
                out.pop()
            if len(out) != len(batch):  # strict 1:1 mapping (normalize_tags.mjs:9)
                raise RuntimeError(
                    f"pipe protocol violation: {len(batch)} lines in, {len(out)} out"
                )
            for (rid, _), norm in zip(batch, out):
                yield (rid, norm)
            batch.clear()

        for row in rows:
            v = row[input_col]
            if v is None:
                # NULL maps to NULL like the pandas-UDF and native tiers —
                # it never enters the line protocol (joining None raises,
                # and the subprocess couldn't represent it anyway)
                yield from flush()  # preserve relative output order
                yield (row[id_col], None)
                continue
            batch.append((row[id_col], v))
            if len(batch) >= max_batch_lines:
                yield from flush()
        yield from flush()

    rdd = df.select(id_col, input_col).rdd.mapPartitions(run_partition)
    return df.sparkSession.createDataFrame(rdd, schema)
