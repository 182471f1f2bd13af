"""Broadcast-hint policy guard (SCALE.md 'Broadcast build-side audit'):
every `F.broadcast(` site in the engine must carry a grep-able
`# bounded:` justification on its own line or within the three lines
above it — the r7 x120 defect (hinting a vocabulary-sized build side)
shipped precisely because nothing forced the author to state the bound.
A new hint without a stated bound fails here before it can OOM a 100 TB
build side."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / (
    "mariadb_postgres_migration_spark"
)


def test_every_broadcast_hint_states_its_bound():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        lines = path.read_text().split("\n")
        for i, line in enumerate(lines):
            if "F.broadcast(" not in line:
                continue
            window = "\n".join(lines[max(0, i - 3) : i + 1])
            if "# bounded:" not in window:
                offenders.append(f"{path.relative_to(PKG.parent)}:{i + 1}")
    assert not offenders, (
        "broadcast hints without a stated bound (add a `# bounded: ...` "
        f"comment naming why the build side cannot grow with the corpus): "
        f"{offenders}"
    )


def test_no_hint_on_known_corpus_growing_relations():
    """The r8 de-hinting must not regress: no F.broadcast() call whose
    argument expression mentions the SF-growing TPC-H relations by their
    conventional local names in the analytics module."""
    text = (PKG / "analytics_queries.py").read_text()
    for m in re.finditer(r"F\.broadcast\(([^)]*)", text):
        arg = m.group(1)
        assert not re.match(r"^(p|s|bad|caps|supp|europe_supp)\b", arg.strip()), (
            f"broadcast hint on a corpus-growing relation: F.broadcast({arg}"
        )
