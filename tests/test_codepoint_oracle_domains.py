"""Codepoint-vs-byte oracle-domain audit (VERDICT r7 #6), extending the
x104 pattern to the token-based text-join oracles.

The engine's tokenize path is ``lower(trim(regexp_replace(text, '\\s+',
' ')))`` then a space split, mirrored in the oracles' ``NORM_SQL``. Two
cross-engine divergence surfaces exist:

* Java regex ``\\s`` includes vertical tab U+000B; RE2 (DuckDB) ``\\s``
  does not — so a \\x0B in the text is a token SEPARATOR to Spark and a
  token CHARACTER to DuckDB. This is inside the ASCII range, so a plain
  ASCII guard does not cover it.
* Spark's non-ASCII ``lower`` falls back to JDK ``String.toLowerCase``
  (locale-influenced special mappings); DuckDB lowers via utf8proc
  simple mappings. Identical for the common Latin/CJK cases but not
  guaranteed across all of Unicode.

Per the x104 precedent: (a) property-pin the SPARK side codepoint-exact
against pure-Python transcriptions on hostile non-ASCII inputs — the
ENGINE must be right everywhere; (b) guard the registered fixtures
inside the oracle's validity domain (printable ASCII, no \\x0B) so the
driver hash-compare stays sound.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

#: Java-\s transcription (NOT Python's Unicode-aware \s): the exact class
#: Spark's regexp_replace('\s+') collapses.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _norm_tokens(text: str) -> list[str]:
    """Pure-Python transcription of tokens_col: collapse Java-\\s runs to
    one space, trim spaces, lower, split."""
    t = _JAVA_WS.sub(" ", text).strip(" ").lower()
    return t.split(" ") if t else [""]


#: hostile corpus: accents, CJK, astral emoji, combining marks, vertical
#: tab (the Java/RE2 \s divergence), repeated boilerplate for real spans
_HOSTILE_DOCS = [
    (0, "café au lait 日本 語 テスト 😀 one two three four five six seven"),
    (1, "café au lait 日本 語 テスト 😀 one two three four five six eight"),
    (2, "совершенно другой текст без повторов αβγ δεζ ηθι κλμ νξο"),
    (3, "tab\x0bseparated café au lait 日本 語 テスト 😀 one two three"),
    (4, "é combining acute differs from é precomposed tokens "
        "café au lait 日本 語 テスト 😀 one two"),
    (5, "ONE TWO THREE four five six seven CAFÉ AU LAIT 日本 語 テスト 😀"),
]


def test_x56_spans_non_ascii_matches_python_reference(spark):
    """duplicate_spans codepoint-exact on non-ASCII + \\x0B input: the
    Spark output must equal a pure-Python transcription (tokenize with
    the Java \\s class, md5 8-token windows over UTF-8 bytes, mark
    corpus-wide count >= 2, merge overlapping windows into islands)."""
    from mariadb_postgres_migration_spark.operators.dedup import duplicate_spans

    k = 4  # smaller k so the tiny docs actually produce windows
    toks = {d: _norm_tokens(t) for d, t in _HOSTILE_DOCS}
    counts: dict[str, int] = {}
    wins: dict[int, list[str]] = {}
    for d, tk in toks.items():
        hs = [
            hashlib.md5(" ".join(tk[i : i + k]).encode("utf-8")).hexdigest()
            for i in range(len(tk) - k + 1)
        ]
        wins[d] = hs
        for h in hs:
            counts[h] = counts.get(h, 0) + 1
    expected = set()
    for d, hs in wins.items():
        dup_pos = [i + 1 for i, h in enumerate(hs) if counts[h] >= 2]
        island: list[int] = []
        for p in dup_pos:
            if island and p <= island[-1] + k - 1:
                island.append(p)
            else:
                if island:
                    expected.add(
                        (d, island[0], island[-1] + k - 1, len(island))
                    )
                island = [p]
        if island:
            expected.add((d, island[0], island[-1] + k - 1, len(island)))

    df = spark.createDataFrame(_HOSTILE_DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_spans(df, k=k).collect()
    }
    assert got == expected


def test_x88_prefix_filter_non_ascii_matches_python_reference(spark):
    """prefix_filter_jaccard_pairs codepoint-exact on non-ASCII input:
    output pairs must equal the brute-force exact-Jaccard pairs over
    distinct 3-token shingle sets (prefix filtering is EXACT by the
    Bayardo theorem, so the filter must not change the answer — on any
    alphabet)."""
    from mariadb_postgres_migration_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
        release_cached_intermediates,
    )

    k, t = 3, 0.5
    sets = {
        d: {
            " ".join(tk[i : i + k])
            for i in range(len(tk) - k + 1)
        }
        for d, t_ in _HOSTILE_DOCS
        for tk in [_norm_tokens(t_)]
        if len(tk) >= k
    }
    expected = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= t:
                expected[(a, b)] = (inter, len(sets[a]), len(sets[b]))

    df = spark.createDataFrame(_HOSTILE_DOCS, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["n_a"], r["n_b"])
        for r in prefix_filter_jaccard_pairs(df, k=k).collect()
    }
    release_cached_intermediates()
    assert got == expected


def test_token_oracle_fixture_text_is_domain_safe(spark, sf_dir):
    """Guards the token-based oracles' validity domain (x56 spans, x88
    prefix filter, and every _TOKS_CTE consumer): the fixture text must
    be printable-ASCII-only (covers DuckDB lower()/byte-length
    divergences) and in particular free of \\x0B, the one ASCII
    character inside Java's \\s but outside RE2's. If the documents
    fixture ever grows such text, this fails BEFORE a driver row
    silently diverges — the engine itself is codepoint-exact (the two
    property tests above)."""
    from mariadb_postgres_migration_spark.registry import _t

    docs = _t(spark, sf_dir, "documents")
    n_bad = docs.filter(
        ~F.col("text").rlike("^[\\x20-\\x7E\\t\\n\\r]*$")
    ).count()
    assert n_bad == 0
