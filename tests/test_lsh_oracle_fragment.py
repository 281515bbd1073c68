"""Band-level parity between the Python minhash implementation and the
DuckDB SQL CTE fragment the x2/t8 oracles are built from.

The end-to-end correctness gate compares candidate PAIR sets, which can
mask compensating errors (two band families drifting the same way). This
test pins the shared fragment (`_lsh_candidate_ctes`) to the engine's
`hashing.minhash_bands` band-for-band on a frozen sample, including the
whitespace edge cases that r2's ADVICE flagged (tab-only text must produce
NO bands on either side).
"""

from __future__ import annotations

import re
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.functions import (  # noqa: E402
    hashing,
)

FROZEN_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "short"),                        # < k tokens -> whole-text shingle
    (3, "two words"),
    (4, ""),                             # empty -> no bands
    (5, "\t"),                           # tab-only -> no bands (ADVICE r2)
    (6, "   "),                          # spaces-only -> no bands
    (7, "  leading and trailing  "),     # split fragments must be filtered
    (8, "tabs\tbetween\ttokens here"),
    (9, "MIXED Case   And  Runs\tof whitespace"),
    (10, "unicode létters blêed through unchanged in this family"),
]


def _norm(text: str) -> str:
    # the fragment's norm CTE: trim (spaces only) -> lower -> RE2-\s
    # collapse; Python re.ASCII \s also covers \v, which RE2's does not —
    # the frozen sample deliberately contains no \v
    return re.sub(r"\s+", " ", text.strip(" ").lower(), flags=re.ASCII)


def _python_bands(text: str) -> set[str]:
    return set(hashing.minhash_bands(hashing.shingles(_norm(text), k=3)))


def test_sql_fragment_bands_match_python_kernel():
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(FROZEN_DOCS, columns=["doc_id", "text"]))
    sql = f"""
    WITH {entry_mod._lsh_candidate_ctes(10_000)}
    SELECT doc_id, band FROM bands ORDER BY doc_id, band
    """
    got: dict[int, set[str]] = {}
    for doc_id, band in con.sql(sql).fetchall():
        got.setdefault(doc_id, set()).add(band)

    for doc_id, text in FROZEN_DOCS:
        want = _python_bands(text)
        assert got.get(doc_id, set()) == want, (doc_id, text)
        # band keys are b{i}:-prefixed, so a doc has exactly 16 or none
        assert len(want) in (0, 16)
    # the degenerate docs produce nothing on either side
    for empty_id in (4, 5, 6):
        assert empty_id not in got


def test_sql_fragment_cap_drops_oversized_band():
    """The kept CTE drops bands above max_band_size on the SQL side exactly
    like the operator's broadcast anti-join."""
    rows = [(i, "stop phrase shared by every doc") for i in range(5)]
    rows += [(100, "a genuinely distinct document about owls")]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql_capped = f"""
    WITH {entry_mod._lsh_candidate_ctes(4)}
    SELECT count(*) FROM cand
    """
    assert con.sql(sql_capped).fetchone()[0] == 0  # all 5 sharers exceed cap 4
    sql_uncapped = f"""
    WITH {entry_mod._lsh_candidate_ctes(10_000)}
    SELECT count(*) FROM cand
    """
    assert con.sql(sql_uncapped).fetchone()[0] == 10  # C(5,2) pairs survive
