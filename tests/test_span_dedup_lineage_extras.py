"""Tests for A2 last-writer-wins dedup and scoring match-rate lineage."""

from __future__ import annotations

from pyspark.sql import functions as F

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.lineage import (
    match_rate_metrics,
)
from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.span_pairing import (
    dedup_pairs_with_sources,
)


def test_dedup_pairs_last_writer_wins(spark):
    """parse_landing_page_html.py:188-228 semantics: key = stripped strings,
    sources unioned + sorted, original strings from the LAST writer."""
    rows = [
        # same key ('ann','uni a') seen from meta then ul.authors with
        # different surrounding whitespace -> last (seq) strings win
        ("d1", " Ann", "Uni A ", "meta", 1),
        ("d1", "Ann ", " Uni A", "ul.authors", 2),
        ("d1", "Bob", "Uni B", "meta", 3),
        ("d2", "Ann", "Uni A", "ul.authors", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, author string, institution string, source string, seq int"
    )
    got = {
        (r["doc_id"], r["author"].strip(), r["institution"].strip()): r.asDict()
        for r in dedup_pairs_with_sources(df).collect()
    }
    assert len(got) == 3
    ann = got[("d1", "Ann", "Uni A")]
    assert ann["sources"] == "meta;ul.authors"
    assert ann["author"] == "Ann "           # last writer's original string
    assert ann["institution"] == " Uni A"
    assert got[("d1", "Bob", "Uni B")]["sources"] == "meta"


def test_match_rate_metrics_by_key_family(spark):
    rows = [
        ("a", "b", "issn:12345678", True),
        ("a", "c", "issn:99999999", False),
        ("a", "d", "band:b0:aa", True),
        ("a", "e", "domain:x.org", True),
        ("a", "f", "domain:y.org", True),
    ]
    df = spark.createDataFrame(
        rows, "left_id string, right_id string, blocking_key string, is_match_pred boolean"
    )
    got = {r["metric"]: r["value"] for r in match_rate_metrics(df, "run9").collect()}
    assert got["match_rate:issn"] == 0.5
    assert got["match_rate:band"] == 1.0
    assert got["match_rate:domain"] == 1.0
    rows2 = match_rate_metrics(df, "run9").collect()
    assert all(r["run_id"] == "run9" and r["stage"] == "scoring" for r in rows2)
