"""Tests: corpus filter (P4/P5/F6/S5/A8 replica of main.rs), span pairing
(W2 state machine), schema-asserting readers (S1-S3, S7)."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark import schemas
from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.corpus_filter import (
    filter_works,
    write_partitioned,
)
from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.span_pairing import (
    pair_authors_affiliations,
)
from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.sources import readers


def _work(id, doi, urls, affils):
    return {
        "id": id, "doi": doi,
        "primary_location": None, "best_oa_location": None,
        "locations": None if urls is None else [{"landing_page_url": u} for u in urls],
        "authorships": None if affils is None else [
            {"raw_author_name": "A", "author": {"display_name": "A"},
             "raw_affiliation_strings": affils}
        ],
    }


def test_filter_works_url_and_affiliation_semantics(spark):
    works = spark.createDataFrame(
        [
            # passes: same host, https default port, has affiliation
            _work("W1", "10.1/a", ["https://journals.x.org/article/1"], ["Uni X"]),
            # passes: explicit default port equals implicit (main.rs:239-243)
            _work("W2", "10.2/b", ["https://journals.x.org:443/article/2"], ["Uni Y"]),
            # fails: http (port 80) vs https base (443)
            _work("W3", "10.3/c", ["http://journals.x.org/article/3"], ["Uni Z"]),
            # fails: different host
            _work("W4", "10.4/d", ["https://elsewhere.org/x"], ["Uni"]),
            # fails: no locations
            _work("W5", "10.5/e", None, ["Uni"]),
            # fails: unparseable URL
            _work("W6", "10.6/f", ["::nope::"], ["Uni"]),
            # fails: whitespace-only affiliations (main.rs:263-286)
            _work("W7", "10.7/g", ["https://journals.x.org/a"], ["   ", ""]),
            # fails: no authorships
            _work("W8", "10.8/h", ["https://journals.x.org/a"], None),
            # passes: null DOI -> _unknown_ prefix (main.rs:714-719)
            _work("W9", None, ["https://journals.x.org/a"], ["Uni"]),
        ],
        schema=schemas.OPENALEX_WORKS,
    )
    base = spark.createDataFrame([("https://journals.x.org/index.php/j",)], "base_url string")
    out, _ = filter_works(works, base)
    got = {r["id"]: r["doi_prefix"] for r in out.collect()}
    assert got == {"W1": "10.1", "W2": "10.2", "W9": "_unknown_"}


def test_filter_works_observation_buckets(spark):
    works = spark.createDataFrame(
        [
            _work("W1", "10.1/a", ["https://j.x.org/1"], ["U"]),
            _work("W2", "10.2/b", None, ["U"]),
            _work("W3", "10.3/c", ["::bad::"], ["U"]),
            _work("W4", "10.4/d", ["https://j.x.org/1"], ["  "]),
        ],
        schema=schemas.OPENALEX_WORKS,
    )
    base = spark.createDataFrame([("https://j.x.org/",)], "base_url string")
    out, obs = filter_works(works, base, with_observation=True)
    out.collect()
    m = obs.get
    assert m["records_read"] == 4
    assert m["no_locations"] == 1
    assert m["no_parseable_url"] == 2  # W2 (none) + W3 (unparseable)
    assert m["no_affiliation"] == 1


def test_partitioned_write_layout(spark, tmp_path):
    works = spark.createDataFrame(
        [
            _work("W1", "10.1/a", ["https://j.x.org/1"], ["U"]),
            _work("W2", None, ["https://j.x.org/1"], ["U"]),
        ],
        schema=schemas.OPENALEX_WORKS,
    )
    base = spark.createDataFrame([("https://j.x.org/",)], "base_url string")
    out, _ = filter_works(works, base)
    d = str(tmp_path / "parts")
    write_partitioned(out, d)
    dirs = sorted(x for x in os.listdir(d) if x.startswith("doi_prefix="))
    assert dirs == ["doi_prefix=10.1", "doi_prefix=_unknown_"]
    back = spark.read.parquet(d)
    assert back.count() == 2


def _span(kind, text, off):
    return {"kind": kind, "text": text, "media_ref": "", "offset": off}


def test_span_pairing_state_machine(spark):
    docs = spark.createDataFrame(
        [
            {
                "doc_id": "d1",
                "spans": [
                    _span("author", "Ann", 0),
                    _span("affiliation", "Uni A", 1),
                    _span("affiliation", "Uni B", 2),   # second affil, same author
                    _span("author", "Bob", 3),          # no affil -> ('Bob','')
                    _span("author", "Cyd", 4),
                    _span("text", "noise", 5),
                    _span("affiliation", "Uni C", 6),   # attaches to Cyd
                ],
            },
            {
                "doc_id": "d2",
                "spans": [_span("affiliation", "Orphan Uni", 0)],  # no author: dropped
            },
        ],
        schema=schemas.DOCUMENTS,
    )
    got = sorted(
        (r["doc_id"], r["author"], r["institution"])
        for r in pair_authors_affiliations(docs).collect()
    )
    assert got == [
        ("d1", "Ann", "Uni A"),
        ("d1", "Ann", "Uni B"),
        ("d1", "Bob", ""),
        ("d1", "Cyd", "Uni C"),
    ]


def test_read_csv_schema_assertion(spark, tmp_path):
    p = str(tmp_path / "x.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,foo\n2,bar\n")
    schema = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    df = readers.read_csv(spark, p, schema, required=["a", "b"])
    assert sorted(map(tuple, df.collect())) == [(1, "foo"), (2, "bar")]
    import pytest

    with pytest.raises(ValueError, match="missing required columns"):
        readers.read_csv(spark, p, schema, required=["a", "b", "missing_col"])


def test_read_jsonl_gz_with_corrupt_routing(spark, tmp_path):
    sub = tmp_path / "nested" / "deep"
    os.makedirs(sub)
    p = str(sub / "data.jsonl.gz")
    with gzip.open(p, "wt") as f:
        f.write('{"doi": "10.1/x", "n": 1}\n')
        f.write("   \n")  # blank line: skipped natively (P7)
        f.write('{"doi": "10.2/y", "n": 2}\n')
        f.write("{not json}\n")  # malformed: routed, not dropped (P6)
    schema = T.StructType(
        [T.StructField("doi", T.StringType()), T.StructField("n", T.LongType())]
    )
    df = readers.read_jsonl(
        spark, str(tmp_path), schema, recursive=True, glob="*.jsonl.gz"
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["doi"] for r in good} == {"10.1/x", "10.2/y"}
    assert len(bad) == 1 and bad[0]["doi"] is None


def test_read_whole_files_binary(spark, tmp_path):
    (tmp_path / "a.html").write_text("<html>A</html>")
    (tmp_path / "b.html").write_text("<html>B</html>")
    (tmp_path / "c.txt").write_text("nope")
    df = readers.read_whole_files(spark, str(tmp_path), glob="*.html")
    got = {os.path.basename(r["path"]): bytes(r["content"]) for r in df.collect()}
    assert set(got) == {"a.html", "b.html"}
    assert got["a.html"] == b"<html>A</html>"
