"""Unit tests for native column helpers (SURVEY F-ops) + the CSV sink (S4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.functions import native


def _one(spark, col, **cols):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} string" for k in cols)
    )
    return df.select(col.alias("out")).collect()[0]["out"]


def test_epoch_ms_range_rule(spark):
    # parse_record_data_from_files.py:150-169: 1970 <= year <= now+5 else null
    df = spark.createDataFrame(
        [(0,), (1700000000000,), (-10000000000000,), (99999999999999,)], "ms long"
    )
    got = [
        r["out"]
        for r in df.select(native.epoch_ms_to_compact_utc(F.col("ms")).alias("out"))
        .collect()
    ]
    assert got[0] == "19700101000000"
    assert got[1] == "20231114221320"
    assert got[2] is None  # year < 1970
    assert got[3] is None  # year > now+5


def test_sanitize_filename(spark):
    # retrieve_landing_pages.py:31-36: '/'->'_', non-word->'_', leading-dot guard
    assert _one(spark, native.sanitize_filename(F.col("s")), s="a/b c?.html") == "a_b_c_.html"
    assert _one(spark, native.sanitize_filename(F.col("s")), s=".hidden") == "_.hidden"


def test_openalex_wid(spark):
    assert _one(spark, native.openalex_wid(F.col("s")), s="https://openalex.org/W123") == "W123"
    assert _one(spark, native.openalex_wid(F.col("s")), s="https://openalex.org/A9") is None


def test_strip_oai_suffix_longest_first_single_strip(spark):
    # '/journal/index.php/index/oai' also ends with '/index.php/index/oai' —
    # the longest suffix must win, and only ONE strip happens
    u = "https://x.org/j/journal/index.php/index/oai"
    assert _one(spark, native.strip_oai_suffix(F.col("s")), s=u) == "https://x.org/j"
    # no suffix -> unchanged
    assert _one(spark, native.strip_oai_suffix(F.col("s")), s="https://x.org/j") == "https://x.org/j"
    # double suffix: stripped exactly once
    u2 = "https://x.org/oai/oai"
    assert _one(spark, native.strip_oai_suffix(F.col("s")), s=u2) == "https://x.org/oai"


def test_url_key_default_ports(spark):
    # main.rs:239-243: port_or_known_default equality
    k = lambda s: _one(spark, native.url_key(F.col("s")), s=s)  # noqa: E731
    assert k("https://A.Org/x") == "https|a.org|443"
    assert k("https://a.org:443/y") == "https|a.org|443"
    assert k("http://a.org") == "http|a.org|80"
    assert k("http://a.org:8080/z") == "http|a.org|8080"
    assert k("::garbage::") is None


def test_b64_filename_roundtrip_unicode(spark):
    dois = ["10.123/ab.c", "10.1/ümlaut·x", "10.9/a/b/c?d=e&f"]
    df = spark.createDataFrame([(d,) for d in dois], "doi string")
    out = df.select(
        "doi",
        native.filename_to_doi(native.doi_to_filename(F.col("doi"))).alias("back"),
    ).collect()
    for r in out:
        assert r["back"] == r["doi"]


def test_csv_sink_roundtrip(spark, tmp_path):
    # S4: header CSV sink (get_journal_base_urls...py:67-77)
    from pyspark.sql import types as T

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.sources.readers import (
        read_csv,
    )

    df = spark.createDataFrame(
        [(1, "a,with comma"), (2, 'quote " inside')], "id int, txt string"
    )
    p = str(tmp_path / "out_csv")
    df.write.mode("overwrite").option("header", True).csv(p)
    schema = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("txt", T.StringType())]
    )
    back = read_csv(spark, p, schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_redact_pii_and_counts(spark):
    """PII masking: emails then URLs to typed placeholders; counts from the
    original text; non-PII text untouched; patterns agree with Python re."""
    import re

    from pyspark.sql import functions as F

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.functions import (
        native,
    )

    rows = [
        (1, "mail a.b+c@x.co.uk or see https://ex.org/p?q=1 now"),
        (2, "no contact info here at all"),
        (3, "two: x@y.io and z@w.ai plus http://plain.example"),
        (4, "edge trailing@dot. and bare http:// nothing"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    n_emails, n_urls = native.pii_counts(F.col("text"))
    got = {
        r["id"]: (r["ne"], r["nu"], r["red"])
        for r in df.select(
            "id", n_emails.alias("ne"), n_urls.alias("nu"),
            native.redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    # python-re reference (same pattern strings)
    for i, t in rows:
        ne = len(re.findall(native.EMAIL_RE, t))
        nu = len(re.findall(native.URL_RE, t))
        red = re.sub(native.URL_RE, "<URL>", re.sub(native.EMAIL_RE, "<EMAIL>", t))
        assert got[i] == (ne, nu, red), (i, got[i], (ne, nu, red))
    assert got[1][0] == 1 and got[1][1] == 1 and "<EMAIL>" in got[1][2]
    assert got[2] == (0, 0, rows[1][1])
    assert got[3][:2] == (2, 1)


def test_issn_check_digit_known_values(spark):
    """ISO 3297 mod-11 check digit against published known-good ISSNs and
    hand-corrupted variants; null-safe on malformed input."""
    from pyspark.sql import functions as F

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.functions import (
        native,
    )

    rows = [
        (1, "03178471"),  # 0317-8471 (the ISO 3297 worked example) - valid
        (2, "20493630"),  # 2049-3630 (ISSN of the ISSN standard) - valid
        (3, "2434561X"),  # 2434-561X - valid, X check digit (sum 122 -> 10)
        (4, "03178472"),  # corrupted check digit - invalid
        (5, "2434561x"),  # lowercase x: not normalized - no verdict (null)
        (6, "1234567"),   # 7 chars - null
        (7, None),        # null in - null out
    ]
    df = spark.createDataFrame(rows, "id long, issn string")
    got = {
        r["id"]: r["ok"]
        for r in df.select(
            "id", native.issn_check_valid(F.col("issn")).alias("ok")
        ).collect()
    }
    assert got == {1: True, 2: True, 3: True, 4: False, 5: None, 6: None, 7: None}
