"""The salted hot-key join must be invisible in the output: same pair
multiset as the plain join, for both the literal-predicate path and the
many-exceptional-keys broadcast fallback (pairs.candidate_pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators import pairs


def _keys_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, side string, key string")


def _pairset(df):
    return {
        (r["left_id"], r["right_id"], r["blocking_key"], r["n_shared_keys"])
        for r in df.collect()
    }


def test_salted_hot_key_same_pairs(spark):
    # one hot key (40 x 40), one cold key, one one-sided key
    rows = (
        [(f"pkp:{i}", "pkp", "issn:HOT1234X") for i in range(40)]
        + [(f"oa:{i}", "oa", "issn:HOT1234X") for i in range(40)]
        + [("pkp:1", "pkp", "domain:cold.org"), ("oa:7", "oa", "domain:cold.org")]
        + [("pkp:2", "pkp", "band:b0:only-left")]
    )
    k = _keys_df(spark, rows)
    plain = pairs.candidate_pairs(k, hot_pair_threshold=10**12)  # nothing hot
    salted = pairs.candidate_pairs(k, hot_pair_threshold=100, n_salts=8)
    assert _pairset(plain) == _pairset(salted)
    # sanity: the hot block really produced its full cross product (1600
    # distinct pairs; the one pair that also shares the cold domain key
    # reports that key as its min blocking_key and 2 shared keys)
    got = _pairset(salted)
    assert len(got) == 40 * 40
    assert ("pkp:1", "oa:7", "domain:cold.org", 2) in got
    assert sum(1 for p in got if p[2] == "issn:HOT1234X") == 40 * 40 - 1


def test_many_exceptional_keys_broadcast_fallback(spark):
    # >10k exceptional keys forces the broadcast-join fallback branch
    n = 10_050
    rows = []
    for i in range(n):
        rows.append((f"pkp:{i}", "pkp", f"k:{i}"))
        rows.append((f"oa:{i}", "oa", f"k:{i}"))
    k = _keys_df(spark, rows).repartition(8)
    # threshold 0 -> every two-sided key is 'hot' -> exceptional count > 10k
    out = pairs.candidate_pairs(k, hot_pair_threshold=0, n_salts=4)
    got = _pairset(out)
    assert len(got) == n
    assert ("pkp:17", "oa:17", "k:17", 1) in got


def test_oversized_key_dropped_hot_key_kept(spark):
    rows = (
        [(f"pkp:{i}", "pkp", "band:b0:degenerate") for i in range(30)]
        + [(f"oa:{i}", "oa", "band:b0:degenerate") for i in range(30)]
        + [("pkp:1", "pkp", "issn:KEEP"), ("oa:1", "oa", "issn:KEEP")]
    )
    k = _keys_df(spark, rows)
    out = pairs.candidate_pairs(k, hot_pair_threshold=10, max_block_size=50)
    got = _pairset(out)
    # degenerate block (60 members > 50) dropped entirely; KEEP survives
    assert got == {("pkp:1", "oa:1", "issn:KEEP", 1)}


def test_pair_dedup_counts_shared_keys(spark):
    rows = [
        ("pkp:1", "pkp", "issn:X"), ("oa:2", "oa", "issn:X"),
        ("pkp:1", "pkp", "domain:d"), ("oa:2", "oa", "domain:d"),
    ]
    out = pairs.candidate_pairs(_keys_df(spark, rows))
    r = out.collect()
    assert len(r) == 1
    assert r[0]["n_shared_keys"] == 2
    assert r[0]["blocking_key"] == "domain:d"  # min over shared keys


def test_salt_distribution_spreads_hot_left(spark):
    """The salt column must actually split the hot left side (not all rows
    into one salt)."""
    rows = [(f"pkp:{i}", "pkp", "h") for i in range(64)] + [("oa:1", "oa", "h")]
    k = _keys_df(spark, rows)
    salts = (
        k.where(F.col("side") == "pkp")
        .select(F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int").alias("s"))
        .groupBy("s").count().collect()
    )
    assert len(salts) >= 6  # 64 ids over 8 salts: expect most buckets hit


def test_broadcast_fallback_empty_hot_no_placeholder(spark):
    """ADVICE r3: with >10k dropped keys and ZERO hot keys, the broadcast
    fallback must not plan a placeholder hot frame — previously the [("",)]
    row silently marked the empty-string key hot. An unprefixed ""-keyed
    row must come through is_hot=False."""
    dropped = [f"k:{i}" for i in range(10_100)]
    k = _keys_df(
        spark,
        [("pkp:1", "pkp", ""), ("oa:1", "oa", ""), ("pkp:2", "pkp", "keep:x")],
    )
    flagged = pairs._apply_flags(k, dropped, [])
    rows = {(r["doc_id"], r["key"]): r["is_hot"] for r in flagged.collect()}
    assert rows == {
        ("pkp:1", ""): False,
        ("oa:1", ""): False,
        ("pkp:2", "keep:x"): False,
    }


def test_blocking_family_quality_counts(spark):
    """Family ROI diagnostic: n_pairs counts distinct pairs per family,
    n_exclusive_pairs only those no other family finds, and dropped
    oversized blocks disappear from both key and pair counts."""
    from pyspark.sql import functions as F

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators import (
        pairs,
    )

    rows = [
        # issn:A pairs (p1,o1); band:B ALSO pairs (p1,o1) -> not exclusive
        ("p1", "pkp", "issn:A"), ("o1", "oa", "issn:A"),
        ("p1", "pkp", "band:B"), ("o1", "oa", "band:B"),
        # band:C pairs (p2,o2) exclusively
        ("p2", "pkp", "band:C"), ("o2", "oa", "band:C"),
        # domain:D is one-sided -> keys but zero pairs
        ("p3", "pkp", "domain:D"),
        # band:E is oversized (3 members > cap 2) -> dropped entirely
        ("p4", "pkp", "band:E"), ("o4", "oa", "band:E"), ("o5", "oa", "band:E"),
    ]
    keys = spark.createDataFrame(rows, "doc_id string, side string, key string")
    got = {
        r["family"]: (r["n_keys"], r["n_pairs"], r["n_exclusive_pairs"])
        for r in pairs.blocking_family_quality(keys, max_block_size=2).collect()
    }
    assert got == {
        "issn": (1, 1, 0),    # (p1,o1) shared with band
        "band": (2, 2, 1),    # (p1,o1) + exclusive (p2,o2); band:E dropped
        "domain": (1, 0, 0),  # key exists, no counterpart side
    }
    # sanity: family pair totals reconcile with the candidate join itself
    cand = pairs.candidate_pairs(keys, max_block_size=2)
    assert cand.count() == 2
