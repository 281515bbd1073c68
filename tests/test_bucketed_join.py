"""Bucketed committed tables: co-located joins with zero Exchange.

Scale rationale (north_rule "partitioning / shuffle ... handled
explicitly"): the scoring stage joins the (huge) candidate-pair table with
the records table on doc_id for every run and every downstream consumer.
Bucketing both committed tables on their join key to the same bucket count
moves that shuffle from query time to write time, once.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.sources.catalog import (
    Catalog,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    cat = Catalog(str(tmp_path), backend="table")
    records = spark.range(0, 2000).select(
        F.concat(F.lit("doc:"), F.col("id")).alias("doc_id"),
        (F.col("id") % 7).alias("payload"),
    )
    pairs = spark.range(0, 5000).select(
        F.concat(F.lit("doc:"), F.col("id") % 2000).alias("left_id"),
        F.col("id").alias("pair_no"),
    )
    try:
        cat.write_committed(records, "records_b", bucket_by=(["doc_id"], 8))
        cat.write_committed(pairs, "pairs_b", bucket_by=(["left_id"], 8))
        rb = cat.read_committed(spark, "records_b")
        pb = cat.read_committed(spark, "pairs_b")

        bucketed = pb.join(rb, pb.left_id == rb.doc_id, "inner")
        plain = pairs.join(records, pairs.left_id == records.doc_id, "inner")

        bplan, pplan = _plan(bucketed), _plan(plain)
        assert "Exchange" not in bplan, bplan
        assert "Exchange" in pplan  # the shuffle the bucketing removed
        assert "SortMergeJoin" in bplan

        # identical results to the plain join
        key = lambda r: (r["left_id"], r["pair_no"])
        assert sorted(map(key, bucketed.collect())) == sorted(
            map(key, plain.collect())
        )
    finally:
        cat.drop("records_b", spark)
        cat.drop("pairs_b", spark)


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path, no_broadcast):
    """groupBy on the bucket key also rides the bucket layout: partial and
    final aggregation collapse into one stage, no shuffle."""
    cat = Catalog(str(tmp_path), backend="table")
    df = spark.range(0, 1000).select(
        F.concat(F.lit("k"), F.col("id") % 50).alias("key"),
        F.col("id").alias("v"),
    )
    try:
        cat.write_committed(df, "agg_b", bucket_by=(["key"], 8))
        b = cat.read_committed(spark, "agg_b")
        agg = b.groupBy("key").agg(F.sum("v").alias("s"))
        assert "Exchange" not in _plan(agg)
        got = {r["key"]: r["s"] for r in agg.collect()}
        want = {
            r["key"]: r["s"]
            for r in df.groupBy("key").agg(F.sum("v").alias("s")).collect()
        }
        assert got == want
    finally:
        cat.drop("agg_b", spark)


def test_bucket_by_on_marker_backend_raises(spark, tmp_path):
    cat = Catalog(str(tmp_path), backend="marker")
    df = spark.range(3).select(F.col("id").cast("string").alias("doc_id"))
    with pytest.raises(ValueError, match="bucket_by"):
        cat.write_committed(df, "nope", bucket_by=(["doc_id"], 4))
