"""AQE runtime skew-join split: the safety net UNDER the explicit salting.

pairs.py salts keys it can measure up front; AQE's OptimizeSkewedJoin
handles residual skew discovered at runtime (north_rule "skew handled
explicitly" — both layers). This test proves the session's AQE config
actually engages: a hot key concentrating ~95% of the left side gets its
sort-merge-join partition split (SortMergeJoin(skew=true), more tasks than
shuffle partitions) with results identical to the unsplit join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.join.preferSortMergeJoin": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skew_confs(spark):
    saved = {k: spark.conf.get(k) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_aqe_splits_hot_key_partition(spark, skew_confs):
    left = spark.range(0, 300_000).select(
        F.when(F.col("id") % 100 < 95, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
        .alias("key"),
        F.concat(F.lit("pad" * 8), F.col("id").cast("string")).alias("v"),
    )
    right = spark.createDataFrame(
        [("hot", "x")] + [(f"k{i}", "x") for i in range(5, 100)],
        "key string, w string",
    )
    j = left.join(right, "key").select("key")
    got = j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan
    # same answer as the logical join: 95% of left rows carry the hot key
    assert len(got) == 300_000
    assert sum(1 for r in got if r["key"] == "hot") == 285_000
