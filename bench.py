"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pairs_scored_per_sec": ...}

The headline set spans the engine's hot paths: the flagship reconcile
pipeline (blocking + salted pairs + vectorized scoring), the clustering
round, the windowed/rolled-up analytics, and the dedup/similarity family.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.session import (  # noqa: E402
    get_spark,
)

HEADLINE = [
    "x1_reconcile_flagship",
    "j3_top1_per_group",
    "j5_connected_components",
    "a2_grouped_dedup_sources",
    "a10_grouping_sets_rollup",
    "w2_last_nonnull_carry",
    "t1_text_quality",
    "t6_embedding_topk",
    "x2_minhash_lsh_pairs",
    "x4_ann_lsh_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench", cores=cpus, shuffle_partitions=int(cpus))

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.functions.udfs import (
        sim_features_udf,
    )

    qs = entry_mod.queries()
    times: dict[str, float] = {}
    # warm the JVM codegen AND the Python worker pool so the first headline
    # entry doesn't pay one-time startup
    warm = spark.range(int(cpus) * 2000).select(
        F.concat(F.lit("warm "), (F.col("id") % 97).cast("string")).alias("a")
    )
    warm.select(F.sum(sim_features_udf(F.col("a"), F.col("a"))["indel"])).collect()

    total0 = time.perf_counter()
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.count()
        times[name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - total0, 3)

    # scoring throughput: the north metric (candidate-pairs-scored/sec) on a
    # synthetic 300k-pair batch of realistic normalized titles
    n_pairs = 300_000
    # every pair distinct (no batch-memo hits) — honest per-pair throughput
    pairs = spark.range(n_pairs).select(
        F.concat(F.lit("regional studies in applied fish biology volume "),
                 F.col("id").cast("string")).alias("a"),
        F.concat(F.lit("regional studies in applied fish bioolgy volume "),
                 (F.col("id") + 7).cast("string")).alias("b"),
    ).repartition(int(cpus)).persist()
    pairs.count()
    t0 = time.perf_counter()
    pairs.select(F.sum(sim_features_udf(F.col("a"), F.col("b"))["indel"])).collect()
    score_wall = time.perf_counter() - t0

    out = {
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "cpus": int(cpus),
        "pairs_scored_per_sec": round(n_pairs / score_wall, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
