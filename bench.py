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

    qs = entry_mod.queries()
    times: dict[str, float] = {}
    pairs_scored = 0
    # warm the JVM + Python workers once (tiny query) so the first headline
    # entry doesn't pay one-time startup
    spark.range(1000).select(F.sum("id")).collect()

    total0 = time.perf_counter()
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        if name == "x1_reconcile_flagship":
            pairs_scored = n
    total = round(time.perf_counter() - total0, 3)

    out = {
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "cpus": int(cpus),
        "pairs_scored": pairs_scored,
        "pairs_scored_per_sec": round(
            pairs_scored / times["x1_reconcile_flagship"], 1
        ) if times.get("x1_reconcile_flagship") else 0.0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
