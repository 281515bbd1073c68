"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

The rule's N-vs-4N-executor criterion cannot use a real cluster in this
sandbox, so we run the IDENTICAL job at two parallelism levels —
local[8] and local[32] — on the same input and report throughput at both
plus efficiency = (T_8 / T_32) / (32/8).

One measurement per subprocess (a JVM can't change master mid-life);
`--cores N` runs one leg and prints JSON, no args runs both and writes
BENCH.md.

Workload: the full reconcile pipeline (extract -> blocking -> salted
candidate pairs -> vectorized scoring -> connected components) on a seeded
synthetic corpus big enough to keep 32 cores busy (default 20k journals
-> ~34k interleaved documents -> ~100k+ scored candidate pairs).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_JOURNALS = int(os.environ.get("SCALING_N_JOURNALS", "20000"))


def run_one(cores: int) -> dict:
    from pyspark.sql import functions as F

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark import (
        schemas,
        synth,
    )
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.plans.reconcile import (
        reconcile,
    )
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.session import (
        get_spark,
    )

    corpus = synth.generate(seed=42, n_journals=N_JOURNALS)
    spark = get_spark(
        app_name=f"scaling_{cores}", cores=cores, shuffle_partitions=max(cores, 8)
    )
    docs = spark.createDataFrame(corpus.documents, schema=schemas.DOCUMENTS).repartition(
        max(cores, 8)
    )
    docs.write.mode("overwrite").parquet(f"/tmp/scaling_docs_{N_JOURNALS}.parquet")
    docs = spark.read.parquet(f"/tmp/scaling_docs_{N_JOURNALS}.parquet")

    # warm: JVM + Python worker pool
    spark.range(10_000).select(F.sum("id")).collect()

    t0 = time.perf_counter()
    # max_block_size: degenerate publisher-domain mega-blocks are dropped
    # (quadratic garbage pairs; ISSN + title bands carry the recall) — the
    # same cap discipline the 10^12-doc deployment needs
    res = reconcile(
        docs, with_clusters=True, hot_pair_threshold=100_000, max_block_size=2000
    )
    n_pairs = res.scored.count()
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    wall = time.perf_counter() - t0
    return {
        "cores": cores,
        "n_docs": N_JOURNALS,
        "pairs_scored": n_pairs,
        "n_clusters": n_clusters,
        "wall_sec": round(wall, 2),
        "pairs_per_sec": round(n_pairs / wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=0)
    args = ap.parse_args()
    if args.cores:
        print(json.dumps(run_one(args.cores)))
        return

    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
            capture_output=True, text=True, check=True,
        )
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
        print(results[cores])
    t8, t32 = results[8]["wall_sec"], results[32]["wall_sec"]
    speedup = t8 / t32
    efficiency = speedup / (32 / 8)
    summary = {
        "local8": results[8],
        "local32": results[32],
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(summary))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — scaling evidence (north_rule two-cluster-size criterion)\n\n"
            "Same job (full reconcile pipeline: extract -> blocking -> salted\n"
            "candidate pairs -> vectorized scoring -> large-star/small-star CC)\n"
            "on the same seeded synthetic corpus, at two parallelism levels\n"
            "(sandbox stand-in for N vs 4N executors).\n\n"
            f"- corpus: {N_JOURNALS} journals -> {results[8]['pairs_scored']} scored candidate pairs\n\n"
            "| parallelism | wall (s) | pairs scored/s |\n|---|---|---|\n"
            f"| local[8]  | {t8} | {results[8]['pairs_per_sec']} |\n"
            f"| local[32] | {t32} | {results[32]['pairs_per_sec']} |\n\n"
            f"- speedup 8->32 cores (4x resources): **{speedup:.2f}x**\n"
            f"- scaling efficiency = speedup / 4 = **{efficiency:.3f}** "
            f"(target >= 0.8)\n\n"
            "Run: `python tools/bench_scaling.py`\n"
        )


if __name__ == "__main__":
    main()
