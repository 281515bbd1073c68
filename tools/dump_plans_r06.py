"""Dump `.explain("formatted")` output for the r6-touched queries into
plans/r06/<query>_<suffix>.txt.

Usage: python tools/dump_plans_r06.py <repo_root> <out_dir> <suffix> [sf_dir]

Run once with repo_root = a worktree of the round-start commit (suffix
"before") and once with the current tree (suffix "after"); the judge diffs
the pairs against the claims in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

QUERIES = [
    "x1_reconcile_flagship",
    "x2_minhash_lsh_pairs",
    "x3_simhash_codes",
    "x4_ann_lsh_topk",
    "x9_ann_ivf_topk",
    "x13_delta_ngram_jaccard",
    "t16_decontamination",
    "j3_top1_per_group",
    "j5_connected_components",
    "t6_embedding_topk",
    "t8_ngram_jaccard_dedup",
    "x7_embedding_near_dup",
    "x14_minhash_jaccard_estimate",
    "t12_near_dup_groups",
    "t13_dedup_decisions",
    "t11_sequence_packing_slices",
    "t14_pack_materialize",
]


def main():
    repo_root = os.path.abspath(sys.argv[1])
    out_dir = os.path.abspath(sys.argv[2])
    suffix = sys.argv[3]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"
    sys.path.insert(0, repo_root)
    import __spark_entry__ as entry_mod
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.session import (
        get_spark,
    )

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans_{suffix}", cores=8, shuffle_partitions=8)
    qs = entry_mod.queries()
    for name in QUERIES:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, suffix)


if __name__ == "__main__":
    main()
