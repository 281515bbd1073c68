"""spark-submit entrypoint for the full reconcile pipeline.

Usage (cluster):

    zip -r pkg.zip reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark
    spark-submit --py-files pkg.zip \
        reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark/jobs/reconcile_job.py \
        --documents s3://corpus/documents --output s3://out/run1 \
        [--resume] [--n-salts 16] [--max-block-size 5000] \
        [--hot-pair-threshold 5000000] [--labeled s3://corpus/labeled_pairs]

``--labeled`` re-fits the scoring logistic on the given ground-truth table
(distributed pyspark.ml fit + F1-optimal threshold sweep) and serves the
fitted weights instead of the shipped constants.

Usage (sandbox smoke):

    python -m reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.jobs.reconcile_job \
        --synth 2000 --output /tmp/reconcile_out

Every stage commits through the catalog (atomic marker) and is skipped on
restart (--resume), satisfying north_rule's "resumable from the last
committed checkpoint"; per-partition lineage + match-rate metrics are
appended to the ``lineage`` table.
"""

from __future__ import annotations

import argparse
import sys
import uuid


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", help="path to the interleaved-span documents table")
    ap.add_argument("--synth", type=int, default=0, help="generate a seeded corpus of N journals instead")
    ap.add_argument("--output", required=True)
    ap.add_argument("--resume", action="store_true", help="skip committed stages")
    ap.add_argument("--n-salts", type=int, default=8)
    ap.add_argument("--max-block-size", type=int, default=None)
    ap.add_argument("--hot-pair-threshold", type=int, default=1_000_000)
    ap.add_argument("--run-id", default=None)
    ap.add_argument(
        "--labeled",
        help="labeled pairs table (left_id, right_id, is_match): re-fit the "
        "scoring logistic on it (pyspark.ml) and serve the fitted "
        "weights/threshold instead of the shipped constants",
    )
    ap.add_argument(
        "--calibrate-synth",
        action="store_true",
        help="with --synth: calibrate on the generated labeled pairs",
    )
    ap.add_argument(
        "--catalog-backend", default="marker",
        choices=["marker", "table", "iceberg"],
    )
    ap.add_argument(
        "--bucket-tables", type=int, default=0, metavar="N",
        help="commit records/candidate_pairs hash-bucketed (N buckets) on "
        "their scoring-join keys so downstream keyed joins run shuffle-free; "
        "needs --catalog-backend table or iceberg",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark import schemas, synth
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators import blocking, cluster, extract, lineage, pairs, scoring
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.sources.catalog import Catalog, run_stage

    # on a cluster the session comes from spark-submit; local fallback for smoke
    spark = SparkSession.builder.appName("reconcile_pkp_openalex").getOrCreate()
    run_id = args.run_id or uuid.uuid4().hex[:12]
    cat = Catalog(args.output, backend=args.catalog_backend)
    force = not args.resume
    if args.bucket_tables and args.catalog_backend == "marker":
        ap.error("--bucket-tables needs --catalog-backend table or iceberg")
    # bucket the two sides of the scoring join on their join keys: the
    # heaviest recurring shuffle becomes a one-time write-side cost
    rec_bucket = (["doc_id"], args.bucket_tables) if args.bucket_tables else None
    cand_bucket = (["left_id"], args.bucket_tables) if args.bucket_tables else None

    labeled = None
    if args.synth:
        corpus = synth.generate(seed=42, n_journals=args.synth)
        docs = spark.createDataFrame(corpus.documents, schema=schemas.DOCUMENTS)
        if args.calibrate_synth:
            labeled = spark.createDataFrame(
                corpus.labeled_pairs, schema=schemas.LABELED_PAIRS
            )
    else:
        if not args.documents:
            ap.error("--documents or --synth required")
        docs = spark.read.parquet(args.documents)
    schemas.assert_schema(docs, schemas.DOCUMENTS, "documents")

    lineage_rows = []

    records = run_stage(
        cat, spark, "records", lambda: extract.extract_records(docs),
        force=force, bucket_by=rec_bucket,
    )
    lineage_rows.append(lineage.partition_metrics(records, run_id, "extract"))

    keys = run_stage(cat, spark, "blocking_keys", lambda: blocking.blocking_keys(records), force=force)
    lineage_rows.append(lineage.partition_metrics(keys, run_id, "blocking"))

    cand = run_stage(
        cat, spark, "candidate_pairs",
        lambda: pairs.candidate_pairs(
            keys, n_salts=args.n_salts,
            hot_pair_threshold=args.hot_pair_threshold,
            max_block_size=args.max_block_size,
        ),
        force=force, bucket_by=cand_bucket,
    )
    lineage_rows.append(lineage.partition_metrics(cand, run_id, "pairs"))

    if args.labeled:
        labeled = spark.read.parquet(args.labeled)
    cal = None
    if labeled is not None:
        from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators import calibrate

        cal = calibrate.fit_calibration(records, labeled)
        print(
            f"calibration: n_train={cal.n_train} train_f1={cal.train_f1:.4f} "
            f"threshold={cal.threshold:.4f} weights={ {k: round(v, 4) for k, v in cal.weights.items()} }"
        )

    # a fresh calibration invalidates any committed scored/clusters tables:
    # force those stages even under --resume, else the fitted weights would
    # be silently discarded in favor of the stale decisions
    force_scoring = force or cal is not None
    scored = run_stage(
        cat, spark, "scored",
        lambda: scoring.score_pairs(
            cand, records,
            weights=cal.weights if cal else None,
            threshold=cal.threshold if cal else None,
        ),
        force=force_scoring,
    )
    lineage_rows.append(lineage.partition_metrics(scored, run_id, "scoring"))
    lineage_rows.append(lineage.match_rate_metrics(scored, run_id))

    clusters = run_stage(
        cat, spark, "clusters",
        lambda: cluster.connected_components(
            scoring.matched_edges(scored), assume_no_self_loops=True
        ),
        force=force_scoring,
    )
    lineage_rows.append(lineage.partition_metrics(clusters, run_id, "clustering"))

    lin = lineage_rows[0]
    for extra in lineage_rows[1:]:
        lin = lin.unionByName(extra)
    # lineage is append-only across runs
    lin.write.mode("append").parquet(f"{args.output}/lineage.parquet")

    n_pairs = scored.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(f"run_id={run_id} pairs_scored={n_pairs} clusters={n_clusters} output={args.output}")


if __name__ == "__main__":
    # script-mode bootstrap: `python .../jobs/<job>.py` (or spark-submit
    # without --py-files) puts the jobs/ dir on sys.path, not the repo root
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    )
    sys.exit(main())
