"""spark-submit job entrypoint: end-to-end + resume identity (north_rule)."""

from __future__ import annotations

import os

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.jobs.reconcile_job import (
    main,
)


def test_job_runs_and_resumes_identically(spark, tmp_path):
    out = str(tmp_path / "job_out")
    main(["--synth", "300", "--output", out])
    clusters_1 = {
        (r["node"], r["cluster_id"])
        for r in spark.read.parquet(os.path.join(out, "clusters", "data")).collect()
    }
    assert clusters_1
    # restart with --resume: committed stages are reused; output identical
    main(["--synth", "300", "--output", out, "--resume"])
    clusters_2 = {
        (r["node"], r["cluster_id"])
        for r in spark.read.parquet(os.path.join(out, "clusters", "data")).collect()
    }
    assert clusters_1 == clusters_2
    # lineage rows accumulated for both runs, all stages present
    lin = spark.read.parquet(os.path.join(out, "lineage.parquet"))
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert {"extract", "blocking", "pairs", "scoring", "clustering"} <= stages
