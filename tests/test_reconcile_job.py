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


def test_job_calibrated_run_meets_f1_gate(spark, tmp_path):
    """--calibrate-synth: the job re-fits the logistic in-run and the fitted
    decisions still clear the F1 >= 0.99 gate on the ground truth."""
    from pyspark.sql import functions as F

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark import (
        schemas,
        synth,
    )

    out = str(tmp_path / "job_cal_out")
    main(["--synth", "300", "--output", out, "--calibrate-synth"])
    scored = spark.read.parquet(os.path.join(out, "scored", "data"))
    corpus = synth.generate(seed=42, n_journals=300)
    labeled = spark.createDataFrame(corpus.labeled_pairs, schema=schemas.LABELED_PAIRS)
    joined = labeled.join(
        scored.select(
            "left_id", "right_id", F.col("is_match_pred").alias("pred")
        ),
        ["left_id", "right_id"],
        "left",
    ).withColumn("pred", F.coalesce(F.col("pred"), F.lit(False)))
    row = joined.agg(
        F.sum((F.col("is_match") & F.col("pred")).cast("int")).alias("tp"),
        F.sum((~F.col("is_match") & F.col("pred")).cast("int")).alias("fp"),
        F.sum((F.col("is_match") & ~F.col("pred")).cast("int")).alias("fn"),
    ).collect()[0]
    f1 = 2 * row["tp"] / (2 * row["tp"] + row["fp"] + row["fn"])
    assert f1 >= 0.99
