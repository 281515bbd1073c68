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


def test_job_bucketed_table_backend_matches_marker(spark, tmp_path):
    """--catalog-backend table --bucket-tables N: same clusters as the
    default marker run; the committed records/candidate_pairs carry the
    bucket spec (scoring-join shuffle paid at write time)."""
    out_m = str(tmp_path / "job_marker")
    out_b = str(tmp_path / "job_bucketed")
    main(["--synth", "200", "--output", out_m])
    main([
        "--synth", "200", "--output", out_b,
        "--catalog-backend", "table", "--bucket-tables", "8",
    ])
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.sources.catalog import (
        Catalog,
    )

    cat_b = Catalog(out_b, backend="table")
    marker_clusters = {
        (r["node"], r["cluster_id"])
        for r in spark.read.parquet(os.path.join(out_m, "clusters", "data")).collect()
    }
    bucket_clusters = {
        (r["node"], r["cluster_id"])
        for r in cat_b.read_committed(spark, "clusters").collect()
    }
    assert marker_clusters == bucket_clusters
    # the committed records table really is bucketed
    ident = cat_b._table_ident("records")
    ddl = spark.sql(f"DESCRIBE TABLE EXTENDED {ident}").collect()
    as_text = "\n".join(f"{r['col_name']} {r['data_type']}" for r in ddl)
    assert "doc_id" in as_text and "8" in as_text and "Bucket" in as_text
    for t in ("records", "blocking_keys", "candidate_pairs", "scored", "clusters"):
        cat_b.drop(t, spark)
