"""Tests: observe() counters (audit-sum discipline), per-partition lineage
rows, and the Trigger.AvailableNow incremental mode (exactly-once restart)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_observe_counts_audit_sum(spark):
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.lineage import (
        observe_counts,
    )

    df = spark.range(100).withColumn("v", F.col("id") % 10)
    observed, obs = observe_counts(
        df, "stage_x",
        {"small": F.col("v") < 3, "large": F.col("v") >= 3},
    )
    observed.collect()
    got = obs.get
    # filter-reason buckets must sum to rows read (main.rs:86-144 discipline)
    assert got["rows_total"] == 100
    assert got["small"] + got["large"] == got["rows_total"]
    assert got["small"] == 30


def test_partition_metrics_rows(spark):
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.lineage import (
        partition_metrics,
    )

    df = spark.range(1000).repartition(4)
    rows = partition_metrics(df, "run1", "extract").collect()
    assert sum(r["value"] for r in rows) == 1000
    assert {r["stage"] for r in rows} == {"extract"}
    assert all(r["run_id"] == "run1" for r in rows)


def test_incremental_available_now_exactly_once(spark, tmp_path, corpus_dfs):
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.streaming.incremental import (
        incremental_documents,
    )

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out: list[int] = []

    docs = corpus_dfs["documents"]
    docs.limit(40).write.mode("overwrite").parquet(in_dir)

    def batch_fn(bdf, bid):
        out.append(bdf.count())

    incremental_documents(spark, in_dir, ckpt, batch_fn)
    first_total = sum(out)
    assert first_total == 40

    # restart with no new files: checkpoint must prevent reprocessing
    incremental_documents(spark, in_dir, ckpt, batch_fn)
    assert sum(out) == first_total

    # add new files: only the delta is processed
    docs.orderBy("doc_id").limit(60).write.mode("overwrite").parquet(str(tmp_path / "more"))
    import shutil
    import glob
    import os

    for i, f in enumerate(glob.glob(str(tmp_path / "more" / "*.parquet"))):
        shutil.copy(f, os.path.join(in_dir, f"extra_{i}.parquet"))
    incremental_documents(spark, in_dir, ckpt, batch_fn)
    assert sum(out) == first_total + 60


def test_first_seen_stream_dedups_across_microbatches(spark, tmp_path):
    """applyInPandasWithState per-key state survives micro-batch boundaries:
    a key that appeared in batch 1 is suppressed in batch 2."""
    import json

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.streaming.stateful import (
        first_seen_stream,
    )

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows):
        (src / name).write_text("\n".join(json.dumps(r) for r in rows))

    # two files -> two micro-batches (maxFilesPerTrigger=1); key k1 repeats
    # within batch 1 AND across batches; k2 only in batch 2
    write_file("a.json", [
        {"content_key": "k1", "doc_id": 1},
        {"content_key": "k1", "doc_id": 2},
    ])
    write_file("b.json", [
        {"content_key": "k1", "doc_id": 3},
        {"content_key": "k2", "doc_id": 4},
    ])

    stream = (
        spark.readStream.schema("content_key string, doc_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    deduped = first_seen_stream(stream, "content_key")
    q = (
        deduped.writeStream.format("memory")
        .queryName("first_seen_t")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from first_seen_t").collect()
    by_key = {r["content_key"]: r for r in rows}
    assert set(by_key) == {"k1", "k2"}
    assert len(rows) == 2  # k1 emitted exactly once despite 3 occurrences
