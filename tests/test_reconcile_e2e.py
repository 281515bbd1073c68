"""End-to-end reconciliation fixture: F1 >= 0.99 on labeled pairs
(BASELINE.json north_rule) + span-sequence invariant (input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.plans.reconcile import (
    reconcile,
)


def test_pairwise_f1_at_least_099(corpus_dfs):
    res = reconcile(corpus_dfs["documents"], with_clusters=False)
    pred = res.scored.select(
        "left_id", "right_id", F.col("is_match_pred").alias("pred")
    )
    labeled = corpus_dfs["labeled_pairs"]
    joined = labeled.join(pred, ["left_id", "right_id"], "left").withColumn(
        "pred", F.coalesce(F.col("pred"), F.lit(False))
    )
    row = joined.agg(
        F.sum((F.col("is_match") & F.col("pred")).cast("int")).alias("tp"),
        F.sum((~F.col("is_match") & F.col("pred")).cast("int")).alias("fp"),
        F.sum((F.col("is_match") & ~F.col("pred")).cast("int")).alias("fn"),
        F.count("*").alias("n"),
    ).collect()[0]
    tp, fp, fn = row["tp"], row["fp"], row["fn"]
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    assert row["n"] > 100
    assert f1 >= 0.99, f"F1={f1:.4f} (P={precision:.4f}, R={recall:.4f}, tp={tp}, fp={fp}, fn={fn})"


def test_span_sequence_invariant(corpus_dfs, corpus):
    """Per-row span-sequence equality (kind, text, media_ref, order) between
    the Spark-side table and the generator's materialization."""
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in corpus_dfs["documents"].collect()
    }
    want = {
        d["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]
        ]
        for d in corpus.documents
    }
    assert got == want


def test_extract_preserves_span_order_after_shuffle(corpus_dfs):
    """extract must not depend on physical row order: repartition wildly,
    results identical (order-preserving array ops only)."""
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.extract import (
        extract_records,
    )

    a = extract_records(corpus_dfs["documents"]).orderBy("doc_id").collect()
    b = (
        extract_records(corpus_dfs["documents"].repartition(13))
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_clusters_contain_matches(corpus_dfs):
    res = reconcile(corpus_dfs["documents"], with_clusters=True)
    clusters = {r["node"]: r["cluster_id"] for r in res.clusters.collect()}
    truth = corpus_dfs["labeled_pairs"].where("is_match").collect()
    same = sum(
        1
        for t in truth
        if clusters.get(t["left_id"]) is not None
        and clusters.get(t["left_id"]) == clusters.get(t["right_id"])
    )
    # every true pair that was predicted matched must share a cluster;
    # allow the same small miss budget as the F1 gate
    assert same / len(truth) >= 0.98


def test_reconcile_unpersist_drains_caches(spark, corpus_dfs):
    """r6: ReconcileResult.unpersist() releases every cache the plan took —
    cached stage plans must not outlive the consumer (optimization-guide §5).
    Asserted on the stage DataFrames' own storage levels (the CC rounds'
    localCheckpoint RDDs are cleaned asynchronously by the ContextCleaner,
    so a global getPersistentRDDs count would be racy)."""
    res = reconcile(corpus_dfs["documents"], with_clusters=True)
    res.clusters.count()  # materializes all stage caches
    cached = [res.records, res.keys, res.candidate_pairs, res.scored]
    assert all(df.storageLevel.useMemory or df.storageLevel.useDisk for df in cached)
    res.unpersist()
    assert not any(
        df.storageLevel.useMemory or df.storageLevel.useDisk for df in cached
    )
