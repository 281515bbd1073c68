"""Incremental ingest: Structured Streaming with Trigger.AvailableNow.

The reference is pure batch; its only streaming-adjacent behavior is
resumable/incremental processing (vlm_text_extractor.py:637-646 skip-if-done;
main.rs:381 append-mode writes). SURVEY.md §2.9 maps that to checkpointed
batch; this module adds the optional true-streaming mode on top: new document
files landing in a directory are picked up exactly-once via Structured
Streaming's file source + checkpoint, each micro-batch runs the SAME batch
operators (foreachBatch), and Trigger.AvailableNow drains what exists then
stops — semantically identical to the batch pipeline, restart-safe via the
streaming checkpoint instead of the catalog anti-join.

At cluster scale the file source scales to object-store listings; swap in
Kafka/Iceberg-CDC sources without touching the transform (it is the same
DataFrame function).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .. import schemas


def incremental_documents(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    max_files_per_trigger: int | None = None,
):
    """Drain all currently-available document parquet files through
    ``batch_fn(batch_df, batch_id)`` exactly once, then stop.

    ``batch_fn`` typically runs a pipeline stage and commits through the
    catalog; the streaming checkpoint guarantees each file contributes to
    exactly one successful batch across restarts."""
    reader = (
        spark.readStream.schema(schemas.DOCUMENTS)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(input_dir)

    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_incremental_reconcile(
    cat,
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    **reconcile_kwargs,
):
    """End-to-end incremental ingest: every micro-batch of newly landed
    document files is folded into the committed reconcile state via
    ``plans.incremental.incremental_reconcile`` (delta pairs + seeded CC).

    Exactly-once comes from two independent layers — the streaming
    checkpoint (a file feeds one successful batch) AND the plan's
    anti-join on committed records (a replayed doc is a no-op) — so a
    crash between the two commits cannot double-process.
    """
    from ..plans.incremental import incremental_reconcile

    results = []

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = incremental_reconcile(cat, spark, batch_df, **reconcile_kwargs)
        results.append(
            {"batch_id": batch_id, "n_new": res.n_new_records,
             "n_delta_pairs": res.n_delta_pairs,
             "n_delta_matches": res.n_delta_matches}
        )

    incremental_documents(
        spark, input_dir, checkpoint_dir, _fold,
        max_files_per_trigger=max_files_per_trigger,
    )
    return results
