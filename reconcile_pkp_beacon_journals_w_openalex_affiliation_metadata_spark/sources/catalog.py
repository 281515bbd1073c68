"""Committed-table catalog: the Iceberg stand-in.

Production deployments put every stage output in an Iceberg table (atomic
snapshot commits, partition pruning, incremental reads). This sandbox has no
Iceberg runtime jar, so the same contract is provided over parquet:

- ``write_committed``: stage output written to ``<table>/_staging_<token>``,
  then atomically renamed to ``<table>/data`` + a ``_COMMIT`` marker written
  last. Readers only see fully-committed data (the reference gets this from
  append-mode gz writers + filesystem existence checks, main.rs:381,
  vlm_text_extractor.py:611-646).
- ``read_committed``: returns None unless the commit marker exists.
- ``resume_filter``: left **anti-join** of the input against the committed
  output's keys — the reference's skip-if-output-exists resume
  (vlm_text_extractor.py:663-670) as a distributed operator (SURVEY S12/J4).

Directory layout per table:  <root>/<name>/data/*.parquet + <root>/<name>/_COMMIT
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _marker(self, name: str) -> str:
        return os.path.join(self._dir(name), "_COMMIT")

    def is_committed(self, name: str) -> bool:
        return os.path.exists(self._marker(name))

    def write_committed(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> None:
        """Write + atomic publish. Invariant at every crash point: the
        committed state is marker-AND-data or neither.

        Overwrite order matters: the old _COMMIT marker is removed BEFORE
        the old data dir is deleted (a crash in between leaves an
        uncommitted table that a restart recomputes, never a committed
        table with missing data), and the new marker is published via
        write-to-temp + os.replace so readers never see a torn marker."""
        tdir = self._dir(name)
        staging = os.path.join(tdir, f"_staging_{uuid.uuid4().hex[:8]}")
        data = os.path.join(tdir, "data")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(staging)
        marker = self._marker(name)
        if os.path.exists(marker):
            os.remove(marker)  # demote to uncommitted before touching data
        if os.path.exists(data):
            shutil.rmtree(data)
        os.replace(staging, data)
        tmp_marker = marker + f".tmp_{uuid.uuid4().hex[:8]}"
        with open(tmp_marker, "w") as f:
            json.dump({"table": name, "meta": meta or {}}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp_marker, marker)

    def read_committed(self, spark: SparkSession, name: str) -> DataFrame | None:
        if not self.is_committed(name):
            return None
        return spark.read.parquet(os.path.join(self._dir(name), "data"))

    def drop(self, name: str) -> None:
        if os.path.exists(self._dir(name)):
            shutil.rmtree(self._dir(name))

    def resume_filter(
        self, spark: SparkSession, inputs: DataFrame, name: str, key: str | list[str]
    ) -> DataFrame:
        """Inputs not yet present in the committed table (by key) — restart
        processes only the remainder."""
        done = self.read_committed(spark, name)
        if done is None:
            return inputs
        keys = [key] if isinstance(key, str) else list(key)
        return inputs.join(done.select(*keys).distinct(), keys, "left_anti")


def run_stage(
    catalog: Catalog,
    spark: SparkSession,
    name: str,
    build: "callable",
    partition_by: list[str] | None = None,
    force: bool = False,
) -> DataFrame:
    """Checkpointed stage runner: skip when committed, else build + commit.
    ``build()`` -> DataFrame. Restart-safe: a rerun after a crash recomputes
    only uncommitted stages (north_rule resumability)."""
    if not force:
        cached = catalog.read_committed(spark, name)
        if cached is not None:
            return cached
    df = build()
    catalog.write_committed(df, name, partition_by=partition_by)
    return catalog.read_committed(spark, name)
