"""SparkSession factory tuned for the linkage workload.

Local mode here stands in for a multi-executor cluster; every knob is chosen
so the same plan shape survives a 1000-executor deployment:

- AQE on (runtime coalesce + skew-join splitting),
- Arrow on (all Python crossings are vectorized pandas UDFs),
- shuffle partitions sized to cores locally; at cluster scale this is set to
  2-3x total cores via spark-submit conf, the code never assumes a value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "pkp_openalex_linkage",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` controls ``local[N]`` in the sandbox; on a real cluster the
    master URL comes from spark-submit and this arg is ignored by Spark.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        n = os.cpu_count() or DEFAULT_SHUFFLE_PARTITIONS
        shuffle_partitions = min(64, max(8, n))

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
        # the records side of the scoring join is tiny relative to pairs;
        # let Catalyst broadcast up to 64MB (default 10MB misses it locally)
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # nested-schema pruning: read only the touched struct fields, the
        # Spark analogue of the reference's serde projection (main.rs:69-84)
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
