"""Candidate-pair generation: salted hash joins with explicit skew-key split.

north_rule: "multi-key blocking ... generates candidate pairs via salted hash
joins with explicit skew-key splitting". The reference meets skew only with
per-domain politeness locks (retrieve_landing_pages.py:112-115); at 10^12-doc
scale a hot publisher/ISSN key would put an entire block in one task, so:

1. block sizes are measured (one cheap agg over the keys table),
2. keys whose pair-product exceeds ``hot_pair_threshold`` are split:
   the left side gets a deterministic salt ``pmod(xxhash64(doc_id), n_salts)``,
   the right side is replicated over all salts, and the join key becomes
   (key, salt) — same output pairs, ~n_salts× the parallelism,
3. degenerate keys whose block exceeds ``max_block_size`` members (stopword
   title-bands, mega-domains) are dropped with a logged metric — they carry
   no discriminating signal and would produce quadratic garbage pairs.

The final pair set is deduped across key families with a groupBy that also
records provenance (how many and which keys paired the two docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .blocking import block_size_metrics

DEFAULT_N_SALTS = 8


def candidate_pairs(
    keys: DataFrame,
    n_salts: int = DEFAULT_N_SALTS,
    hot_pair_threshold: int = 1_000_000,
    max_block_size: int | None = None,
) -> DataFrame:
    """(left_id, right_id, blocking_key, n_shared_keys) candidate pairs.

    ``keys``: output of ``blocking.blocking_keys`` — (doc_id, side, key).
    Left = side 'pkp', right = side 'oa'; a pair is emitted once per shared
    key, then deduped.
    """
    # ONE size-measuring pass; only the EXCEPTIONAL keys come back to the
    # driver — oversized (dropped) and hot (salted) blocks are a handful of
    # keys even at 10^12 docs, so they travel as literal predicates instead
    # of a join against the O(#distinct keys) size table.
    sizes = block_size_metrics(keys)
    cond_over = (
        F.col("block_size") > max_block_size
        if max_block_size is not None
        else F.lit(False)
    )
    cond_hot = F.col("n_left") * F.col("n_right") > hot_pair_threshold
    exceptional = sizes.where(cond_over | cond_hot).select(
        "key", cond_over.alias("oversized")
    ).collect()
    dropped_keys = [r["key"] for r in exceptional if r["oversized"]]
    hot_keys = [r["key"] for r in exceptional if not r["oversized"]]

    k = keys
    if len(dropped_keys) + len(hot_keys) > 10_000:
        # degenerate corpus: too many exceptional keys for literal predicates;
        # fall back to broadcast joins of the key lists
        spark = keys.sparkSession
        if dropped_keys:
            ddf = spark.createDataFrame([(x,) for x in dropped_keys], "key string")
            k = k.join(F.broadcast(ddf), "key", "left_anti")
        hdf = spark.createDataFrame([(x,) for x in hot_keys] or [("",)], "key string")
        k = k.join(
            F.broadcast(hdf.withColumn("is_hot", F.lit(True))), "key", "left"
        ).withColumn("is_hot", F.coalesce(F.col("is_hot"), F.lit(False)))
    else:
        if dropped_keys:
            k = k.where(~F.col("key").isin(dropped_keys))
        is_hot = F.col("key").isin(hot_keys) if hot_keys else F.lit(False)
        k = k.withColumn("is_hot", is_hot)

    left = k.where(F.col("side") == "pkp").select(
        F.col("doc_id").alias("left_id"), "key", "is_hot"
    )
    right = k.where(F.col("side") == "oa").select(
        F.col("doc_id").alias("right_id"), "key", "is_hot"
    )

    # cold path: plain equi-join on key
    cold = left.where(~F.col("is_hot")).drop("is_hot").join(
        right.where(~F.col("is_hot")).drop("is_hot"), "key", "inner"
    ).select("left_id", "right_id", "key")

    pairs = cold
    if hot_keys:
        # hot path: salt left, replicate right over all salts
        salts = F.array(*[F.lit(i) for i in range(n_salts)])
        hot_left = left.where(F.col("is_hot")).withColumn(
            "salt", F.pmod(F.xxhash64("left_id"), F.lit(n_salts)).cast("int")
        )
        hot_right = right.where(F.col("is_hot")).withColumn("salt", F.explode(salts))
        hot = hot_left.join(hot_right, ["key", "salt"], "inner").select(
            "left_id", "right_id", "key"
        )
        pairs = cold.unionByName(hot)
    return pairs.groupBy("left_id", "right_id").agg(
        F.min("key").alias("blocking_key"),
        F.count("*").alias("n_shared_keys"),
    )
