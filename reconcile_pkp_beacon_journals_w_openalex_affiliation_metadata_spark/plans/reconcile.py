"""The flagship end-to-end plan: documents -> clusters.

Mirrors the reference pipeline order (compare_openalex/README.md:3-20)
re-expressed Spark-first:

    documents (interleaved spans, input_hint)
      -> extract_records       (order-preserving span ops + ascii-fold UDF)
      -> blocking_keys         (ISSN exact | title minhash bands | domain)
      -> candidate_pairs       (salted hash join, skew split, dedup)
      -> score_pairs           (vectorized similarity + calibrated logistic)
      -> matched_edges -> connected_components (large-star/small-star)

Each stage is a pure DataFrame -> DataFrame function; the catalog layer
(sources.catalog) commits stage outputs for resumability.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..operators import blocking, cluster, extract, pairs, scoring


@dataclass
class ReconcileResult:
    records: DataFrame
    keys: DataFrame
    candidate_pairs: DataFrame
    scored: DataFrame
    clusters: DataFrame

    def unpersist(self) -> None:
        """Release every cache the plan took (records/keys/candidates, and
        scored when clustering persisted it). Call after the consumer has
        materialized or committed what it needs — cached plans otherwise
        pin executor storage for the session lifetime (guide §5:
        "unpersist when done"). Blocking=False: eager eviction is not worth
        stalling the driver."""
        for df in (self.records, self.keys, self.candidate_pairs, self.scored):
            if df is not None:
                df.unpersist()


def reconcile(
    documents: DataFrame,
    n_salts: int = pairs.DEFAULT_N_SALTS,
    hot_pair_threshold: int = 1_000_000,
    max_block_size: int | None = None,
    with_clusters: bool = True,
) -> ReconcileResult:
    # records feeds blocking AND both sides of the scoring join; keys feeds
    # size measurement AND the pair join — persist both so the extract and
    # blocking UDF passes run once each
    records = extract.extract_records(documents).persist()
    # keys feeds two consumers (size measurement + the pair join); persist so
    # the blocking UDF pass over all documents runs once (committed catalog
    # table in production)
    keys = blocking.blocking_keys(records).persist()
    cand = pairs.candidate_pairs(
        keys,
        n_salts=n_salts,
        hot_pair_threshold=hot_pair_threshold,
        max_block_size=max_block_size,
    ).persist()
    scored = scoring.score_pairs(cand, records)
    if with_clusters:
        # clustering iterates over the matched edges; persist the scored
        # table so the (expensive) blocking+scoring DAG is computed once
        # (in production this is the committed catalog table instead)
        scored = scored.persist()
        # matched edges are pkp-side x oa-side ids — u == v impossible, so
        # CC's roll-up skips the self-loop recovery pass over the input
        clusters = cluster.connected_components(
            scoring.matched_edges(scored), assume_no_self_loops=True
        )
    else:
        clusters = None
    return ReconcileResult(records, keys, cand, scored, clusters)
