"""Transitive clustering: iterative large-star / small-star connected
components as DataFrame self-joins with checkpointed convergence.

The reference makes per-pair decisions only (check_landing_page...py emits
one decision per row; no transitive closure anywhere) — clusters are the
north_rule extension. Algorithm: Kiveris et al., "Connected Components in
MapReduce and Beyond" (SOCC'14) — alternating large-star/small-star rounds,
each a groupBy-min + join, O(log n) rounds on any graph shape.

Scale notes:
- every round is one shuffle (groupBy node) + one broadcast-size-agnostic
  join on node; ``localCheckpoint()`` after each round truncates lineage so
  the plan doesn't grow across iterations (SURVEY.md §7.4 risk (e)),
- convergence = the edge multiset stops changing, tested with a cheap
  count + xxhash64 checksum aggregate (no full exceptAll at scale),
- node ids are strings; min() over the string total order picks the root.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """Connect every neighbor v > u to min(N(u) ∪ {u}).

    ``dedup=False`` skips the output ``distinct`` (one Exchange less per
    round): the composed round ``_small_star(_large_star(e))`` is
    duplicate-insensitive — small-star's groupBy-min ignores multiplicity
    and its own final distinct collapses the round's output — and the
    un-deduped intermediate is bounded by the input edge count, so the
    round result is identical while shuffling one fewer pass.
    """
    und = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = und.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.withColumn("m", F.least(F.col("mv"), F.col("u"))).drop("mv")
    out = (
        und.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out.distinct() if dedup else out


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's smaller-or-equal neighborhood, connect all to the min."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        directed.join(mins, "u")
        .select(F.col("v").alias("node"), "m")
        .unionByName(mins.select(F.col("u").alias("node"), "m"))
        .where(F.col("node") != F.col("m"))
        .select(F.col("node").alias("u"), F.col("m").alias("v"))
        .distinct()
    )
    return out


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        # decimal sum: ANSI-safe (no long overflow) and order-independent
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
    checkpoint_each_round: bool = True,
    rounds_per_check: int = 1,
    assume_dedup: bool = False,
    assume_no_self_loops: bool = False,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``edges``(u, v).

    cluster_id = min node id of the component (deterministic, order-free —
    the CC invariants of SURVEY.md §5.5).

    ``assume_dedup=True`` skips the defensive input ``distinct`` — pass it
    when the caller already deduplicated (j5/j6 do); the star rounds are
    multiplicity-insensitive, so this only drops a redundant shuffle, never
    changes labels. The input plan is deliberately NOT persisted: an A/B
    at the 10x proxy measured the cache materialization barrier costing
    MORE (+1.5s) than it saves, and since the r6 roll-up rewrite the input
    plan is evaluated ONCE anyway (round 0) — the roll-up reads only the
    converged, checkpointed star graph (plus, when self-loops are
    possible, one filter-pushed pass for them).

    ``assume_no_self_loops=True`` additionally skips the self-loop
    singleton pass — pass it when no input row can have ``u == v`` (pair
    generators emitting ``left < right``, side-prefixed bipartite keys).
    A caller whose edges CAN carry ``u == v`` rows (e.g. the incremental
    plan's seed edges, which encode prior singletons as ``(r, r)``) must
    leave it False or those nodes vanish from the output.
    """
    e = edges.select("u", "v").where(F.col("u") != F.col("v"))
    if not assume_dedup:
        e = e.distinct()
    prev = None
    for i in range(max_iter):
        e = _small_star(_large_star(e, dedup=False))
        if checkpoint_each_round:
            # lazy: the next action materializes the checkpoint, so a round
            # costs ONE job; convergence is tested every
            # ``rounds_per_check`` rounds. Default 1: the checksum is a
            # cheap count+sum agg over the already-checkpointed edges,
            # while a wasted star round is a full groupBy+join+distinct
            # pass — checking every round converges in the minimum number
            # of rounds (r6: measured 4.4s -> 3.2s on the j5 graph, 5.9s ->
            # 5.1s on the flagship edge set at sf1.0; the same trade holds
            # at corpus scale where rounds dwarf the agg even more).
            # Checkpointing EVERY round is load-bearing, not
            # just lineage hygiene: a round reads its input from several
            # places (both union branches of ``und`` and the groupBy), so an
            # un-truncated 2-round plan recomputes the previous round
            # multiplicatively — measured 5x slower at sf1.0 when the
            # checkpoint was moved to check boundaries only.
            e = e.localCheckpoint(eager=False)
        if (i + 1) % rounds_per_check == 0 or i == max_iter - 1:
            cur = _checksum(e)
            if cur == prev:
                break
            prev = cur
    # Converged star graph: every edge is (member, root), members and roots
    # are disjoint, and the rounds preserve the (u != v)-filtered node set —
    # so labels ∪ distinct-roots IS the full non-isolated node assignment.
    # The roll-up therefore reads ONLY the checkpointed converged edges:
    # the pre-r6 ``all_nodes`` formulation re-evaluated the ENTIRE upstream
    # edge DAG a second time (for t12/t13 that is the whole LSH band join)
    # and paid a 2|E|-row distinct plus an anti-join against the labels.
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    roots = (
        e.select(F.col("v").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("cluster_id"))
    )
    out = labels.unionByName(roots)
    if not assume_no_self_loops:
        # nodes seen ONLY in self-loop rows never enter the rounds; recover
        # them with one highly selective filter-pushed pass over the input
        # (u == v prunes at the scan) anti-joined against the converged
        # node set. When the pass yields nothing — every production caller —
        # AQE's empty-relation propagation elides the join at runtime.
        self_nodes = (
            edges.where(F.col("u") == F.col("v"))
            .select(F.col("u").alias("node"))
            .distinct()
        )
        in_e = labels.select("node").unionByName(
            e.select(F.col("v").alias("node"))
        )
        singles = self_nodes.join(in_e, "node", "left_anti").select(
            "node", F.col("node").alias("cluster_id")
        )
        out = out.unionByName(singles)
    return out
