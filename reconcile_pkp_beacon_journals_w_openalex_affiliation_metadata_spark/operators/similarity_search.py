"""Similarity search over an embedding column (array<float>).

Two paths, same results contract:
- ``brute_force_topk``: exact cosine top-k — the baseline, one pass, no
  shuffle (query vectors broadcast as literals / small-side broadcast join).
- ``ivf_topk``: IVF-style scale path — k-means-ish coarse centroids picked
  deterministically from the corpus, every vector assigned to its nearest
  centroid (map-only), queries probe ``n_probe`` nearest centroid cells and
  score only those cells. Shuffle = one hash join on cell id.

Both use native higher-order functions for the dot product (zip_with +
aggregate) — no Python in the scoring loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..partitioning import spread


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k per query: broadcast the (small) query side, score all
    vectors, window top-k. Cost O(|vectors| * |queries|) — the baseline.

    r6 plan shape: norms are computed ONCE per row/query (the factored
    ``_norm`` expression yields the identical double), and the per-pair dot
    runs through the Arrow-batched ``seq_dot_udf`` (same left-to-right fold
    order as the ``aggregate`` HOF it replaces — bit-exact) instead of
    interpreted per-element lambdas.
    """
    from ..functions.udfs import seq_dot_udf, seq_norm_udf

    # O(dim) math per (vector, query) pair: repair one-task scan
    # parallelism before paying it (no-op on parallel scans). The corpus
    # norm runs through the Arrow-batched fold (bit-exact with the
    # interpreted HOF — same addition order) instead of per-row lambdas.
    v = spread(vectors).select(
        F.col(id_col), F.col(vec_col), seq_norm_udf(F.col(vec_col)).alias("_vn")
    )
    q = queries.select(
        F.col(q_id_col), F.col(q_vec_col), seq_norm_udf(F.col(q_vec_col)).alias("_qn")
    )
    joined = v.crossJoin(F.broadcast(q))
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        F.round(
            seq_dot_udf(F.col(vec_col), F.col(q_vec_col))
            / (F.col("_vn") * F.col("_qn")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def _nearest_cells_udf(
    centroids: list[tuple[int, list[float]]], n: int, decimals: int = 9
):
    """Arrow-batched nearest-centroid picker: the centroid matrix travels in
    the UDF closure (serialized once per executor), the batch of vectors is
    one numpy matmul — map-only, no join, no O(cells x dim) literals in the
    plan. Ordering matches the previous literal-struct argmax: cosine rounded
    to ``decimals``, ties broken toward the larger cell id (the x9 driver
    query uses decimals=6 so a DuckDB oracle can replicate the argmax)."""
    cids = np.array([cid for cid, _ in centroids], dtype=np.int64)
    mat = np.array([v for _, v in centroids], dtype=np.float64)
    cn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def pick(vecs: pd.Series) -> pd.Series:
        v = np.array(vecs.tolist(), dtype=np.float64)  # (b, dim)
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        sims = np.round(vn @ cn.T, decimals)  # (b, cells)
        # desc by sim, ties desc by cell id (reverse(array_sort) parity)
        order = np.lexsort((-cids[None, :].repeat(len(v), 0), -sims), axis=1)
        top = order[:, :n]
        return pd.Series([cids[row].astype(int).tolist() for row in top],
                         index=vecs.index)

    return pick


def refine_ivf_centroids(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    iters: int = 2,
    vec_col: str = "embedding",
    assign_decimals: int = 9,
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd iterations over the seed centroids.

    Each round: map-only nearest-centroid assignment (the same Arrow argmax
    as the index build), then the per-cell mean via posexplode +
    groupBy(cell, dim) avg — all native. Only n_cells x dim aggregated rows
    reach the driver (the size of the centroid matrix itself, independent of
    corpus size — the same small-collect bound as ``build_ivf_index``).
    Empty cells keep their previous centroid. Deterministic given the same
    seed centroids and input up to floating-point summation order; the
    oracled x9 query keeps ``iters=0`` (exact seed centroids) so its DuckDB
    replica stays bit-reproducible, and refinement is measured by the
    recall@k pytest instead.

    Why it matters at scale: md5-seeded centroids follow the DATA density,
    so a skewed embedding distribution oversamples dense regions and starves
    sparse ones, inflating the cells a probe must scan; one or two Lloyd
    rounds move centroids toward the k-means optimum and recover probe
    recall without giving up the deterministic seed.
    """
    cur = centroids
    for _ in range(iters):
        pick1 = _nearest_cells_udf(cur, 1, decimals=assign_decimals)
        # spherical k-means update: assignment is by COSINE, so the centroid
        # update must average UNIT vectors — a raw mean would let one
        # large-magnitude member swing the whole cell's direction (direction
        # is all that matters; _nearest_cells_udf re-normalizes centroids)
        # compute the O(dim) norm ONCE per row; dividing inside the
        # transform lambda would re-evaluate it per element (O(dim^2)/row)
        norm = F.greatest(_norm(F.col(vec_col)), F.lit(1e-300))
        assigned = (
            vectors.select(F.col(vec_col).alias("raw"), norm.alias("n"))
            .select(
                F.transform(
                    F.col("raw"), lambda x: x.cast("double") / F.col("n")
                ).alias("v")
            )
            .withColumn("cell", pick1(F.col("v"))[0])
        )
        rows = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        cur = [
            (cid, [by_cell[cid][p] for p in range(len(old))])
            if cid in by_cell else (cid, old)
            for cid, old in cur
        ]
    return cur


def build_ivf_index(
    vectors: DataFrame, n_cells: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
    assign_decimals: int = 9,
    refine_iters: int = 0,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Deterministic coarse quantizer: centroids = the n_cells vectors with
    the smallest md5(id). ``orderBy(...).limit(n)`` compiles to
    TakeOrderedAndProject (per-partition top-n + driver merge — NOT a global
    sort), and only n_cells rows ever reach the driver. Assignment is a
    map-only Arrow-batched argmax against the closure-captured centroid
    matrix, so the plan stays O(1) regardless of n_cells x dim.
    ``refine_iters > 0`` runs that many distributed Lloyd rounds on the
    seed centroids before assignment (see ``refine_ivf_centroids``)."""
    cent_rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_cells)
        .collect()
    )
    centroids = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(cent_rows)]
    if refine_iters:
        centroids = refine_ivf_centroids(
            vectors, centroids, iters=refine_iters,
            vec_col=vec_col, assign_decimals=assign_decimals,
        )
    pick1 = _nearest_cells_udf(centroids, 1, decimals=assign_decimals)
    # assignment is the full-corpus Arrow pass (and downstream ivf_topk
    # scores on this partitioning via a broadcast probe join): spread a
    # one-task fixture scan across the cores first
    assigned = spread(vectors).withColumn("cell", pick1(F.col(vec_col))[0])
    return assigned, centroids


def ivf_insert(
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_decimals: int = 9,
    assume_new: bool = False,
) -> DataFrame:
    """Fold new vectors into an existing IVF index: the NEW batch is
    assigned against the FIXED centroids (map-only) and unioned with the
    committed assignments — no rebuild, no re-assignment of the old corpus.

    The idempotence guard anti-joins the new batch against the old ID
    column (an id-only pushdown scan + one shuffle over ids); pass
    ``assume_new=True`` to skip it when upstream dedup (e.g. the catalog
    resume filter) already guarantees unseen ids. Ids are treated as
    IMMUTABLE: a re-submitted id keeps its committed embedding/cell — this
    is append-only index maintenance, not upsert. Identical to rebuilding
    only while the coarse quantizer stays representative; rebuild when the
    distribution drifts (cell-size skew in ``assigned.groupBy('cell')`` is
    the canary).
    """
    pick1 = _nearest_cells_udf(centroids, 1, decimals=assign_decimals)
    fresh = new_vectors
    if not assume_new:
        # ids are unique in the index; no distinct needed for anti-join
        fresh = new_vectors.join(assigned.select(id_col), id_col, "left_anti")
    newly = fresh.withColumn("cell", pick1(F.col(vec_col))[0])
    return assigned.unionByName(newly.select(*assigned.columns))


def ivf_topk(
    assigned: DataFrame, centroids: list[tuple[int, list[float]]],
    queries: DataFrame, k: int = 10, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_vec",
    assign_decimals: int = 9, score_decimals: int = 6,
) -> DataFrame:
    """Approximate top-k: each query probes its n_probe nearest cells only.

    Same r6 scoring shape as ``brute_force_topk``: per-row norms factored
    out of the pair loop, Arrow-batched sequential-fold dot per probed pair
    (bit-exact with the interpreted HOF cosine it replaces)."""
    from ..functions.udfs import seq_dot_udf, seq_norm_udf

    pick = _nearest_cells_udf(centroids, n_probe, decimals=assign_decimals)
    q = queries.withColumn("cell", F.explode(pick(F.col(q_vec_col)))).withColumn(
        "_qn", seq_norm_udf(F.col(q_vec_col))
    )
    # corpus-side norm via the Arrow-batched fold (bit-exact, see
    # brute_force_topk) — the interpreted HOF was O(dim) lambda steps/row
    av = assigned.withColumn("_vn", seq_norm_udf(F.col(vec_col)))
    joined = av.join(q, "cell", "inner")
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        F.round(
            seq_dot_udf(F.col(vec_col), F.col(q_vec_col))
            / (F.col("_vn") * F.col("_qn")),
            score_decimals,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
