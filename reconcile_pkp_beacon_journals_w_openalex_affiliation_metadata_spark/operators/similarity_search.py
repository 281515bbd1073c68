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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    vectors, window top-k. Cost O(|vectors| * |queries|) — the baseline."""
    joined = vectors.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(q_vec_col)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def build_ivf_index(
    vectors: DataFrame, n_cells: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Deterministic coarse quantizer: centroids = the n_cells vectors with the
    smallest md5(id) (a seeded sample without an RNG), then one assignment
    pass. Returns (assigned vectors with cell ids, centroid list).

    At 100 TB the centroid list stays tiny (thousands) and is broadcast; the
    assignment is map-only."""
    cent_rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_cells)
        .collect()
    )
    centroids = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(cent_rows)]

    def best_cell(vec_col_name: str):
        sims = [
            F.struct(
                F.round(cosine(F.col(vec_col_name), F.array(*[F.lit(v) for v in cvec])), 9)
                .alias("s"),
                F.lit(cid).alias("cid"),
            )
            for cid, cvec in centroids
        ]
        return F.array_max(F.array(*sims))["cid"]

    assigned = vectors.withColumn("cell", best_cell(vec_col))
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame, centroids: list[tuple[int, list[float]]],
    queries: DataFrame, k: int = 10, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: each query probes its n_probe nearest cells only."""
    sims = [
        F.struct(
            F.round(cosine(F.col(q_vec_col), F.array(*[F.lit(v) for v in cvec])), 9).alias("s"),
            F.lit(cid).alias("cid"),
        )
        for cid, cvec in centroids
    ]
    probe_cells = F.slice(
        F.reverse(F.array_sort(F.array(*sims))), 1, n_probe
    )
    q = queries.withColumn("cell", F.explode(F.transform(probe_cells, lambda s: s["cid"])))
    joined = assigned.join(q, "cell", "inner")
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(q_vec_col)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
