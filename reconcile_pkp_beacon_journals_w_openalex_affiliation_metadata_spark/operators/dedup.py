"""Deduplication operator family for the training-data pipeline.

Five strategies over a (id, text) corpus — each returns a DataFrame of
duplicate groups or near-dup pairs. At 100 TB the shape that matters is:
keys computed locally (map-only), ONE shuffle per strategy (the groupBy or
band self-join), hot band keys capped.

- exact:          hash-groupBy on the full normalized text
- minhash_lsh:    shingle -> minhash -> band -> bucket self-join
- simhash:        64-bit simhash, pairs within hamming radius via 4-way
                  block rotation (Manku et al., WWW'07 table approach)
- ngram_jaccard:  character n-gram Jaccard verify on LSH candidates
- embedding:      cosine near-dup over an embedding column
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.udfs import make_minhash_bands_udf, simhash_udf
from ..partitioning import spread

# RE2-exact ASCII whitespace run ('\s' under RE2 is exactly [\t\n\f\r ]).
# Spelled out so Spark's Java regex engine matches the DuckDB oracles
# byte-for-byte (Java '\s' would additionally collapse \x0b); ONE shared
# definition so bands, signatures, and exact-dup keys can never
# desynchronize on normalization.
_WS_RUN = "[ \t\n\f\r]+"


def _norm_ws_expr(text_col: str):
    """lower + trim + collapse-whitespace — the shared normalization every
    dedup strategy keys on (and the oracles' ``norm`` CTE replicates)."""
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), _WS_RUN, " ")


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of exact duplicates on normalized text; keeper = min id."""
    key = F.md5(_norm_ws_expr(text_col))
    return (
        df.select(F.col(id_col).alias("id"), key.alias("content_key"))
        .groupBy("content_key")
        .agg(F.min("id").alias("keeper"), F.count("*").alias("n_copies"),
             F.collect_list("id").alias("members"))
        .where(F.col("n_copies") > 1)
    )


def minhash_band_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, band) LSH key rows — map-only; commit this once per corpus and
    the incremental path (``delta_minhash_pairs``) never re-bands old docs."""
    bands_udf = make_minhash_bands_udf(num_perm=num_perm, bands=bands, shingle_k=shingle_k)
    norm = _norm_ws_expr(text_col)
    # the banding UDF is the expensive pass; a single-row-group fixture scan
    # would otherwise run it on one core (partitioning.spread is a no-op on
    # already-parallel scans)
    df = spread(df)
    return df.select(
        F.col(id_col).alias("id"), F.explode(bands_udf(norm)).alias("band")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_band_size: int = 10_000,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash LSH.

    Oversized band buckets (stop-phrase shingles) are dropped with the same
    cap discipline as blocking.pairs — a degenerate bucket adds quadratic
    pairs and no signal.

    r6 plan shape (guide §2.4 "two operations keyed the same way can share
    one exchange"): the band-size cap is a count() window over the SAME
    band partitioning the self-join needs, so the whole operator costs ONE
    shuffle of the key rows (plus the pair distinct) — the previous shape
    paid a separate groupBy shuffle for the cap, a driver broadcast of the
    oversized set, and a persist of the keys (the band exchange is
    identical on both self-join sides, so AQE reuses it and the banding
    UDF runs once without any cache). The join is hinted sort-merge: the
    window's own sort already orders each partition by band, a broadcast
    of a corpus-sized side would be wrong at scale (and measured slower
    locally — the driver round-trip), and sort-merge spills gracefully
    where a forced shuffled-hash build could OOM on a 100 TB key table.
    Skew trade, stated plainly: a degenerate band's rows now shuffle to
    and sort on ONE task before the cap filter discards them (hash
    co-location by band), where the old anti-join dropped them map-side —
    for a truly pathological band (a large fraction of the corpus under
    one stop-phrase key) that single task becomes a spill-bound straggler.
    The trade is taken deliberately: bands UNDER the cap land on one task
    in BOTH designs (the join requires co-location), the sort spills to
    disk rather than OOMing, and the alternative charges every healthy
    corpus an extra full aggregation pass + broadcast to protect only the
    degenerate case. Corpora known to carry mega-bands should pre-filter
    them upstream (or lower max_band_size so the surviving sort is small —
    the dropped rows still transit the shuffle once either way)."""
    keys = minhash_band_keys(
        df, id_col, text_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
    )
    kept = (
        keys.withColumn("_n", F.count("*").over(Window.partitionBy("band")))
        .where(F.col("_n") <= max_band_size)
        .drop("_n")
    )
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b.hint("merge"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("left_id"), F.col("b.id").alias("right_id"))
        .distinct()
    )


def delta_minhash_pairs(
    old_keys: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_band_size: int = 10_000,
) -> DataFrame:
    """Near-dup pairs with at least one endpoint in the NEW batch.

    The training-data ingestion shape at 100 TB: dedup each crawl batch
    against the committed corpus without re-banding or re-self-joining the
    corpus. ``old_keys`` is the committed ``minhash_band_keys`` output; only
    the new batch runs the banding UDF, and the join is new x (old + new)
    — never old x old. The band cap is measured over the UNION (same drop
    semantics as a full pass; a band newly pushed over the cap stops
    producing pairs, but previously emitted old x old pairs are retained —
    the same deliberate cap-boundary caveat as pairs.delta_candidate_pairs).

    Equivalence (tested): minhash_lsh_pairs(old + new) ==
    minhash_lsh_pairs(old) ∪ delta_minhash_pairs(old_keys, new), away from
    cap boundaries.

    r6 plan shape (same cap rework as :func:`minhash_lsh_pairs`): the
    union is tagged with an ``_new`` flag and the band cap is a count()
    window over the union's single band shuffle — the separate cap
    aggregation and oversized-set broadcast are gone. UNLIKE the
    self-join case, the two join inputs here can NOT share one exchange:
    column pruning drops ``_new`` from the ``t`` side, so the two band
    exchanges differ in schema and neither static nor AQE exchange reuse
    fires (verified in the committed x13 plan dump — the banding subtree
    appears twice). ``kept_all`` is therefore persisted, exactly the r2
    multi-consumer lesson this function always carried: ``old_keys`` may
    be a LIVE banding plan (the x11/x13 queries build it inline), and
    without the cache the whole old-corpus lineage would execute once per
    join side — the cost the incremental path exists to avoid.
    """
    new_keys = minhash_band_keys(
        new_docs, id_col, text_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k,
    )
    all_keys = old_keys.withColumn("_new", F.lit(False)).unionByName(
        new_keys.withColumn("_new", F.lit(True))
    )
    kept_all = (
        all_keys.withColumn("_n", F.count("*").over(Window.partitionBy("band")))
        .where(F.col("_n") <= max_band_size)
        .drop("_n")
        .persist()
    )
    kept_new = kept_all.where(F.col("_new"))
    n, t = kept_new.alias("n"), kept_all.alias("t")
    # new x all, both orientations, normalized to (min, max); new x new
    # appears from both sides and collapses in the distinct
    return (
        n.join(
            t.hint("merge"),
            (F.col("n.band") == F.col("t.band")) & (F.col("n.id") != F.col("t.id")),
        )
        .select(
            F.least(F.col("n.id"), F.col("t.id")).alias("left_id"),
            F.greatest(F.col("n.id"), F.col("t.id")).alias("right_id"),
        )
        .distinct()
    )


def simhash_codes(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    df = spread(df)  # simhash UDF pass: same single-task-scan repair as banding
    return df.select(
        F.col(id_col).alias("id"),
        simhash_udf(F.lower(F.col(text_col))).alias("simhash"),
    )


def _simhash_block_exprs(max_hamming: int):
    """Block columns for the pigeonhole split (see simhash_near_pairs)."""
    if not 0 <= max_hamming <= 63:
        raise ValueError("max_hamming must be in [0, 63]")
    n_blocks = max_hamming + 1
    widths = [64 // n_blocks + (1 if i < 64 % n_blocks else 0) for i in range(n_blocks)]
    offsets = [sum(widths[:i]) for i in range(n_blocks)]

    def _block(i: int):
        shifted = F.shiftrightunsigned("simhash", offsets[i])
        if widths[i] >= 64:  # full-code block (radius 0): mask literal would
            return shifted.alias(f"blk{i}")  # overflow a signed 64-bit long
        return shifted.bitwiseAND(F.lit((1 << widths[i]) - 1)).alias(f"blk{i}")

    return n_blocks, [_block(i) for i in range(n_blocks)]


def simhash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Hamming-radius pairs: split the 64-bit code into ``max_hamming + 1``
    blocks; a pair within the radius has fewer differing bits than blocks, so
    by pigeonhole it agrees exactly on >= 1 block — block-equality buckets
    are therefore a complete candidate set for ANY radius (a fixed 4-block
    split is only complete for radius <= 3)."""
    n_blocks, block_cols = _simhash_block_exprs(max_hamming)
    codes = simhash_codes(df, id_col, text_col)

    # persist: every block family references this twice (self-join sides),
    # so without a materialization the simhash UDF would run 2*n_blocks
    # times over the corpus (same lesson as the LSH banding pass)
    blocks = codes.select("id", "simhash", *block_cols).persist()
    parts = []
    for i in range(n_blocks):
        k = blocks.select(
            "id", "simhash", F.concat(F.lit(f"{i}:"), F.col(f"blk{i}").cast("string")).alias("bk")
        )
        a, b = k.alias("a"), k.alias("b")
        parts.append(
            a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")))
            .select(
                F.col("a.id").alias("left_id"),
                F.col("b.id").alias("right_id"),
                F.col("a.simhash").alias("sh_l"),
                F.col("b.simhash").alias("sh_r"),
            )
        )
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    ham = F.bit_count(F.col("sh_l").bitwiseXOR(F.col("sh_r")))
    return (
        cand.distinct()
        .where(ham <= max_hamming)
        .select("left_id", "right_id", ham.alias("hamming"))
    )


def delta_simhash_pairs(
    old_codes: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Hamming-radius pairs with >= 1 NEW endpoint.

    ``old_codes`` is a committed ``simhash_codes`` output (id, simhash):
    the corpus hashes once; each new batch runs the simhash UDF over its
    own docs only, and the per-block joins are new x (old + new) — never
    old x old. Completes the incremental-dedup family alongside
    ``delta_minhash_pairs``.
    """
    n_blocks, block_cols = _simhash_block_exprs(max_hamming)
    new_codes = simhash_codes(new_docs, id_col, text_col)
    blocks_new = new_codes.select("id", "simhash", *block_cols).persist()
    # union of BLOCK frames, reusing the persisted new side — building
    # blocks_all from new_codes directly would re-run the simhash UDF over
    # the new batch a second time
    blocks_all = (
        old_codes.select("id", "simhash", *block_cols)
        .unionByName(blocks_new)
        .persist()
    )
    parts = []
    for i in range(n_blocks):
        sel = lambda d: d.select(  # noqa: E731
            "id", "simhash",
            F.concat(F.lit(f"{i}:"), F.col(f"blk{i}").cast("string")).alias("bk"),
        )
        n, t = sel(blocks_new).alias("n"), sel(blocks_all).alias("t")
        parts.append(
            n.join(t, (F.col("n.bk") == F.col("t.bk")) & (F.col("n.id") != F.col("t.id")))
            .select(
                F.least(F.col("n.id"), F.col("t.id")).alias("left_id"),
                F.greatest(F.col("n.id"), F.col("t.id")).alias("right_id"),
                F.col("n.simhash").alias("sh_l"),  # hamming is symmetric
                F.col("t.simhash").alias("sh_r"),
            )
        )
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    ham = F.bit_count(F.col("sh_l").bitwiseXOR(F.col("sh_r")))
    return (
        cand.where(ham <= max_hamming)
        .select("left_id", "right_id", ham.alias("hamming"))
        .distinct()
    )


@F.pandas_udf(T.DoubleType())
def _ngram_jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact char-3-gram Jaccard per pair.

    r6 batch shape (guide §1.2 per-task work): candidate batches repeat the
    same document text across many pairs (every pair a doc participates in
    re-ships its text), so the trigram SET is built once per distinct text
    in the batch, and the per-pair cost is one set intersection —
    |A∪B| = |A|+|B|-|A∩B| avoids materializing the union. Bit-identical to
    jaccard(set(char_ngrams(x)), set(char_ngrams(y))): same integer counts,
    same final int/int division."""
    from ..functions.hashing import char_ngrams

    sets: dict[str, frozenset] = {}

    def grams(x: str | None) -> frozenset:
        x = x or ""
        s = sets.get(x)
        if s is None:
            s = sets[x] = frozenset(char_ngrams(x, 3))
        return s

    out = []
    for x, y in zip(a, b):
        ga, gb = grams(x), grams(y)
        if not ga and not gb:
            out.append(1.0)
            continue
        inter = len(ga & gb)
        out.append(inter / (len(ga) + len(gb) - inter))
    return pd.Series(out, index=a.index, dtype="float64")


def ngram_jaccard_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    **lsh_kwargs,
) -> DataFrame:
    """LSH candidates verified by exact character-3-gram Jaccard >= threshold.
    The classic block-then-verify shape: candidates are the only shuffle."""
    cand = minhash_lsh_pairs(df, id_col, text_col, **lsh_kwargs)
    texts = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
    j = (
        cand.join(texts.withColumnRenamed("id", "left_id").withColumnRenamed("txt", "lt"), "left_id")
        .join(texts.withColumnRenamed("id", "right_id").withColumnRenamed("txt", "rt"), "right_id")
        .withColumn("jaccard", F.round(_ngram_jaccard_udf(F.col("lt"), F.col("rt")), 4))
    )
    return j.where(F.col("jaccard") >= threshold).select("left_id", "right_id", "jaccard")


def minhash_jaccard_estimates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_band_size: int = 10_000,
) -> DataFrame:
    """LSH candidate pairs + VERIFY-FREE Jaccard estimate from signatures.

    est = (#equal signature slots) / num_perm — the standard MinHash
    estimator of word-shingle Jaccard (std err <= 1/(2*sqrt(num_perm))).
    At 100 TB this is the cheap middle tier between raw candidates and the
    exact n-gram verify: thresholding on the estimate costs a zip_with over
    two already-committed arrays, no text reads at all. The division by
    num_perm (a power of two) is exact binary, so the DuckDB oracle is
    bit-identical.
    """
    cand = minhash_lsh_pairs(
        df, id_col, text_col,
        num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        max_band_size=max_band_size,
    )
    from ..functions.udfs import make_minhash_signature_udf

    sig_udf = make_minhash_signature_udf(num_perm=num_perm, shingle_k=shingle_k)
    # persist: the signature UDF feeds BOTH sides of the candidate join —
    # without a materialization each side re-runs it over the full corpus
    # (the same multi-consumer 2x-wall lesson as minhash_lsh_pairs)
    sigs = spread(df).select(
        F.col(id_col).alias("id"), sig_udf(_norm_ws_expr(text_col)).alias("sig")
    ).persist()
    j = (
        cand.join(
            sigs.select(F.col("id").alias("left_id"), F.col("sig").alias("sl")),
            "left_id",
        )
        .join(
            sigs.select(F.col("id").alias("right_id"), F.col("sig").alias("sr")),
            "right_id",
        )
    )
    matches = F.aggregate(
        F.zip_with("sl", "sr", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, x: acc + x,
    )
    return j.select(
        "left_id", "right_id",
        (matches.cast("double") / F.lit(float(num_perm))).alias("jaccard_est"),
    )


def near_dup_groups_from_edges(
    edges: DataFrame,
    members_cap: int | None = 1000,
    assume_no_self_loops: bool = False,
) -> DataFrame:
    """Cluster roll-up over an explicit near-dup edge set (u, v).

    Alternating-star connected components -> per-cluster roll-up: keeper =
    min doc id (== the CC cluster_id invariant), true member count, sorted
    member list. Factored out of :func:`near_dup_groups` so the roll-up is
    testable (and reusable) independent of which blocking family produced
    the edges. ``assume_no_self_loops`` passes through to
    :func:`cluster.connected_components`; the pair-generator callers set it
    (``left_id < right_id`` by construction) so CC never re-evaluates the
    expensive LSH pair DAG for its roll-up.
    """
    from .cluster import connected_components

    cc = connected_components(edges, assume_no_self_loops=assume_no_self_loops)
    if members_cap is None:
        member_expr = F.collect_list("node")
        grouped = cc
    else:
        w = Window.partitionBy("cluster_id").orderBy("node")
        grouped = cc.withColumn("rn", F.row_number().over(w))
        member_expr = F.collect_list(
            F.when(F.col("rn") <= members_cap, F.col("node"))
        )
    return grouped.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.sort_array(member_expr).alias("members"),
    ).select(
        F.col("cluster_id").alias("keeper"),
        F.col("n_members").cast("long").alias("n_members"),
        "members",
    )


def near_dup_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    members_cap: int | None = 1000,
    **lsh_kwargs,
) -> DataFrame:
    """Near-dup CLUSTERS with a canonical keeper, for inspection/reporting.

    minhash_lsh_pairs edges -> :func:`near_dup_groups_from_edges` roll-up.
    Docs in no pair are implicitly kept (absent from the output).

    ``members_cap`` (default 1000 — the scale-safe bound) limits the
    materialized member LIST per cluster to the smallest ``members_cap``
    ids, so a degenerate boilerplate cluster can never buffer an unbounded
    array on one task; ``n_members`` always reports the true size. A capped
    ``members`` list is a SAMPLE, not the drop list: a consumer deleting
    duplicates must use :func:`dedup_decisions` (one bounded row per doc,
    no arrays — the primary dedup API), never a truncated list; detect
    truncation via ``n_members != size(members)``. Pass
    ``members_cap=None`` only at oracle-scale corpora where the full list
    is wanted exactly (the t12 driver query does, to match its cap-free
    DuckDB oracle). The cap filter is a window over cluster_id — the same
    key the roll-up groups on, so it adds no extra shuffle beyond the
    group-by's own Exchange.
    """
    pairs = minhash_lsh_pairs(df, id_col, text_col, **lsh_kwargs)
    edges = pairs.select(F.col("left_id").alias("u"), F.col("right_id").alias("v"))
    # left_id < right_id by construction -> CC's roll-up never needs the
    # self-loop pass (which would re-evaluate this whole LSH pair DAG)
    return near_dup_groups_from_edges(
        edges, members_cap=members_cap, assume_no_self_loops=True
    )


def dedup_decisions_from_edges(
    edges: DataFrame, assume_no_self_loops: bool = False
) -> DataFrame:
    """Per-doc drop decisions from an explicit near-dup edge set."""
    from .cluster import connected_components

    cc = connected_components(edges, assume_no_self_loops=assume_no_self_loops)
    return cc.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id"),
        F.col("cluster_id").alias("keeper"),
        F.lit("drop").alias("action"),
    )


def dedup_decisions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **lsh_kwargs,
) -> DataFrame:
    """The PRIMARY dedup deliverable: one row per doc to DROP, with the
    keeper it duplicates — the anti-joinable decision table a training
    pipeline consumes (``corpus.join(decisions, "doc_id", "left_anti")``).

    Derived straight from the connected-components labels (node != label =>
    drop in favour of label), never from a rolled-up member array, so every
    row is O(1) regardless of cluster size — a 10M-member boilerplate
    cluster costs 10M flat rows spread across tasks, not one 10M-element
    array on one task. Prefer this over exploding
    :func:`near_dup_groups`.members at any real corpus scale.
    """
    pairs = minhash_lsh_pairs(df, id_col, text_col, **lsh_kwargs)
    edges = pairs.select(F.col("left_id").alias("u"), F.col("right_id").alias("v"))
    # left_id < right_id by construction (see near_dup_groups)
    return dedup_decisions_from_edges(edges, assume_no_self_loops=True)


def delta_ngram_jaccard_pairs(
    old_keys: DataFrame,
    old_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    **lsh_kwargs,
) -> DataFrame:
    """Verified near-dup pairs with >= 1 NEW endpoint — the incremental
    block-then-verify, completing the delta family (minhash / simhash /
    candidate-join / ngram-jaccard).

    Candidates come from ``delta_minhash_pairs`` (only the new batch runs
    the banding UDF; ``old_keys`` is the committed ``minhash_band_keys``
    table; old x old is never joined), and the exact character-3-gram
    Jaccard verify then reads text for CANDIDATE rows only — at 100 TB the
    verify cost is O(delta candidates), not O(corpus). Old texts are
    touched exclusively through the candidate join (columnar scan of id +
    text, pushed down). Equivalence: ``ngram_jaccard_dedup(old + new)``
    restricted to new-endpoint pairs == this, away from cap boundaries
    (same caveat as the other deltas).
    """
    cand = delta_minhash_pairs(
        old_keys, new_docs, id_col=id_col, text_col=text_col, **lsh_kwargs
    )
    texts = (
        old_docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
        .unionByName(
            new_docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
        )
    )
    j = (
        cand.join(
            texts.withColumnRenamed("id", "left_id").withColumnRenamed("txt", "lt"),
            "left_id",
        )
        .join(
            texts.withColumnRenamed("id", "right_id").withColumnRenamed("txt", "rt"),
            "right_id",
        )
        .withColumn("jaccard", F.round(_ngram_jaccard_udf(F.col("lt"), F.col("rt")), 4))
    )
    return j.where(F.col("jaccard") >= threshold).select(
        "left_id", "right_id", "jaccard"
    )


def embedding_bucket_keys(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 7,
    with_norm: bool = False,
) -> DataFrame:
    """(id, v, bucket) hyperplane-LSH rows — the committable representation
    for the embedding near-dup family (the full and delta passes both key on
    it, so a corpus bucketed once is never re-bucketed for a new batch).

    ``dim`` is an explicit parameter: probing it with a driver-side
    ``first()`` action from inside an operator would trigger a hidden job
    on every call (and the array element count is not in the schema).

    r6: the sign bits run through the Arrow-batched
    ``make_hyperplane_bucket_norm_udf`` pass (one crossing per batch, the
    same left-to-right fold order as the interpreted
    ``aggregate(zip_with(...))`` HOF it replaces — bit-identical buckets,
    the x4 lesson applied to the operator family; x7/x16 oracle parity
    re-verified). The committed (id, v, bucket) contract is unchanged;
    ``with_norm=True`` additionally emits ``_n`` from the SAME batched
    pass (the norm rides the struct the bucket comes from — callers that
    need both must not pay a second Arrow crossing of the vector
    column)."""
    import numpy as np

    from ..functions.udfs import make_hyperplane_bucket_norm_udf

    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim).tolist()
    bn = make_hyperplane_bucket_norm_udf(planes)
    # fail fast on a dim/vector mismatch: sign bits against a wrong-length
    # vector would silently collapse buckets and turn the near-linear
    # bucket join into an O(n^2) self-join. The check rides inside the
    # value column so column pruning cannot drop it.
    checked_vec = F.when(F.size(F.col(vec_col)) == dim, F.col(vec_col)).otherwise(
        F.raise_error(
            F.concat(F.lit(f"embedding length != dim={dim}: "),
                     F.size(F.col(vec_col)).cast("string"))
        )
    )
    # the batched pass still costs O(n_planes x dim) per row: spread the
    # scan before paying it. Both struct fields come from ONE UDF
    # evaluation (same expression — Catalyst batches it into a single
    # ArrowEvalPython entry).
    keyed = spread(df).select(
        F.col(id_col).alias("id"), checked_vec.alias("v"),
        bn(F.col(vec_col)).alias("_bn"),
    )
    cols = [F.col("id"), F.col("v"), F.col("_bn.bucket").alias("bucket")]
    if with_norm:
        cols.append(F.col("_bn.nrm").alias("_n"))
    return keyed.select(*cols)


def _vec_norm(c):
    """Per-row vector norm — r6: the Arrow-batched sequential fold
    (``seq_norm_udf``), bit-identical to the interpreted
    ``sqrt(aggregate(...))`` HOF this wrapped before (same addition order;
    unit-tested in test_r6_optimizations)."""
    from ..functions.udfs import seq_norm_udf

    return seq_norm_udf(c)


def _pair_cosine(left_v, right_v, left_n, right_n):
    """round(dot/(|a||b|), 6) + 0.0 with the dot through the Arrow-batched
    sequential fold (``seq_dot_udf`` — bit-exact with the interpreted
    ``aggregate(zip_with(...))`` it replaces) and the norms precomputed per
    row. + 0.0 folds IEEE -0.0 from round() of a tiny negative cosine
    (the driver's value hash is bit-sensitive)."""
    from ..functions.udfs import seq_dot_udf

    return F.round(seq_dot_udf(left_v, right_v) / (left_n * right_n), 6) + F.lit(0.0)


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Cosine near-dups via random-hyperplane LSH buckets + exact verify.
    Brute force is O(n^2); the bucket join keeps it near-linear for tight
    thresholds (near-dup vectors almost always share all sign bits)."""
    # persist: the bucket-bit pass feeds BOTH sides of the self-join; the
    # per-row norm comes from the SAME Arrow pass as the bucket
    # (with_norm=True) so the vector column crosses the Python boundary
    # once, and the per-pair work is one vectorized dot
    keyed = embedding_bucket_keys(
        df, dim, id_col=id_col, vec_col=vec_col, n_planes=n_planes, seed=seed,
        with_norm=True,
    ).persist()
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .withColumn(
            "cos_sim",
            _pair_cosine(F.col("a.v"), F.col("b.v"), F.col("a._n"), F.col("b._n")),
        )
        .where(F.col("cos_sim") >= threshold)
        .select(F.col("a.id").alias("left_id"), F.col("b.id").alias("right_id"), "cos_sim")
    )


def delta_embedding_near_dup(
    old_keys: DataFrame,
    new_vectors: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Embedding near-dup pairs with >= 1 NEW endpoint — the 5th and last
    dedup family's incremental variant. ``old_keys`` is a committed
    ``embedding_bucket_keys`` output: the corpus is bucketed once; each new
    batch computes only its own sign bits, and the bucket join is
    new x (old + new) — never old x old. Same hyperplanes (seed) as the
    full pass, so old and new buckets are directly comparable.
    """
    new_keys = embedding_bucket_keys(
        new_vectors, dim, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, seed=seed, with_norm=True,
    ).persist()
    # two consumers: the union and the 'n' join side. The committed old
    # keys carry no norm column (their contract is (id, v, bucket)), so the
    # norm is recomputed in one map pass — O(corpus) per batch but a single
    # cheap column op, vs the per-PAIR norms the old cosine paid.
    all_keys = old_keys.withColumn("_n", _vec_norm(F.col("v"))).unionByName(new_keys)
    n, t = new_keys.alias("n"), all_keys.alias("t")
    return (
        n.join(t, (F.col("n.bucket") == F.col("t.bucket")) & (F.col("n.id") != F.col("t.id")))
        .withColumn(
            "cos_sim",
            _pair_cosine(F.col("n.v"), F.col("t.v"), F.col("n._n"), F.col("t._n")),
        )
        .where(F.col("cos_sim") >= threshold)
        .select(
            F.least(F.col("n.id"), F.col("t.id")).alias("left_id"),
            F.greatest(F.col("n.id"), F.col("t.id")).alias("right_id"),
            "cos_sim",
        )
        .distinct()
    )
