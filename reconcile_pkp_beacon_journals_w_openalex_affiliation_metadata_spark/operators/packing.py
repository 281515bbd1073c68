"""Sequence packing for LLM-pretraining pipelines.

Docs are concatenated in deterministic (stratum, doc_id) order and cut into
fixed ``pack_size``-token packs; a doc that crosses a pack boundary is SPLIT
into one coverage row per (doc, pack) overlap. ``pack_slices`` emits the
coverage table (who contributes which in-doc token range to which pack);
``materialize_packs`` emits the actual per-pack ordered token concatenation —
the tensor-shaped deliverable a pretraining data loader consumes.

Scale shape: one shuffle on the stratum key for the running-sum window, a
row-local ``sequence``+``explode`` whose fan-out is 1 + n_tokens/pack_size
per doc, and (for materialization) one groupBy on (stratum, pack_id) whose
state per key is bounded by pack_size tokens — no driver loops, no UDFs.
Tokenization here is the whitespace splitter shared with the t1/t3 text
metrics; swap ``_tokens`` for a real tokenizer column upstream and the
packing math is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.split(F.trim(F.col(text_col)), "[ \t\n\f\r]+")


def _coverage(
    docs: DataFrame,
    pack_size: int,
    id_col: str,
    stratum_col: str,
    text_col: str,
    carry_tokens: bool,
) -> DataFrame:
    """Coverage rows with the window + explode chain shared by both APIs."""
    w = Window.partitionBy(stratum_col).orderBy(id_col)
    cols = [F.col(id_col), F.col(stratum_col)]
    if carry_tokens:
        cols.append(_tokens(text_col).alias("toks"))
        base = docs.select(*cols).withColumn(
            "n_tokens", F.size("toks").cast("long")
        )
    else:
        cols.append(F.size(_tokens(text_col)).cast("long").alias("n_tokens"))
        base = docs.select(*cols)
    packed = base.withColumn(
        "tok_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    first_p = F.floor(F.col("tok_before") / pack_size)
    last_p = F.floor((F.col("tok_before") + F.col("n_tokens") - 1) / pack_size)
    return packed.withColumn("pack_id", F.explode(F.sequence(first_p, last_p)))


def pack_slices(
    docs: DataFrame,
    pack_size: int = 256,
    id_col: str = "doc_id",
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Coverage table: one row per (doc, pack) overlap.

    Columns: id, stratum, pack_id, slice_start/slice_len (the in-doc token
    range this row contributes), pack_offset (where it lands in the pack).
    Invariants (pytest-asserted): per doc the slices tile [0, n_tokens)
    contiguously; per (stratum, pack) the offsets tile [0, pack_size)
    gaplessly and every pack is exactly full except the last per stratum.
    """
    cov = _coverage(docs, pack_size, id_col, stratum_col, text_col, False)
    return _slice_select(cov, pack_size, id_col, stratum_col)


def _slice_select(cov, pack_size: int, id_col: str, stratum_col: str) -> DataFrame:
    start_g = F.greatest(F.col("pack_id") * pack_size, F.col("tok_before"))
    end_g = F.least(
        (F.col("pack_id") + 1) * pack_size,
        F.col("tok_before") + F.col("n_tokens"),
    )
    return cov.select(
        id_col, stratum_col,
        F.col("pack_id").cast("long").alias("pack_id"),
        (start_g - F.col("tok_before")).cast("long").alias("slice_start"),
        (end_g - start_g).cast("long").alias("slice_len"),
        (start_g - F.col("pack_id") * pack_size).cast("long").alias("pack_offset"),
    )


def stratum_token_totals(
    docs: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(stratum, tok_total) — the committed stream length per stratum; the
    only state ``delta_pack_slices`` needs from a 10^12-doc corpus."""
    return docs.groupBy(stratum_col).agg(
        F.sum(F.size(_tokens(text_col)).cast("long")).alias("tok_total")
    )


def delta_pack_slices(
    new_docs: DataFrame,
    stratum_totals: DataFrame,
    pack_size: int = 256,
    id_col: str = "doc_id",
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """O(batch) incremental packing: coverage rows for an APPENDED batch.

    ``stratum_totals`` is the committed per-stratum token total (from
    :func:`stratum_token_totals`, a one-row-per-stratum table a catalog
    keeps alongside the pack manifest). Contract: the batch is an APPEND —
    every new doc sorts after all committed docs of its stratum in the
    ``id_col`` order (the t10/t11 stream order). Under that contract the
    new docs' running sums simply start at the committed total, so the
    emitted rows equal the full rebuild's rows for exactly the new docs
    (pytest-gated), and the trailing partial pack of the committed stream
    is naturally topped up by the first new slice. The committed corpus is
    never rescanned: one window over the batch plus a broadcast join
    against the #strata-row totals table.

    New strata (no committed total) start at offset 0.
    """
    cov = _delta_coverage(
        new_docs, stratum_totals, pack_size, id_col, stratum_col, text_col,
        carry_tokens=False,
    )
    return _slice_select(cov, pack_size, id_col, stratum_col)


def _delta_coverage(
    new_docs, stratum_totals, pack_size, id_col, stratum_col, text_col,
    carry_tokens: bool,
):
    w = Window.partitionBy(stratum_col).orderBy(id_col)
    cols = [F.col(id_col), F.col(stratum_col)]
    if carry_tokens:
        cols.append(_tokens(text_col).alias("toks"))
        base = new_docs.select(*cols).withColumn(
            "n_tokens", F.size("toks").cast("long")
        )
    else:
        cols.append(F.size(_tokens(text_col)).cast("long").alias("n_tokens"))
        base = new_docs.select(*cols)
    base = base.join(F.broadcast(stratum_totals), stratum_col, "left").withColumn(
        "tok_total", F.coalesce(F.col("tok_total"), F.lit(0))
    )
    packed = base.withColumn(
        "tok_before",
        F.col("tok_total") + F.sum("n_tokens").over(w) - F.col("n_tokens"),
    ).drop("tok_total")
    first_p = F.floor(F.col("tok_before") / pack_size)
    last_p = F.floor((F.col("tok_before") + F.col("n_tokens") - 1) / pack_size)
    return packed.withColumn("pack_id", F.explode(F.sequence(first_p, last_p)))


def delta_materialize_packs(
    new_docs: DataFrame,
    stratum_totals: DataFrame,
    trailing_packs: DataFrame,
    pack_size: int = 256,
    id_col: str = "doc_id",
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """O(batch) incremental pack MATERIALIZATION: the affected packs only.

    Inputs beyond the batch: ``stratum_totals`` (one number per stratum,
    see :func:`stratum_token_totals`) and ``trailing_packs`` — the LAST
    committed pack per stratum in the t14 shape (stratum, pack_id,
    pack_text), i.e. O(#strata) rows read back from the committed
    manifest, never the corpus. Emits every pack whose pack_id >= the
    stratum's trailing pack id (the trailing pack re-emitted topped-up
    with the batch's first tokens — a full trailing pack is re-emitted
    byte-identical) plus all packs of brand-new strata; committed packs
    below the trailing id are untouched. Union with those = the full
    rebuild's manifest (pytest-gated). Consumer applies it as a
    replace-by-(stratum, pack_id) upsert — the same batch-replace shape as
    the catalog's append protocol.
    """
    cov = _delta_coverage(
        new_docs, stratum_totals, pack_size, id_col, stratum_col, text_col,
        carry_tokens=True,
    )
    start_g = F.greatest(F.col("pack_id") * pack_size, F.col("tok_before"))
    end_g = F.least(
        (F.col("pack_id") + 1) * pack_size,
        F.col("tok_before") + F.col("n_tokens"),
    )
    new_slices = cov.select(
        F.col(stratum_col),
        F.col("pack_id").cast("long").alias("pack_id"),
        (start_g - F.col("pack_id") * pack_size).cast("long").alias("pack_offset"),
        F.slice(
            "toks",
            (start_g - F.col("tok_before") + 1).cast("int"),
            (end_g - start_g).cast("int"),
        ).alias("slice_toks"),
    )
    # the committed trailing pack participates as a pseudo-slice at offset 0
    trail_slices = trailing_packs.select(
        F.col(stratum_col),
        F.col("pack_id").cast("long").alias("pack_id"),
        F.lit(0).cast("long").alias("pack_offset"),
        F.split(F.col("pack_text"), " ").alias("slice_toks"),
    )
    parts = F.sort_array(F.collect_list(F.struct("pack_offset", "slice_toks")))
    return (
        new_slices.unionByName(trail_slices)
        .groupBy(stratum_col, "pack_id")
        .agg(F.flatten(parts.getField("slice_toks")).alias("pack_toks"))
        .select(
            stratum_col, "pack_id",
            F.concat_ws(" ", "pack_toks").alias("pack_text"),
            F.size("pack_toks").cast("long").alias("pack_len"),
        )
    )


def materialize_packs(
    docs: DataFrame,
    pack_size: int = 256,
    id_col: str = "doc_id",
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-pack ordered concatenation — the actual pretraining deliverable.

    One row per (stratum, pack_id) with ``pack_text`` (the pack's tokens in
    stream order, space-joined) and ``pack_len`` (token count; == pack_size
    for every pack except the trailing pack of each stratum). The slice
    structs are assembled per pack with ``sort_array`` on pack_offset —
    groupBy state is bounded by pack_size tokens per key regardless of
    corpus size, so a 10^12-doc corpus packs with one bounded shuffle.
    Tokens are carried through the window (no second join back to the
    documents table).
    """
    cov = _coverage(docs, pack_size, id_col, stratum_col, text_col, True)
    start_g = F.greatest(F.col("pack_id") * pack_size, F.col("tok_before"))
    end_g = F.least(
        (F.col("pack_id") + 1) * pack_size,
        F.col("tok_before") + F.col("n_tokens"),
    )
    sl = cov.select(
        F.col(stratum_col).alias(stratum_col),
        F.col("pack_id").cast("long").alias("pack_id"),
        (start_g - F.col("pack_id") * pack_size).cast("long").alias("pack_offset"),
        F.slice(
            "toks",
            (start_g - F.col("tok_before") + 1).cast("int"),
            (end_g - start_g).cast("int"),
        ).alias("slice_toks"),
    )
    parts = F.sort_array(F.collect_list(F.struct("pack_offset", "slice_toks")))
    return (
        sl.groupBy(stratum_col, "pack_id")
        .agg(F.flatten(parts.getField("slice_toks")).alias("pack_toks"))
        .select(
            stratum_col, "pack_id",
            F.concat_ws(" ", "pack_toks").alias("pack_text"),
            F.size("pack_toks").cast("long").alias("pack_len"),
        )
    )
