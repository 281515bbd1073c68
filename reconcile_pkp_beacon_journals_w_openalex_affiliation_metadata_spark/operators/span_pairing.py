"""Positional span pairing — the reference's HTML meta-tag state machine
(parse_landing_page_html.py:54-81) as a window operator over spans.

Reference semantics: tags are scanned in document order; each
``citation_author_institution`` attaches to the MOST RECENT
``citation_author``; an author with no following institution still emits a
pair with institution ''. Re-expressed: posexplode the spans, then
``last(author, ignoreNulls) over (rows unbounded preceding)`` — the only
frame-spec window in the system (SURVEY W2).

Input spans use kind='author' / kind='affiliation' (the span-modeled form of
the meta tags); other kinds pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pair_authors_affiliations(documents: DataFrame) -> DataFrame:
    """-> (doc_id, author, institution, author_pos) pairs.

    - affiliation spans attach to the last preceding author span,
    - author spans with no affiliation before the next author emit
      (author, '') — the flush of parse_landing_page_html.py:67-72,79-81.
    """
    ex = documents.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select(
        "doc_id", "pos",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.offset").alias("offset"),
    ).where(F.col("kind").isin("author", "affiliation"))

    w = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ex.withColumn(
        "cur_author",
        F.last(
            F.when(F.col("kind") == "author", F.col("text")), ignorenulls=True
        ).over(w),
    ).withColumn(
        "cur_author_pos",
        F.last(
            F.when(F.col("kind") == "author", F.col("offset")), ignorenulls=True
        ).over(w),
    )

    affil_pairs = carried.where(
        (F.col("kind") == "affiliation") & F.col("cur_author").isNotNull()
    ).select(
        "doc_id",
        F.col("cur_author").alias("author"),
        F.col("text").alias("institution"),
        F.col("cur_author_pos").alias("author_pos"),
    )

    # authors that never got an affiliation -> ('author', '')
    lonely = (
        carried.where(F.col("kind") == "author")
        .select("doc_id", F.col("text").alias("author"), F.col("offset").alias("author_pos"))
        .join(
            affil_pairs.select("doc_id", "author_pos").distinct(),
            ["doc_id", "author_pos"],
            "left_anti",
        )
        .select("doc_id", "author", F.lit("").alias("institution"), "author_pos")
    )
    return affil_pairs.unionByName(lonely)


def dedup_pairs_with_sources(pairs: DataFrame) -> DataFrame:
    """A2: grouped dedup with source-set union (parse_landing_page_html.py:
    188-228). ``pairs`` must carry a ``source`` column and an arrival-order
    column ``seq``.

    Original-string selection mirrors the reference's dict merge exactly:
    meta rows only set ``original`` on FIRST sight of a key (dict setdefault,
    py:194-208), while every ul.authors row OVERWRITES it (py:210-219) — so
    the winner is the latest ul row if any, else the earliest meta row.
    Encoded as one max_by over (is_ul, is_ul ? seq : -seq)."""
    pref = F.struct(
        (F.col("source") == "ul.authors").cast("int").alias("is_ul"),
        F.when(F.col("source") == "ul.authors", F.col("seq"))
        .otherwise(-F.col("seq"))
        .alias("adj_seq"),
    )
    return (
        pairs.groupBy(
            "doc_id",
            F.trim(F.col("author")).alias("author_key"),
            F.trim(F.col("institution")).alias("institution_key"),
        )
        .agg(
            F.array_join(F.array_sort(F.collect_set("source")), ";").alias("sources"),
            F.max_by("author", pref).alias("author"),
            F.max_by("institution", pref).alias("institution"),
        )
        .drop("author_key", "institution_key")
    )
