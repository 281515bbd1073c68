"""Reference-parity author/affiliation comparison (the semantics-critical path).

Bit-exact Spark re-expression of the per-row decision logic in
check_landing_page_author_affiliation_parsing_against_openalex.py:123-269:

- P3 row filter: keep rows whose DOI ``strip().startswith('10.')`` (:66-71)
- keyed lookup join landing->works by cleaned DOI (:92-100,128-141) —
  the API point-lookup becomes a left join against the works snapshot (S8)
- best-authorship argmax with strict-``>`` first-max tie-break and
  break-at-100 (:150-169) -> posexplode + row_number window (J3/W1)
- raw-name -> display_name fallback (:155-158,184-190)
- exact/normalized author match (:192-201)
- empty-institution semantics (:215-228): empty CSV institution matches
  exactly-iff the API affiliation list is empty, and scores 100 iff the
  *normalized* list is empty
- institution score = max fuzz.ratio over normalized affiliations (:230-241)
- round(x, 2) on both scores (:254-259)

Output columns == the 8 appended reference columns (:285-292).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import native
from ..functions.udfs import (
    indel_ratio_udf,
    max_indel_over_array_udf,
    norm_nonempty_array_udf,
    norm_text_udf,
)

_ROW_KEY = ["RelativeFilePath", "DOI", "Author", "Institution", "Source"]


def compare_landing_to_works(landing: DataFrame, works: DataFrame) -> DataFrame:
    """landing (LANDING_PAIRS schema) x works (OPENALEX_WORKS schema) ->
    landing rows + the reference's 8 match columns."""
    # P3: DOI format filter (check:66-71); group key = trimmed DOI (:72-74).
    # Identical landing rows produce identical outputs, so they are collapsed
    # to one representative (+ count) and re-expanded at the end — the
    # reference emits one output row per input row. This replaces a
    # monotonically_increasing_id row handle, whose values shift under task
    # retry of a non-deterministic upstream; row CONTENT is retry-stable,
    # and the downstream windows partition on it directly.
    rows = (
        landing.where(
            F.col("DOI").isNotNull() & F.trim(F.col("DOI")).startswith("10.")
        )
        .groupBy(*_ROW_KEY)
        .agg(F.count("*").alias("_dup_n"))
        .withColumn("doi_key", F.trim(F.col("DOI")))
        .withColumn("csv_author_norm", norm_text_udf(F.col("Author")))
        .withColumn("csv_inst_norm", norm_text_udf(F.col("Institution")))
    )

    # S8 as a join: the API lookup keyed by cleaned DOI. Works-side key uses
    # the same prefix-strip the fetcher applies (check:93-98).
    wk = works.select(
        native.clean_doi(F.col("doi")).alias("doi_key"),
        F.col("authorships"),
    ).where(F.col("doi_key").isNotNull())
    # one work per DOI (the API lookup returns exactly one record per DOI)
    wk = wk.dropDuplicates(["doi_key"])
    joined = rows.join(wk, "doi_key", "left")

    # J3: explode authorships, score each against the CSV author.
    # posexplode_outer keeps rows with null/empty authorships (idx null).
    ex = joined.select(
        "*", F.posexplode_outer("authorships").alias("auth_idx", "auth")
    ).drop("authorships")

    api_raw_name = F.coalesce(
        F.nullif(F.col("auth.raw_author_name"), F.lit("")),
        F.col("auth.author.display_name"),
        F.lit(""),
    )
    ex = ex.withColumn("api_raw_name", api_raw_name)
    # score only defined when csv-author-normalized is non-empty and an
    # authorship exists (check:152-153 guard); else the row has no best match.
    ex = ex.withColumn(
        "a_score",
        F.when(
            (F.col("csv_author_norm") != "") & F.col("auth_idx").isNotNull(),
            indel_ratio_udf(F.col("csv_author_norm"), norm_text_udf(F.col("api_raw_name"))),
        ),
    )

    # W1: first-max via strict '>' (check:163-169) == order by score desc,
    # idx asc, take row 1. Partitioned by row content (rows are distinct
    # after the collapse above).
    w = Window.partitionBy(*_ROW_KEY).orderBy(
        F.col("a_score").desc_nulls_last(), F.col("auth_idx").asc_nulls_last()
    )
    best = (
        ex.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
        .withColumn("has_best", F.col("a_score").isNotNull())
    )

    raw_affils = F.coalesce(F.col("auth.raw_affiliation_strings"), F.array())
    norm_affils = norm_nonempty_array_udf(raw_affils)
    best = best.withColumn("raw_affils", raw_affils).withColumn("norm_affils", norm_affils)

    inst_raw_empty = F.col("Institution").isNull() | (F.col("Institution") == "")
    raw_affils_empty = F.size("raw_affils") == 0
    norm_affils_empty = F.size("norm_affils") == 0

    out = best.select(
        "_dup_n",
        *_ROW_KEY,
        # author columns (check:192-201); defaults when no best (check:143-149)
        F.when(
            F.col("has_best"),
            F.coalesce(F.col("Author"), F.lit("")) == F.col("api_raw_name"),
        )
        .otherwise(F.lit(False))
        .alias("exact_author_match"),
        F.when(
            F.col("has_best"),
            F.col("csv_author_norm") == norm_text_udf(F.col("api_raw_name")),
        )
        .otherwise(F.lit(False))
        .alias("normalized_author_match"),
        F.round(
            F.when(F.col("has_best"), F.col("a_score")).otherwise(F.lit(0.0)), 2
        ).alias("author_similarity_score"),
        # institution columns (check:215-241)
        F.when(
            F.col("has_best"),
            F.when(inst_raw_empty, raw_affils_empty).otherwise(
                F.exists(
                    "raw_affils",
                    lambda x: F.lower(x) == F.lower(F.col("Institution")),
                )
            ),
        )
        .otherwise(F.lit(False))
        .alias("exact_institution_match"),
        F.when(
            F.col("has_best"),
            F.when(F.col("csv_inst_norm") == "", norm_affils_empty).otherwise(
                F.array_contains(F.col("norm_affils"), F.col("csv_inst_norm"))
            ),
        )
        .otherwise(F.lit(False))
        .alias("normalized_institution_match"),
        F.round(
            F.when(
                F.col("has_best"),
                F.when(
                    F.col("csv_inst_norm") == "",
                    F.when(norm_affils_empty, F.lit(100.0)).otherwise(F.lit(0.0)),
                ).otherwise(
                    max_indel_over_array_udf(F.col("csv_inst_norm"), F.col("norm_affils"))
                ),
            ).otherwise(F.lit(0.0)),
            2,
        ).alias("institution_similarity_score"),
        F.when(F.col("has_best"), F.col("api_raw_name"))
        .otherwise(F.lit(""))
        .alias("openalex_matched_author_name"),
        F.when(F.col("has_best"), F.array_join(F.col("raw_affils"), "; "))
        .otherwise(F.lit(""))
        .alias("openalex_matched_institution_strings"),
    )
    # re-expand collapsed duplicates: one output row per input row. Two-level
    # explode so a pathologically large duplicate group (millions of
    # identical rows) never materializes a single _dup_n-element array on
    # one row — chunks of 2^16, then rows within the chunk.
    chunk = 1 << 16
    n_chunks = F.ceil(F.col("_dup_n") / F.lit(chunk)).cast("long")
    rows_in_chunk = F.least(
        F.lit(chunk).cast("long"), F.col("_dup_n") - F.col("_c") * chunk
    )
    return (
        out.withColumn("_c", F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)))
        .withColumn("_i", F.explode(F.sequence(F.lit(1).cast("long"), rows_in_chunk)))
        .drop("_dup_n", "_c", "_i")
    )
