"""Corpus-scale works filter — the Spark re-expression of the reference's
Rust tool (get-openalex-works-with-pkp-beacon-base-url-and-affiliations/
src/main.rs), its scale-critical path.

Reference semantics re-expressed declaratively:

- P4 (main.rs:216-260): keep a work iff SOME location's landing_page_url
  parses and its (scheme, host, port-or-known-default) triple equals that of
  SOME base URL -> derive url_key per location, broadcast LEFT-SEMI join
  against the base-url key list (J1; the Arc-shared base list of
  main.rs:597-603 becomes a broadcast).
- P5 (main.rs:263-286): keep iff SOME authorship has SOME non-whitespace
  raw_affiliation_string -> nested higher-order EXISTS, no explode.
- F6 (main.rs:289-315,714-719): DOI prefix, '_unknown_' null partition.
- S5 (main.rs:319-501): hash-partitioned sink with bounded writers -> Spark's
  partitioned write (the LRU writer cache disappears into FileFormatWriter).
- A8 (main.rs:86-144): filter-reason audit counters -> observe() metrics
  whose buckets sum to records read.

Plan shape: one scan -> map (url_keys, flags) -> broadcast semi-join ->
filter -> map (prefix) -> partitioned write. Two stages at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..functions import native


def _location_url_keys(works: DataFrame) -> "F.Column":
    return F.transform(
        F.coalesce(F.col("locations"), F.array()),
        lambda loc: native.url_key(loc["landing_page_url"]),
    )


def filter_works(
    works: DataFrame, base_urls: DataFrame, with_observation: bool = False
) -> tuple[DataFrame, Observation | None]:
    """works (OPENALEX_WORKS schema) x base_urls(base_url string) ->
    works passing P4 + P5, with doi_prefix for partitioning."""
    keys = base_urls.select(
        F.explode(F.array(native.url_key(F.col("base_url")))).alias("url_key")
    ).where(F.col("url_key").isNotNull()).distinct()

    w = works.withColumn("url_keys", _location_url_keys(works))

    # P5: EXISTS over nested array (no explode — stays codegen'd)
    has_affil = F.exists(
        F.coalesce(F.col("authorships"), F.array()),
        lambda a: F.exists(
            F.coalesce(a["raw_affiliation_strings"], F.array()),
            lambda s: F.trim(s) != "",
        ),
    )
    w = w.withColumn("has_affiliation", has_affil)

    obs = None
    if with_observation:
        obs = Observation("corpus_filter")
        w = w.observe(
            obs,
            F.count(F.lit(1)).alias("records_read"),
            F.sum((F.size("url_keys") == 0).cast("long")).alias("no_locations"),
            F.sum(
                (F.size(F.filter("url_keys", lambda k: k.isNotNull())) == 0).cast("long")
            ).alias("no_parseable_url"),
            F.sum((~F.col("has_affiliation")).cast("long")).alias("no_affiliation"),
        )

    # P4: broadcast semi-join on the exploded location key. arrays_overlap
    # with a broadcast-collected literal set would also work; the semi-join
    # keeps Catalyst in charge of the build side.
    exploded = w.select("*", F.explode_outer("url_keys").alias("url_key"))
    passed = (
        exploded.join(F.broadcast(keys), "url_key", "left_semi")
        .dropDuplicates(["id"])  # a work may match via several locations
        .where(F.col("has_affiliation"))
    )
    out = passed.withColumn(
        "doi_prefix", native.doi_prefix_or_unknown(F.col("doi"))
    ).drop("url_keys", "url_key", "has_affiliation")
    return out, obs


def audit_counts(works: DataFrame) -> DataFrame:
    """A8 as a composable aggregation: the same filter-reason counters the
    observe() path records (main.rs:86-144), but as a one-row DataFrame so
    they can be verified/joined like any other query (observe() metrics are
    only readable after an action). Bucket definitions are IDENTICAL to the
    observe() path above (no_parseable_url subsumes no_locations, as there)."""
    w = works.withColumn("url_keys", _location_url_keys(works))
    has_affil = F.exists(
        F.coalesce(F.col("authorships"), F.array()),
        lambda a: F.exists(
            F.coalesce(a["raw_affiliation_strings"], F.array()),
            lambda s: F.trim(s) != "",
        ),
    )
    return w.agg(
        F.count(F.lit(1)).alias("records_read"),
        F.sum((F.size("url_keys") == 0).cast("long")).alias("no_locations"),
        F.sum(
            (F.size(F.filter("url_keys", lambda k: k.isNotNull())) == 0).cast("long")
        ).alias("no_parseable_url"),
        F.sum((~has_affil).cast("long")).alias("no_affiliation"),
    )


def write_partitioned(df: DataFrame, out_dir: str) -> None:
    """S5: the DOI-prefix-partitioned sink (out/<prefix>/... layout of
    main.rs:368-378). Spark sorts rows to bound concurrent writers — the
    reference's LRU cache (main.rs:390-459) is not needed."""
    df.write.mode("overwrite").partitionBy("doi_prefix").parquet(out_dir)
