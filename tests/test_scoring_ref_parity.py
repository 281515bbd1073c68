"""Differential test: Spark scorer (operators/scoring_ref.py) must reproduce
the reference's per-row decisions exactly (all 8 columns) on the synthetic
landing/works corpus — the reconciliation fixture of BASELINE.json."""

from __future__ import annotations

from oracle_ref import score_rows

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.scoring_ref import (
    compare_landing_to_works,
)

_KEY = ("RelativeFilePath", "DOI", "Author", "Institution", "Source")
_OUT = (
    "exact_author_match",
    "normalized_author_match",
    "author_similarity_score",
    "exact_institution_match",
    "normalized_institution_match",
    "institution_similarity_score",
    "openalex_matched_author_name",
    "openalex_matched_institution_strings",
)


def _as_sorted_tuples(rows):
    return sorted(
        (tuple(r[k] for k in _KEY) + tuple(r[k] for k in _OUT)) for r in rows
    )


def test_spark_scorer_matches_reference_oracle(corpus, corpus_dfs):
    got_df = compare_landing_to_works(
        corpus_dfs["landing_pairs"], corpus_dfs["openalex_works"]
    )
    got = _as_sorted_tuples([r.asDict() for r in got_df.collect()])

    # oracle needs plain dicts with nested authorship structure
    want = _as_sorted_tuples(score_rows(corpus.landing_pairs, corpus.openalex_works))

    assert len(got) == len(want) and len(got) > 100
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, f"{len(mismatches)} mismatching rows; first: {mismatches[0]}"


def test_scorer_empty_institution_semantics(spark):
    """Golden rows for the empty-vs-empty rules (check:215-228) and
    first-max tie-break (check:163-169)."""
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark import schemas

    landing = spark.createDataFrame(
        [
            # empty inst, work has no affils -> exact/norm True, score 100
            ("f1", "10.1/a", "Ana Silva", "", "meta"),
            # empty inst, work HAS affils -> exact/norm False, score 0
            ("f2", "10.1/b", "Ana Silva", "", "meta"),
            # tie: two authorships with identical names -> first one wins
            ("f3", "10.1/c", "Bo Li", "Inst X", "meta"),
            # invalid DOI -> dropped
            ("f4", "nope", "X", "Y", "meta"),
            # DOI not in works -> defaults (no best)
            ("f5", "10.9/zz", "Cd Ef", "Inst", "meta"),
        ],
        schema=schemas.LANDING_PAIRS,
    )
    mk_auth = lambda name, affils: {
        "raw_author_name": name,
        "author": {"display_name": name},
        "raw_affiliation_strings": affils,
    }
    works = spark.createDataFrame(
        [
            {"id": "W1", "doi": "https://doi.org/10.1/a",
             "primary_location": None, "best_oa_location": None, "locations": None,
             "authorships": [mk_auth("Ana Silva", [])]},
            {"id": "W2", "doi": "10.1/b",
             "primary_location": None, "best_oa_location": None, "locations": None,
             "authorships": [mk_auth("Ana Silva", ["Some University"])]},
            {"id": "W3", "doi": "doi:10.1/c",
             "primary_location": None, "best_oa_location": None, "locations": None,
             "authorships": [mk_auth("Bo Li", ["First Inst"]), mk_auth("Bo Li", ["Inst X"])]},
        ],
        schema=schemas.OPENALEX_WORKS,
    )
    got = {
        r["RelativeFilePath"]: r.asDict()
        for r in compare_landing_to_works(landing, works).collect()
    }
    assert set(got) == {"f1", "f2", "f3", "f5"}
    assert got["f1"]["exact_institution_match"] is True
    assert got["f1"]["normalized_institution_match"] is True
    assert got["f1"]["institution_similarity_score"] == 100.0
    assert got["f2"]["exact_institution_match"] is False
    assert got["f2"]["institution_similarity_score"] == 0.0
    # tie-break: first max wins -> affiliations come from the FIRST authorship
    assert got["f3"]["openalex_matched_institution_strings"] == "First Inst"
    assert got["f3"]["exact_institution_match"] is False
    assert got["f3"]["author_similarity_score"] == 100.0
    # no-best defaults
    assert got["f5"]["author_similarity_score"] == 0.0
    assert got["f5"]["openalex_matched_author_name"] == ""
    assert got["f5"]["exact_author_match"] is False
