from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.session import (
        get_spark,
    )

    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus():
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark import synth

    return synth.generate(seed=42, n_journals=250)


@pytest.fixture(scope="session")
def corpus_dfs(spark, corpus):
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark import schemas

    return {
        "documents": spark.createDataFrame(corpus.documents, schema=schemas.DOCUMENTS),
        "pkp_journals": spark.createDataFrame(corpus.pkp_journals, schema=schemas.PKP_JOURNALS),
        "openalex_works": spark.createDataFrame(
            corpus.openalex_works, schema=schemas.OPENALEX_WORKS
        ),
        "landing_pairs": spark.createDataFrame(
            corpus.landing_pairs, schema=schemas.LANDING_PAIRS
        ),
        "labeled_pairs": spark.createDataFrame(
            corpus.labeled_pairs, schema=schemas.LABELED_PAIRS
        ),
    }
