"""Distributed logistic calibration (north_star "calibrated logistic
threshold"): fit on labeled pairs with pyspark.ml, F1-best threshold via the
distributed sweep, and the fitted model served back through score_pairs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators import (
    calibrate,
    scoring,
)
from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.plans.reconcile import (
    reconcile,
)


@pytest.fixture(scope="module")
def fitted(corpus_dfs):
    res = reconcile(corpus_dfs["documents"], with_clusters=False)
    scored = res.scored.persist()
    cal = calibrate.fit_calibration(res.records, corpus_dfs["labeled_pairs"])
    return res, scored, cal


def _f1_on_labeled(pred, labeled):
    joined = labeled.join(pred, ["left_id", "right_id"], "left").withColumn(
        "pred", F.coalesce(F.col("pred"), F.lit(False))
    )
    row = joined.agg(
        F.sum((F.col("is_match") & F.col("pred")).cast("int")).alias("tp"),
        F.sum((~F.col("is_match") & F.col("pred")).cast("int")).alias("fp"),
        F.sum((F.col("is_match") & ~F.col("pred")).cast("int")).alias("fn"),
    ).collect()[0]
    tp, fp, fn = row["tp"], row["fp"], row["fn"]
    return 2 * tp / (2 * tp + fp + fn) if tp else 0.0


def test_fit_reaches_f1_gate_on_train(fitted):
    _, _, cal = fitted
    assert cal.n_train > 100
    assert cal.train_f1 >= 0.99
    assert set(cal.weights) == {
        "bias", "indel", "jw", "tsr", "issn", "domain", "country",
    }
    assert all(math.isfinite(v) for v in cal.weights.values())
    # separable-ish synth corpus: title similarity must push toward match
    assert cal.weights["indel"] > 0
    assert -0.001 <= cal.threshold <= 1.0  # lower-edge return can dip below 0


def test_fitted_model_served_through_score_pairs(fitted, corpus_dfs):
    """End-to-end: re-score the SAME candidates with the fitted weights as
    plan literals and hit the F1 >= 0.99 north_rule gate — the calibration
    output is drop-in for the serving path."""
    res, _, cal = fitted
    rescored = scoring.score_pairs(
        res.candidate_pairs, res.records, weights=cal.weights, threshold=cal.threshold
    )
    pred = rescored.select(
        "left_id", "right_id", F.col("is_match_pred").alias("pred")
    )
    assert _f1_on_labeled(pred, corpus_dfs["labeled_pairs"]) >= 0.99


def test_fitted_weights_agree_with_shipped_constants(fitted, corpus_dfs):
    """The shipped DEFAULT_WEIGHTS were calibrated the same way; decisions
    from the fresh fit and the constants should agree on ~all labeled pairs."""
    res, scored, cal = fitted
    rescored = scoring.score_pairs(
        res.candidate_pairs, res.records, weights=cal.weights, threshold=cal.threshold
    )
    a = scored.select("left_id", "right_id", F.col("is_match_pred").alias("pa"))
    b = rescored.select("left_id", "right_id", F.col("is_match_pred").alias("pb"))
    both = a.join(b, ["left_id", "right_id"], "inner")
    n = both.count()
    agree = both.where(F.col("pa") == F.col("pb")).count()
    assert n > 0
    assert agree / n >= 0.99


def test_best_threshold_picks_separating_cut(spark):
    # positives at prob >= 0.8, negatives at prob <= 0.3: any cut in
    # (0.3, 0.8] gives F1 = 1.0, and the sweep returns the highest such bin
    rows = [(0.9, 1.0), (0.85, 1.0), (0.8, 1.0), (0.3, 0.0), (0.1, 0.0)]
    df = spark.createDataFrame(rows, "prob double, label double")
    thr, f1 = calibrate.best_threshold(df)
    assert f1 == 1.0
    assert 0.3 < thr <= 0.8


def test_best_threshold_matches_bruteforce_on_random_cases(spark):
    """Differential check: the distributed sweep equals an exhaustive local
    sweep (same quantization, same F1-desc-then-prob-desc tie rule)."""
    import random

    def brute(rows):
        probs = sorted({round(p, 4) for p, _ in rows}, reverse=True)
        total_pos = sum(l for _, l in rows)
        best_t, best_f1 = None, -1.0
        for t in probs:
            tp = sum(l for p, l in rows if round(p, 4) >= t)
            fp = sum(1 - l for p, l in rows if round(p, 4) >= t)
            f1 = 2.0 * tp / (2.0 * tp + fp + total_pos - tp)
            if f1 > best_f1:  # strict: ties keep the higher prob
                best_t, best_f1 = t, f1
        # mirror best_threshold's lower-edge return
        return best_t - 0.5 * 10.0 ** -4, best_f1

    for seed in range(5):
        rng = random.Random(seed)
        rows = [
            (rng.randrange(101) / 100.0, rng.randrange(2))
            for _ in range(rng.randrange(5, 40))
        ]
        rows[0] = (rows[0][0], 1)  # at least one positive
        df = spark.createDataFrame(
            [(p, float(l)) for p, l in rows], "prob double, label double"
        )
        got_t, got_f1 = calibrate.best_threshold(df)
        want_t, want_f1 = brute(rows)
        assert (got_t, got_f1) == (want_t, want_f1), f"seed={seed}"


def test_best_threshold_trades_off(spark):
    # one inseparable negative above the positives: best F1 keeps all
    # positives (tp=3, fp=1 -> F1 = 6/7) rather than cutting above them
    rows = [(0.95, 0.0), (0.9, 1.0), (0.8, 1.0), (0.7, 1.0), (0.2, 0.0)]
    df = spark.createDataFrame(rows, "prob double, label double")
    thr, f1 = calibrate.best_threshold(df)
    assert abs(f1 - 6.0 / 7.0) < 1e-9
    assert thr == pytest.approx(0.7 - 5e-5)  # lower edge of the 0.7 bin
