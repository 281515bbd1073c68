"""Differential gate for the numpy lock-step similarity kernels: bit-exact
equality with the scalar oracles in kernels.py on adversarial and random
inputs (the scalar kernels are themselves DP-differential- and
golden-tested)."""

from __future__ import annotations

import random

import numpy as np

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.functions import (
    batch_kernels,
    kernels,
)

ALPHA = "abcdefghij 0123"


def _rnd(rng, maxlen, alphabet=ALPHA):
    return "".join(rng.choice(alphabet) for _ in range(rng.randrange(maxlen)))


def _adversarial_cases():
    rng = random.Random(7)
    cases = []
    edges = [
        "", "a", "aa", "ab", " ", "  ", "abc def",
        "a" * 63, "a" * 64, "a" * 65, "ab" * 50, "x" * 200,
        "a" * 256,  # exactly MAX_VEC_LEN
        "a" * 257,  # just past it -> scalar fallback lane
    ]
    for e in edges:
        cases.append((e, _rnd(rng, 10)))
        cases.append((e, e))
        cases.append((_rnd(rng, 80), e))
    for _ in range(200):
        cases.append((_rnd(rng, 200), _rnd(rng, 50)))  # la > 64, lb <= 64
        cases.append((_rnd(rng, 50), _rnd(rng, 200)))
    for _ in range(1500):
        cases.append((_rnd(rng, 60), _rnd(rng, 60)))
    for _ in range(200):
        cases.append((_rnd(rng, 256), _rnd(rng, 256)))  # multiword lanes
    for _ in range(30):  # non-ASCII -> per-row scalar fallback inside a batch
        cases.append((_rnd(rng, 30) + "é", _rnd(rng, 30)))
        cases.append((_rnd(rng, 30), "中" + _rnd(rng, 30)))
    return cases


def test_sim_triple_batch_bit_exact_vs_scalar():
    cases = _adversarial_cases()
    a = [x for x, _ in cases]
    b = [y for _, y in cases]
    vi, vj, vt = batch_kernels.sim_triple_batch(a, b)
    for i, (x, y) in enumerate(cases):
        assert vi[i] == kernels.indel_ratio(x, y), (x, y)
        assert vj[i] == kernels.jaro_winkler(x, y), (x, y)
        assert vt[i] == kernels.token_set_ratio(x, y), (x, y)


def test_title_like_workload_bit_exact():
    rng = random.Random(11)
    words = [
        "journal", "of", "tropical", "medicine", "review", "intl",
        "studies", "acta", "revista", "boletin", "0", "12",
    ]
    titles = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(1, 8)))
        for _ in range(400)
    ]
    pairs = [(rng.choice(titles), rng.choice(titles)) for _ in range(2000)]
    a = [x for x, _ in pairs]
    b = [y for _, y in pairs]
    vi, vj, vt = batch_kernels.sim_triple_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        assert (vi[i], vj[i], vt[i]) == kernels.sim_triple_py(x, y)


def test_lcs_batch_matches_scalar():
    rng = random.Random(3)
    pairs = [(_rnd(rng, 120), _rnd(rng, 120)) for _ in range(500)]
    pairs += [("", ""), ("", "abc"), ("abc", ""), ("a" * 300, "a" * 10)]
    got = batch_kernels.lcs_batch([x for x, _ in pairs], [y for _, y in pairs])
    for i, (x, y) in enumerate(pairs):
        assert got[i] == kernels.lcs_length(x, y), (x, y)


def test_none_handling_matches_scalar():
    a = [None, "abc", None, "x y z"]
    b = ["abc", None, None, "x z"]
    vi, vj, vt = batch_kernels.sim_triple_batch(a, b)
    for i in range(len(a)):
        assert vi[i] == kernels.indel_ratio(a[i], b[i])
        assert vj[i] == kernels.jaro_winkler(a[i], b[i])
        assert vt[i] == kernels.token_set_ratio(a[i], b[i])


def test_multiword_carry_borrow():
    """Strings straddling the 64-char word boundary exercise the manual
    carry/borrow propagation; compare against the big-int scalar kernel."""
    rng = random.Random(5)
    for _ in range(60):
        base = _rnd(rng, 130, "ab")  # low-alphabet -> dense carry chains
        mut = list(base)
        for _ in range(rng.randrange(1, 6)):
            if mut:
                mut[rng.randrange(len(mut))] = rng.choice("ab")
        other = "".join(mut)
        got = batch_kernels.indel_ratio_batch([base], [other])[0]
        assert got == kernels.indel_ratio(base, other)


def test_udf_scatter_paths():
    """sim_features_udf's memo/scatter logic (equal fast path + distinct
    dedup) through the batch kernels, without a SparkSession."""
    import pandas as pd

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.functions import (
        udfs,
    )

    a = pd.Series(["abc", "abc", None, "x y", "abc", None])
    b = pd.Series(["abc", "abd", None, "y x", "abd", "q"])
    out = udfs.sim_features_udf.func(a, b)
    for i in range(len(a)):
        x, y = a[i], b[i]
        if x == y or (x is None and y is None):
            assert (out["indel"][i], out["jw"][i], out["tsr"][i]) == (
                100.0, 100.0, 100.0,
            )
        else:
            assert out["indel"][i] == kernels.indel_ratio(x, y)
            assert out["jw"][i] == kernels.jaro_winkler(x, y)
            assert out["tsr"][i] == kernels.token_set_ratio(x, y)


def test_max_indel_over_array_udf_matches_scalar():
    import pandas as pd

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.functions import (
        udfs,
    )

    q = pd.Series(["abc", None, "", "xy", "deep"])
    arr = pd.Series([["abd", "zzz"], ["abc"], ["abc"], None, []])
    out = udfs.max_indel_over_array_udf.func(q, arr)
    want = [
        max(kernels.indel_ratio("abc", c) for c in ["abd", "zzz"]),
        0.0, 0.0, 0.0, 0.0,
    ]
    assert list(out) == want


def test_property_random_unicode_pairs():
    """Hypothesis sweep: arbitrary text (incl. unicode + whitespace runs)
    through the batched triple equals the scalar oracles bit-for-bit."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    text = st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=80,
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.tuples(text, text), min_size=1, max_size=8))
    def inner(pairs):
        a = [x for x, _ in pairs]
        b = [y for _, y in pairs]
        vi, vj, vt = batch_kernels.sim_triple_batch(a, b)
        for i, (x, y) in enumerate(pairs):
            assert vi[i] == kernels.indel_ratio(x, y)
            assert vj[i] == kernels.jaro_winkler(x, y)
            assert vt[i] == kernels.token_set_ratio(x, y)

    inner()


def test_nul_strings_take_scalar_lane():
    """'\\0' is the pad char of the code matrices; inputs containing it must
    fall back to the scalar kernel (they'd otherwise read as ended lanes)."""
    cases = [("\0", "\0"), ("a\0b", "a\0b"), ("a\0", "ab"), ("\0\0", "x")]
    a = [x for x, _ in cases]
    b = [y for _, y in cases]
    vi, vj, vt = batch_kernels.sim_triple_batch(a, b)
    for i, (x, y) in enumerate(cases):
        assert vi[i] == kernels.indel_ratio(x, y), (x, y)
        assert vj[i] == kernels.jaro_winkler(x, y), (x, y)
        assert vt[i] == kernels.token_set_ratio(x, y), (x, y)
