"""Vectorized pandas UDFs (Arrow-batched) — the ONLY Python crossings.

Per ``input_hint``: "vectorized pandas/Arrow UDFs (no per-row Python)
throughout". Each UDF receives whole Arrow batches as pandas Series; the
bodies loop in tight Python over the batch (there is no C kernel available
for InDel/JW in this environment), which is the documented fallback of
SURVEY.md §2.10. Everything that CAN stay native (regex normalize steps,
url parsing, array ops) is native in ``native.py`` — these UDFs cover only
ascii-fold transliteration and the similarity scorers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import hashing, kernels


@F.pandas_udf(T.StringType())
def norm_text_udf(s: pd.Series) -> pd.Series:
    """Reference normalize_text (check_landing_page...py:16-27)."""
    return s.map(lambda x: kernels.normalize_text(x) if x is not None else "")


@F.pandas_udf(T.StringType())
def ascii_fold_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: kernels.ascii_fold(x) if x is not None else None)


@F.pandas_udf(T.DoubleType())
def indel_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """rapidfuzz fuzz.ratio parity (check_landing_page...py:163-164,232-233)."""
    return pd.Series(
        [kernels.indel_ratio(x, y) for x, y in zip(a, b)], index=a.index, dtype="float64"
    )


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [kernels.jaro_winkler(x, y) for x, y in zip(a, b)], index=a.index, dtype="float64"
    )


@F.pandas_udf(T.DoubleType())
def token_set_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [kernels.token_set_ratio(x, y) for x, y in zip(a, b)], index=a.index, dtype="float64"
    )


_SIM_STRUCT = T.StructType(
    [
        T.StructField("indel", T.DoubleType()),
        T.StructField("jw", T.DoubleType()),
        T.StructField("tsr", T.DoubleType()),
    ]
)


@F.pandas_udf(_SIM_STRUCT)
def sim_features_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """All three similarity features in ONE Arrow crossing (the scoring hot
    path serializes each title pair once instead of three times).

    Two batch-level optimizations for blocked candidate pairs:
    - equal-string fast path (identical normalized titles are the most
      common case inside ISSN/band blocks),
    - per-batch memo: band families repeat the same (a, b) title pair many
      times across different doc pairs — score each distinct pair once.

    When rapidfuzz is installed (optional; SURVEY §2.10), the whole Arrow
    batch is scored by its C++ ``process.cpdist`` instead — the pure-Python
    kernels stay as the tested oracle. workers=1: each Spark python worker
    is already one of many; letting rapidfuzz fan out to all cores would
    oversubscribe the executor."""
    if kernels.HAVE_RAPIDFUZZ:  # pragma: no cover - not installed in sandbox
        from rapidfuzz import fuzz as rf_fuzz
        from rapidfuzz import process as rf_process
        from rapidfuzz.distance import JaroWinkler as rf_JW

        av = [x or "" for x in a]
        bv = [y or "" for y in b]
        return pd.DataFrame(
            {
                "indel": rf_process.cpdist(av, bv, scorer=rf_fuzz.ratio, workers=1),
                "jw": rf_process.cpdist(av, bv, scorer=rf_JW.similarity, workers=1)
                * 100.0,
                "tsr": rf_process.cpdist(
                    av, bv, scorer=rf_fuzz.token_set_ratio, workers=1
                ),
            },
            index=a.index,
        ).astype("float64")
    n = len(a)
    indel = [0.0] * n
    jw = [0.0] * n
    tsr = [0.0] * n
    memo: dict[tuple, tuple] = {}
    for i, (x, y) in enumerate(zip(a, b)):
        if x == y:
            indel[i] = jw[i] = tsr[i] = 100.0
            continue
        key = (x, y)
        hit = memo.get(key)
        if hit is None:
            hit = memo[key] = kernels.sim_triple(x, y)
        indel[i], jw[i], tsr[i] = hit
    return pd.DataFrame({"indel": indel, "jw": jw, "tsr": tsr}, index=a.index)


def make_minhash_bands_udf(
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    tokenizer: str = "shingle",
):
    """MinHash LSH band keys over normalized text (north_rule title blocking).

    ``tokenizer``: 'shingle' = word k-shingles (catches token-level edits),
    'char' = character k-grams (catches letter-level typos; word shingles
    miss those because one letter flips k whole shingles). The blocker ORs
    both families. Deterministic seeds -> identical bands on every executor.
    """
    tok = (
        (lambda t: hashing.shingles(t, k=shingle_k))
        if tokenizer == "shingle"
        else (lambda t: hashing.char_ngrams(t, n=shingle_k))
    )

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(s: pd.Series) -> pd.Series:
        def one(text):
            if not text:
                return []
            return hashing.minhash_bands(
                tok(text), num_perm=num_perm, bands=bands, seed=seed
            )

        return s.map(one)

    return _udf


@F.pandas_udf(T.ArrayType(T.StringType()))
def norm_nonempty_array_udf(arr: pd.Series) -> pd.Series:
    """[norm(x) for x in arr if x], then drop empties — the affiliation
    normalization of check_landing_page...py:209-213 (both filters)."""

    def one(a):
        if a is None:
            return []
        normed = [kernels.normalize_text(x) for x in a if x]
        return [x for x in normed if x]

    return arr.map(one)


@F.pandas_udf(T.DoubleType())
def max_indel_over_array_udf(q: pd.Series, arr: pd.Series) -> pd.Series:
    """max(fuzz.ratio(q, x) for x in arr), 0.0 on empty — the institution
    score loop of check_landing_page...py:230-241."""

    def one(query, cands):
        if not query or cands is None or len(cands) == 0:
            return 0.0
        return max(kernels.indel_ratio(query, c) for c in cands)

    return pd.Series([one(x, y) for x, y in zip(q, arr)], index=q.index, dtype="float64")


@F.pandas_udf(T.LongType())
def simhash_udf(s: pd.Series) -> pd.Series:
    # ASCII-ws tokenization keeps the DuckDB oracle ('\s+' under RE2)
    # byte-exact on non-ASCII input
    return s.map(lambda x: hashing.simhash64(hashing.ascii_split(x)) if x else 0).astype(
        "int64"
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def char_trigrams_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: hashing.char_ngrams(x, 3) if x else [])
