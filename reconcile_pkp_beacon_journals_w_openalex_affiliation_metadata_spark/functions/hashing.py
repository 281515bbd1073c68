"""Deterministic hashing kernels: MinHash, SimHash, n-gram shingles.

Used by title-band blocking (north_rule) and the dedup operator family.
All seeds are fixed constants -> bit-identical output across runs, executors
and cluster sizes (a hard requirement for blocking keys: the same title must
land in the same band on every executor).

numpy-vectorized across the tokens of one value; the pandas-UDF wrappers in
``udfs.py`` loop over rows of an Arrow batch (no Spark row-at-a-time UDFs).
"""

from __future__ import annotations

import zlib

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)
_MAXH = np.uint64((1 << 32) - 1)


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 31) - 1, size=num_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 31) - 1, size=num_perm).astype(np.uint64)
    return a, b


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _perms(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    return _PERM_CACHE[key]


def token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 32-bit hashes (crc32) of tokens."""
    return np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in tokens), dtype=np.uint64, count=len(tokens)
    )


def shingles(text: str, k: int = 3) -> list[str]:
    """Word k-shingles of normalized text (k=3 default; shorter texts -> whole text)."""
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def char_ngrams(text: str, n: int = 3) -> list[str]:
    if len(text) < n:
        return [text] if text else []
    return [text[i : i + n] for i in range(len(text) - n + 1)]


def minhash_signature(tokens: list[str], num_perm: int = 64, seed: int = 42) -> np.ndarray:
    """num_perm 32-bit minhash values; empty input -> all MAXH sentinel."""
    if not tokens:
        return np.full(num_perm, _MAXH, dtype=np.uint64)
    h = token_hashes(tokens)  # (n,)
    a, b = _perms(num_perm, seed)  # (p,)
    # (p, n) universal hash: ((a*h + b) mod mersenne) & 32-bit
    vals = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE
    return (vals & _MAXH).min(axis=1)


def minhash_bands(
    tokens: list[str], num_perm: int = 64, bands: int = 16, seed: int = 42
) -> list[str]:
    """LSH band keys: signature split into ``bands`` rows-per-band groups,
    each band hashed to a stable hex key ``b{i}:{crc32 of band bytes}``."""
    sig = minhash_signature(tokens, num_perm=num_perm, seed=seed)
    r = num_perm // bands
    out = []
    for i in range(bands):
        band = sig[i * r : (i + 1) * r].astype(np.uint32).tobytes()
        out.append(f"b{i}:{zlib.crc32(band):08x}")
    return out


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token crc32x2 hashes (signed int64 for Spark)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        b = t.encode("utf-8")
        h = (zlib.crc32(b) << 32) | zlib.crc32(b[::-1])
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
        acc += 2 * bits - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    # wrap to signed int64
    return out - (1 << 64) if out >= (1 << 63) else out


def hamming64(x: int, y: int) -> int:
    return bin((x ^ y) & ((1 << 64) - 1)).count("1")


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0
