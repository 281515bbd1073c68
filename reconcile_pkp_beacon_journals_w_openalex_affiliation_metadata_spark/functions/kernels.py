"""Pure-Python/numpy scalar kernels (no Spark imports).

These are the batch bodies of the vectorized pandas UDFs in ``udfs.py`` and
the oracles for unit/property tests. Semantics follow the reference:

- ``normalize_text``  check_landing_page_author_affiliation_parsing_against_openalex.py:16-27
  (unidecode -> ASCII, lowercase, strip non [a-z0-9\\s], collapse whitespace)
- ``indel_ratio``     rapidfuzz ``fuzz.ratio`` = normalized InDel similarity
  x100 (InDel = Levenshtein with substitutions disallowed = len_a + len_b -
  2*LCS), used at check_landing_page...py:163-164,232-233. Implemented with
  the Allison-Dix / Hyyro bit-parallel LCS on Python big ints.
- ``jaro_winkler`` / ``token_set_ratio``  north_rule scoring features,
  published algorithms (Winkler 1990; fuzzywuzzy/rapidfuzz token_set).

``ascii_fold`` replaces the ``unidecode`` dependency (not installed here):
NFKD decomposition + combining-mark strip + an explicit table for the Latin
letters that do not NFKD-decompose. For Latin-script input (the linkage
domain's dominant case) it agrees with unidecode; CJK transliteration is out
of scope and such chars are dropped by the normalize regex anyway.
"""

from __future__ import annotations

import re
import unicodedata

# Latin characters that NFKD does not decompose, mapped as unidecode does.
_FOLD_TABLE = {
    "Ø": "O", "ø": "o",       # Ø ø
    "Æ": "AE", "æ": "ae",     # Æ æ
    "Œ": "OE", "œ": "oe",     # Œ œ
    "ß": "ss",                      # ß
    "Ð": "D", "ð": "d",       # Ð ð
    "Þ": "Th", "þ": "th",     # Þ þ
    "Đ": "D", "đ": "d",       # Đ đ
    "Ł": "L", "ł": "l",       # Ł ł
    "Ħ": "H", "ħ": "h",       # Ħ ħ
    "Ŧ": "T", "ŧ": "t",       # Ŧ ŧ
    "ı": "i",                       # ı
    "Ŋ": "NG", "ŋ": "ng",     # Ŋ ŋ
    "‘": "'", "’": "'",       # ‘ ’
    "“": '"', "”": '"',       # “ ”
    "–": "-", "—": "-",       # – —
    "·": "*",                       # · (unidecode: '*')
    "…": "...",                     # …
    " ": " ",                       # nbsp
}
_FOLD_RX = re.compile("|".join(map(re.escape, _FOLD_TABLE)))


def ascii_fold(s: str) -> str:
    """Transliterate to ASCII (unidecode stand-in for Latin scripts)."""
    if not s:
        return s or ""
    if s.isascii():  # fast path: the dominant case in Latin-script corpora
        return s
    s = _FOLD_RX.sub(lambda m: _FOLD_TABLE[m.group(0)], s)
    s = unicodedata.normalize("NFKD", s)
    return "".join(c for c in s if ord(c) < 128 and not unicodedata.combining(c))


_NON_ALNUM_RX = re.compile(r"[^a-z0-9\s]")
_WS_RX = re.compile(r"\s+")


def normalize_text(s: str | None) -> str:
    """Reference normalize: ascii-fold, lower, drop non-alnum, collapse ws.

    Mirrors check_landing_page...py:16-27 exactly (unidecode -> lower ->
    re.sub(r'[^a-z0-9\\s]','') -> ' '.join(split())).
    """
    if s is None:
        return ""
    s = ascii_fold(s).lower()
    s = _NON_ALNUM_RX.sub("", s)
    return _WS_RX.sub(" ", s).strip()


# ---------------------------------------------------------------------------
# InDel ratio (rapidfuzz fuzz.ratio semantics)
# ---------------------------------------------------------------------------

def lcs_length(a: str, b: str) -> int:
    """Bit-parallel LCS length (Allison-Dix; Hyyro 2004) on big ints."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    if la > lb:  # build the bitmask over the shorter string
        a, b, la, lb = b, a, lb, la
    pm: dict[str, int] = {}
    bit = 1
    for c in a:
        pm[c] = pm.get(c, 0) | bit
        bit <<= 1
    mask = (1 << la) - 1
    v = mask
    for c in b:
        u = v & pm.get(c, 0)
        v = ((v + u) | (v - u)) & mask
    # LCS = number of zero bits in v within the mask
    return la - bin(v).count("1")


def indel_distance(a: str, b: str) -> int:
    return len(a) + len(b) - 2 * lcs_length(a, b)


def indel_ratio(a: str | None, b: str | None) -> float:
    """rapidfuzz ``fuzz.ratio``: 100 * (1 - InDel/(|a|+|b|)); 100.0 if both empty."""
    a = a or ""
    b = b or ""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return 100.0 * (1.0 - indel_distance(a, b) / total)


# ---------------------------------------------------------------------------
# Jaro-Winkler (Winkler 1990), returned on a 0..100 scale
# ---------------------------------------------------------------------------

def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    # bit-parallel greedy window matching (the rapidfuzz approach): position
    # masks per char of b; candidates = pm[c] & window & ~taken; take lowest.
    pm: dict[str, int] = {}
    bit = 1
    for c in b:
        pm[c] = pm.get(c, 0) | bit
        bit <<= 1
    taken = 0
    a_match_idx = []
    get = pm.get
    for i, ca in enumerate(a):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > lb:
            hi = lb
        cand = get(ca, 0) & ((1 << hi) - (1 << lo)) & ~taken
        if cand:
            low = cand & -cand
            taken |= low
            a_match_idx.append(low.bit_length() - 1)
    matches = len(a_match_idx)
    if matches == 0:
        return 0.0
    # transpositions: matched chars in a-order vs matched chars in b-order
    in_b_order = sorted(a_match_idx)
    t = sum(1 for x, y in zip(a_match_idx, in_b_order) if b[x] != b[y]) / 2.0
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str | None, b: str | None, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler similarity x100 (prefix boost up to 4 chars)."""
    a = a or ""
    b = b or ""
    j = jaro(a, b)
    if j > 0.7:
        prefix = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca == cb:
                prefix += 1
            else:
                break
        j += prefix * prefix_weight * (1.0 - j)
    return 100.0 * j


# ---------------------------------------------------------------------------
# token_set_ratio (fuzzywuzzy/rapidfuzz published algorithm)
# ---------------------------------------------------------------------------

def token_set_ratio(a: str | None, b: str | None) -> float:
    ta = set((a or "").split())
    tb = set((b or "").split())
    if not ta and not tb:
        return 100.0
    inter = sorted(ta & tb)
    diff_ab = sorted(ta - tb)
    diff_ba = sorted(tb - ta)
    s_inter = " ".join(inter)
    s1 = (s_inter + " " + " ".join(diff_ab)).strip()
    s2 = (s_inter + " " + " ".join(diff_ba)).strip()
    if inter and (not diff_ab or not diff_ba):
        return 100.0
    # s_inter is a PREFIX of s1 and of s2, so LCS(s_inter, sX) == len(s_inter)
    # exactly -> those two ratios have the closed form 200*li/(li+lX); only
    # the s1-vs-s2 comparison needs the real DP.
    li, l1, l2 = len(s_inter), len(s1), len(s2)
    r1 = 100.0 * (2.0 * li) / (li + l1) if (li + l1) else 100.0
    r2 = 100.0 * (2.0 * li) / (li + l2) if (li + l2) else 100.0
    return max(r1, r2, indel_ratio(s1, s2))
