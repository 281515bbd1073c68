"""Seeded randomized property sweeps for the round-5 operators.

Pattern follows test_incremental.py::test_delta_pairs_equivalence_on_random
_key_tables: a few seeded random inputs per property, each checked against
an independent pure-Python reference (sets / dicts — no Spark, no SQL), so
the properties hold beyond the single fixtures the DuckDB oracles pin.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _rand_docs(rng, n_docs, vocab, min_len=0, max_len=30):
    rows = []
    for i in range(n_docs):
        n = rng.randint(min_len, max_len)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    return rows


def test_pack_materialization_reconstructs_random_streams(spark):
    """For random strata/doc-length mixes: every pack is exactly PACK tokens
    except the trailing pack per stratum, and the concatenated packs equal
    the stratum's document stream token-for-token."""
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.packing import (
        materialize_packs,
    )

    PACK = 64
    for seed in range(3):
        rng = random.Random(seed)
        rows = []
        did = 0
        for s in ("a", "b", "c"):
            for _ in range(rng.randint(1, 12)):
                n = rng.choice([1, 3, PACK - 1, PACK, PACK + 1, 2 * PACK + 7,
                                rng.randint(1, 3 * PACK)])
                rows.append((did, s, " ".join(f"d{did}w{j}" for j in range(n))))
                did += 1
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = materialize_packs(df, pack_size=PACK).collect()
        by_s: dict[str, list] = {}
        for r in got:
            by_s.setdefault(r["source"], []).append(r)
        for s, rs in by_s.items():
            rs.sort(key=lambda r: r["pack_id"])
            assert [r["pack_id"] for r in rs] == list(range(len(rs))), (seed, s)
            for r in rs[:-1]:
                assert r["pack_len"] == PACK, (seed, s, r["pack_id"])
            assert 1 <= rs[-1]["pack_len"] <= PACK
            stream = " ".join(r["pack_text"] for r in rs)
            expected = " ".join(t for (d, s2, t) in sorted(rows) if s2 == s)
            assert stream == expected, (seed, s)


def test_decontamination_matches_python_reference_on_random_corpora(spark):
    """ngram_contamination == an exact pure-Python k-gram set intersection
    for random corpora (including docs shorter than k and repeated windows)."""
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.decontam import (
        ngram_contamination,
    )

    K = 4
    for seed in range(3):
        rng = random.Random(100 + seed)
        vocab = [f"w{j}" for j in range(12)]  # small vocab -> real overlaps
        bench_rows = _rand_docs(rng, rng.randint(2, 5), vocab, 0, 15)
        bench_rows = [(900 + i, t) for i, (_, t) in enumerate(bench_rows)]
        train_rows = _rand_docs(rng, rng.randint(5, 15), vocab, 0, 20)

        def grams(text):
            t = text.split()
            return [" ".join(t[i:i + K]) for i in range(len(t) - K + 1)]

        bench_min: dict[str, int] = {}
        for bid, t in bench_rows:
            for g in grams(t):
                bench_min[g] = min(bench_min.get(g, bid), bid)
        expected = {}
        for did, t in train_rows:
            shared = {g for g in grams(t) if g in bench_min}
            if shared:
                expected[did] = (len(shared), min(bench_min[g] for g in shared))

        train = spark.createDataFrame(train_rows, "doc_id long, text string")
        bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_hits"], r["first_bench_id"])
            for r in ngram_contamination(train, bench, k=K).collect()
        }
        assert got == expected, seed


def test_blocking_family_quality_matches_python_reference(spark):
    """family quality == an exact set-based reference over random key
    tables, caps included: per-family distinct keys, distinct pairs, and
    pairs no other family finds."""
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.pairs import (
        blocking_family_quality,
    )

    for seed in range(3):
        rng = random.Random(200 + seed)
        fams = ["issn", "band", "domain"]
        cap = 6
        rows = []
        for side, prefix, n in (("pkp", "p", 25), ("oa", "o", 25)):
            for i in range(n):
                for _ in range(rng.randint(0, 3)):
                    f = rng.choice(fams)
                    rows.append(
                        (f"{prefix}{i}", side, f"{f}:k{rng.randint(0, 9)}")
                    )
        rows = sorted(set(rows))
        # reference
        from collections import defaultdict

        members = defaultdict(set)
        for d, s, k in rows:
            members[k].add((d, s))
        kept = {k for k, m in members.items() if len(m) <= cap}
        fam_keys = defaultdict(set)
        pair_fams = defaultdict(set)
        for k in kept:
            fam = k.split(":")[0]
            fam_keys[fam].add(k)
            lefts = [d for d, s in members[k] if s == "pkp"]
            rights = [d for d, s in members[k] if s == "oa"]
            for l in lefts:
                for r in rights:
                    pair_fams[(l, r)].add(fam)
        expected = {}
        for fam in fam_keys:
            pairs_f = {p for p, fs in pair_fams.items() if fam in fs}
            excl = {p for p, fs in pair_fams.items() if fs == {fam}}
            expected[fam] = (len(fam_keys[fam]), len(pairs_f), len(excl))

        keys = spark.createDataFrame(rows, "doc_id string, side string, key string")
        got = {
            r["family"]: (r["n_keys"], r["n_pairs"], r["n_exclusive_pairs"])
            for r in blocking_family_quality(keys, max_block_size=cap).collect()
        }
        assert got == expected, seed


def test_dedup_decisions_match_union_find_on_random_graphs(spark):
    """dedup_decisions_from_edges == union-find transitive closure with
    min-id keepers, over random edge sets (chains, cliques, singletons)."""
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.dedup import (
        dedup_decisions_from_edges,
    )

    for seed in range(3):
        rng = random.Random(300 + seed)
        n = 40
        edges = sorted(
            {
                tuple(sorted((rng.randint(0, n - 1), rng.randint(0, n - 1))))
                for _ in range(rng.randint(5, 30))
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        expected = {}
        touched = {x for e in edges for x in e}
        for x in sorted(touched):
            root = find(x)
            if root != x:
                expected[x] = root

        df = spark.createDataFrame(edges, "u long, v long")
        got = {
            r["doc_id"]: r["keeper"]
            for r in dedup_decisions_from_edges(df).collect()
        }
        assert got == expected, seed
