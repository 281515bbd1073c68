"""t11 true sequence packing: coverage rows must tile every pack exactly.

Invariants (the pretraining-packer contract):
- per (stratum, pack): slices tile [0, PACK) gaplessly; every pack is
  exactly PACK tokens except the last pack of each stratum;
- per doc: its slices concatenate to [0, n_tokens) in order — nothing
  dropped, nothing duplicated, splits contiguous across packs;
- a doc longer than several packs fans out into the right number of rows.
"""

from __future__ import annotations

import os
import tempfile


def _run_t11(spark, docs_rows):
    """Run the registered t11 query over a synthetic documents table."""
    import __spark_entry__ as entry

    df = spark.createDataFrame(docs_rows, "doc_id long, source string, text string")
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))
        out = entry.queries()["t11_sequence_packing_slices"](spark, td)
        return out.collect()


def test_packing_tiles_every_pack_exactly(spark):
    # 3 strata; stratum "a" includes one 700-token doc (spans >2 packs of
    # 256) and enough 100-token docs to force many boundary splits
    rows = []
    did = 0
    for s, sizes in {
        "a": [100, 700, 30, 256, 1, 255, 100],
        "b": [256, 256, 256],          # exact-fit docs: no splits at all
        "c": [5],                      # single tiny doc, one partial pack
    }.items():
        for n in sizes:
            rows.append((did, s, " ".join(f"w{i}" for i in range(n))))
            did += 1
    got = _run_t11(spark, rows)
    PACK = 256
    n_tok = {r[0]: len(r[2].split()) for r in rows}

    # per-doc: slices reassemble [0, n_tokens) contiguously, pack ids and
    # offsets advance consistently
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_tok)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r["pack_id"])
        assert rs[0]["slice_start"] == 0
        pos = 0
        for r in rs:
            assert r["slice_start"] == pos
            assert r["slice_len"] >= 1
            pos += r["slice_len"]
        assert pos == n_tok[doc]
        # interior rows of a multi-pack doc fill their whole pack
        for r in rs[1:-1]:
            assert r["pack_offset"] == 0 and r["slice_len"] == PACK
        if len(rs) > 1:
            assert rs[-1]["pack_offset"] == 0  # continuation starts the pack

    # the 700-token doc spans ceil((off+700)/256) packs with off its offset
    seven = [d for d, n in n_tok.items() if n == 700][0]
    assert len(by_doc[seven]) >= 3

    # per (stratum, pack): gapless tiling, exactly PACK except the last
    packs = {}
    for r in got:
        packs.setdefault((r["source"], r["pack_id"]), []).append(r)
    last_pack = {}
    for (s, p) in packs:
        last_pack[s] = max(last_pack.get(s, -1), p)
    for (s, p), rs in packs.items():
        rs.sort(key=lambda r: r["pack_offset"])
        pos = 0
        for r in rs:
            assert r["pack_offset"] == pos, (s, p, rs)
            pos += r["slice_len"]
        if p < last_pack[s]:
            assert pos == PACK, (s, p, pos)
        else:
            assert 1 <= pos <= PACK
    # stratum packs are contiguous from 0
    for s, lp in last_pack.items():
        assert {p for (s2, p) in packs if s2 == s} == set(range(lp + 1))

    # stratum totals: sum of slice lens == sum of token counts
    for s in ("a", "b", "c"):
        tot = sum(r["slice_len"] for r in got if r["source"] == s)
        assert tot == sum(n for d, n in n_tok.items()
                          if dict((r2[0], r2[1]) for r2 in rows)[d] == s)


def _run_t14(spark, docs_rows):
    import __spark_entry__ as entry

    df = spark.createDataFrame(docs_rows, "doc_id long, source string, text string")
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))
        return entry.queries()["t14_pack_materialize"](spark, td).collect()


def test_materialized_packs_reconstruct_stream(spark):
    """t14 pack materialization: every pack is exactly PACK tokens except the
    trailing pack per stratum, and concatenating the packs in pack_id order
    reconstructs the stratum's exact document stream (docs in doc_id order,
    nothing dropped, duplicated, or reordered across split boundaries)."""
    rows = []
    did = 0
    for s, sizes in {
        "a": [100, 700, 30, 256, 1, 255, 100],  # boundary splits + long doc
        "b": [256, 256, 256],                   # exact fits
        "c": [5],                               # single partial pack
    }.items():
        for n in sizes:
            # tokens unique per doc so cross-doc reorder/dup is detectable
            rows.append((did, s, " ".join(f"d{did}w{i}" for i in range(n))))
            did += 1
    got = _run_t14(spark, rows)
    PACK = 256
    by_stratum = {}
    for r in got:
        by_stratum.setdefault(r["source"], []).append(r)
    for s, rs in by_stratum.items():
        rs.sort(key=lambda r: r["pack_id"])
        assert [r["pack_id"] for r in rs] == list(range(len(rs)))
        for r in rs[:-1]:
            assert r["pack_len"] == PACK, (s, r["pack_id"])
        assert 1 <= rs[-1]["pack_len"] <= PACK
        for r in rs:
            assert len(r["pack_text"].split(" ")) == r["pack_len"]
        stream = " ".join(r["pack_text"] for r in rs)
        expected = " ".join(
            t for (d, s2, t) in sorted(rows) if s2 == s
        )
        assert stream == expected, s


def test_delta_pack_slices_equals_full_rebuild(spark):
    """Incremental packing: for random append splits, delta_pack_slices over
    (new batch + committed per-stratum totals) emits exactly the full
    rebuild's coverage rows for the new docs — including the row that tops
    up the committed stream's trailing partial pack; brand-new strata start
    at offset 0."""
    import random

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.packing import (
        delta_pack_slices,
        pack_slices,
        stratum_token_totals,
    )

    PACK = 64
    for seed in range(3):
        rng = random.Random(seed)
        rows = []
        did = 0
        for s in ("a", "b", "c"):
            for _ in range(rng.randint(2, 10)):
                n = rng.randint(1, 3 * PACK)
                rows.append((did, s, " ".join(f"d{did}w{j}" for j in range(n))))
                did += 1
        # stratum "d" exists ONLY in the new batch
        split = rng.randint(1, did - 1)
        rows_new_only = [(did, "d", " ".join(f"w{j}" for j in range(10)))]
        df = spark.createDataFrame(
            rows + rows_new_only, "doc_id long, source string, text string"
        )
        old = df.where(f"doc_id < {split}")
        new = df.where(f"doc_id >= {split}")

        full = pack_slices(df, pack_size=PACK)
        want = sorted(
            tuple(r) for r in full.where(f"doc_id >= {split}").collect()
        )
        got = sorted(
            tuple(r)
            for r in delta_pack_slices(
                new, stratum_token_totals(old), pack_size=PACK
            ).collect()
        )
        assert got == want, seed


def test_delta_materialize_packs_equals_full_rebuild(spark):
    """Incremental materialization: committed manifest below the trailing
    pack untouched; delta emits the trailing pack (topped up) and all later
    packs; union == full rebuild's manifest. Random append splits, strata
    with full and partial trailing packs, plus a new-only stratum."""
    import random

    from pyspark.sql import functions as F

    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.operators.packing import (
        delta_materialize_packs,
        materialize_packs,
        stratum_token_totals,
    )

    PACK = 64
    for seed in range(3):
        rng = random.Random(50 + seed)
        rows = []
        did = 0
        for s in ("a", "b", "c"):
            for _ in range(rng.randint(2, 9)):
                n = rng.choice([PACK, rng.randint(1, 3 * PACK)])
                rows.append((did, s, " ".join(f"d{did}w{j}" for j in range(n))))
                did += 1
        split = rng.randint(1, did - 1)
        rows.append((did, "d", " ".join(f"w{j}" for j in range(PACK + 5))))
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        old = df.where(f"doc_id < {split}")
        new = df.where(f"doc_id >= {split}")

        full = materialize_packs(df, pack_size=PACK)
        want = {(r["source"], r["pack_id"]): (r["pack_text"], r["pack_len"])
                for r in full.collect()}

        committed = materialize_packs(old, pack_size=PACK)
        from pyspark.sql import Window

        wlast = Window.partitionBy("source")
        trailing = (
            committed.withColumn("mx", F.max("pack_id").over(wlast))
            .where(F.col("pack_id") == F.col("mx"))
            .select("source", "pack_id", "pack_text")
        )
        delta = delta_materialize_packs(
            new, stratum_token_totals(old), trailing, pack_size=PACK
        )
        got = {(r["source"], r["pack_id"]): (r["pack_text"], r["pack_len"])
               for r in delta.collect()}

        # apply as a replace-by-(stratum, pack_id) upsert over the manifest
        merged = {(r["source"], r["pack_id"]): (r["pack_text"], r["pack_len"])
                  for r in committed.collect()}
        merged.update(got)
        assert merged == want, seed
        # the delta includes each stratum's trailing pack id and beyond only
        trail_ids = {r["source"]: r["pack_id"] for r in trailing.collect()}
        for (s, pid) in got:
            assert pid >= trail_ids.get(s, 0), (seed, s, pid)
