"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
count, column names, and order-insensitive stringified values.

A FULL sweep (no query names given) also writes ``PARITY_LOCAL.json`` at
the repo root — the committed per-round artifact covering ALL registered
queries, including the ones the driver's 50-query sample skips (r3 verdict:
8 of 58 registered queries had no recorded green row anywhere). Fields per
query mirror CORRECTNESS_r{N}.json, plus the git HEAD the sweep ran at.

Usage: python tools/check_oracle_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
from decimal import Decimal

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.session import (  # noqa: E402
    get_spark,
)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    # Type-sensitive on purpose: the driver's value hash distinguishes
    # int from float (e.g. DuckDB HUGEINT -> float64 via Arrow), so an
    # int-valued float must NOT normalize to the int's string.
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return "dec:" + str(v)
    if isinstance(v, float):
        # NO -0.0 fold: the driver's hash is bit-sensitive, so the local
        # replica must flag signed-zero divergence too (r2 x4 lesson) —
        # queries/oracles normalize it themselves ("+ 0.0" after round)
        return "f:" + repr(v)
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    return str(v)


def rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle_parity", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        results[name] = rec
        if name not in oracles:
            # no oracle -> nothing was COMPARED: rows_match stays null so a
            # consumer scanning the artifact for green rows can never count
            # a rows-only run as verified parity
            rec["rows_only"] = True
            try:
                df = fn(spark, sf_dir)
                rec["spark_rows"] = df.count()
                print(f"{name:32s} ROWS-ONLY ok ({rec['spark_rows']} rows)")
            except Exception as e:
                rec["err"] = str(e)[:300]
                print(f"{name:32s} ROWS-ONLY FAILED: {e}")
                failures.append(name)
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:
            rec["err"] = "spark: " + str(e)[:300]
            print(f"{name:32s} SPARK FAILED: {str(e)[:200]}")
            failures.append(name)
            continue
        try:
            res = con.sql(oracles[name])
            # Fetch via Arrow, like the driver: this is where DuckDB's
            # HUGEINT (int128 from raw sum()) silently becomes float64,
            # so a missing BIGINT cast in an oracle shows up here too.
            tbl = res.fetch_arrow_table()
            dcols = tbl.column_names
            dlists = [tbl.column(c).to_pylist() for c in dcols]
            drows = list(zip(*dlists)) if dcols else []
            rec["oracle_rows"] = len(drows)
        except Exception as e:
            rec["err"] = "duckdb: " + str(e)[:300]
            print(f"{name:32s} DUCKDB FAILED: {str(e)[:200]}")
            failures.append(name)
            continue
        ok = True
        rec["schema_match"] = sorted(scols) == sorted(dcols)
        rec["rows_match"] = len(srows) == len(drows)
        if not rec["schema_match"]:
            print(f"{name:32s} SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif not rec["rows_match"]:
            print(f"{name:32s} COUNT MISMATCH spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            ms, md = rows_to_multiset(scols, srows), rows_to_multiset(dcols, drows)
            rec["hash_match"] = ms == md
            if ms != md:
                diffs = [(a, b) for a, b in zip(ms, md) if a != b][:3]
                print(f"{name:32s} VALUE MISMATCH ({sum(1 for a, b in zip(ms, md) if a != b)} rows) e.g. {diffs}")
                ok = False
        if ok:
            print(f"{name:32s} OK ({len(srows)} rows)")
        else:
            failures.append(name)
    print("\nFAILURES:", failures if failures else "none")
    if not only:
        # full sweep -> committed artifact (driver samples only ~50 queries;
        # this records a verdict for every registered one at a known HEAD)
        try:
            head = subprocess.run(
                ["git", "rev-parse", "HEAD"], cwd="/root/repo",
                capture_output=True, text=True,
            ).stdout.strip()
        except Exception:
            head = "unknown"
        payload = {
            "_meta": {
                "git_head": head,
                "sf_dir": sf_dir,
                "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
                    timespec="seconds"
                ),
                "n_queries": len(results),
                "n_failures": len(failures),
            },
            "queries": results,
        }
        out = os.path.join("/root/repo", "PARITY_LOCAL.json")
        with open(out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {out} ({len(results)} queries at {head[:9]})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
