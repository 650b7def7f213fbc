"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin at a given sf_dir, compare
row count, column names and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import ray

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def to_pandas(result) -> pd.DataFrame:
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return pd.DataFrame(result)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> int:
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            report[name] = {
                "status": "fail", "mode": "exception", "rows": None,
                "sec": round(time.monotonic() - t0, 2),
                "err": f"{type(exc).__name__}: {exc}"[:300],
            }
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(got)} rows, {dt:.1f}s")
            report[name] = {
                "status": "ok", "mode": "rows_only", "rows": len(got),
                "sec": round(dt, 2), "err": None,
            }
            continue
        want = con.sql(oracles[name]).df()
        g, w = canon(got), canon(want)
        err = None
        if list(g.columns) != list(w.columns):
            err = f"columns {list(g.columns)} != {list(w.columns)}"
        elif len(g) != len(w):
            err = f"rows {len(g)} != {len(w)}"
        else:
            try:
                # check_dtype=True mirrors the driver's value-hash
                # semantics: a DuckDB HUGEINT sum materialized as float64
                # must NOT silently compare equal to the engine's int64
                # (round-1 failure mode).
                pd.testing.assert_frame_equal(g, w, check_dtype=True)
            except AssertionError as exc:
                err = f"values differ: {str(exc)[:300]}"
        if err:
            print(f"FAIL {name}: {err}")
            failures += 1
            report[name] = {
                "status": "fail", "mode": "oracle", "rows": len(g),
                "sec": round(dt, 2), "err": err,
            }
            continue
        print(f"OK   {name}: {len(g)} rows match oracle, {dt:.1f}s")
        report[name] = {
            "status": "ok", "mode": "oracle", "rows": len(g),
            "sec": round(dt, 2), "err": None,
        }

    ray.shutdown()
    print("FAILURES:", failures)
    if json_path:
        import json

        n_ok = sum(1 for r in report.values() if r["status"] == "ok")
        out = {
            "sf_dir": sf_dir,
            "n_queries": len(report),
            "n_ok": n_ok,
            "n_fail": failures,
            "n_oracle": sum(
                1 for r in report.values() if r["mode"] == "oracle"
            ),
            "n_rows_only": sum(
                1 for r in report.values() if r["mode"] == "rows_only"
            ),
            "queries": report,
        }
        with open(json_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=False)
        print("wrote", json_path)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
