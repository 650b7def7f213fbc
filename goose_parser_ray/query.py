"""Query-surface CLI (the ad-hoc runner beside the extraction job CLI):

    python -m goose_parser_ray.query --list
    python -m goose_parser_ray.query <name> [--sf-dir DIR] [--out PATH]
        [--limit N] [--num-cpus N]

Runs one named operator from the driver-contract surface
(``goose_parser_ray.queries.QUERIES``) against a testdata-shaped table
directory, prints a row count + preview, and optionally writes the result
as parquet (a Dataset result streams via ``write_parquet``; a small
driver-side table writes directly). Owns the Ray session (guarded init) —
library code never does.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="goose_parser_ray.query", description=__doc__)
    p.add_argument("name", nargs="?", help="query name (see --list)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", help="write result to this parquet path/dir")
    p.add_argument("--limit", type=int, default=10, help="preview rows")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument(
        "--list", action="store_true",
        help="list query names (* = has a DuckDB oracle twin) and exit",
    )
    p.add_argument(
        "--stats", action="store_true",
        help="print the Ray Data execution stats (per-operator walls, "
        "task counts) after running a Dataset-returning query",
    )
    args = p.parse_args(argv)

    from goose_parser_ray.queries import ORACLE_SQL, QUERIES

    if args.list:
        try:
            for name in sorted(QUERIES):
                mark = "*" if name in ORACLE_SQL else " "
                print(f"{mark} {name}")
        except BrokenPipeError:  # `... | head` closed the pipe — fine
            pass
        return 0
    if not args.name:
        p.error("a query name is required unless --list is given")
    if args.name not in QUERIES:
        p.error(f"unknown query {args.name!r} (see --list)")

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    import pandas as pd
    import pyarrow as pa

    result = QUERIES[args.name](args.sf_dir)
    if isinstance(result, ray.data.Dataset):
        if args.stats:
            result = result.materialize()
            print(result.stats())
        if args.out:
            result.write_parquet(args.out)
            n = ray.data.read_parquet(args.out).count()
            print(f"{args.name}: {n} rows -> {args.out}")
        else:
            head = result.limit(args.limit).to_pandas()
            n = result.count()
            print(head.to_string(index=False))
            print(f"{args.name}: {n} rows")
    else:
        df = (
            result.to_pandas()
            if isinstance(result, pa.Table)
            else pd.DataFrame(result)
        )
        if args.out:
            import pyarrow.parquet as pq

            pq.write_table(pa.Table.from_pandas(df, preserve_index=False), args.out)
            print(f"{args.name}: {len(df)} rows -> {args.out}")
        else:
            print(df.head(args.limit).to_string(index=False))
            print(f"{args.name}: {len(df)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
