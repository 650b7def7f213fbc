"""Per-stage Ray Data stats for any query-surface entry.

    python tools/qstats.py <query_name> [sf_dir]

Runs the query (default sf0.01), consumes it, and prints ``ds.stats()`` —
per-operator wall time, block counts, and memory — the feedback loop used
to verify a stage is dominated by useful compute rather than shuffle or
per-task overhead (see BASELINE.md's tuning notes).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from goose_parser_ray.queries import QUERIES

    res = QUERIES[name](sf_dir)
    if hasattr(res, "stats"):
        res = res.materialize()
        n = res.count()
        print(res.stats())
        print(f"-- {name}: {n} rows")
    else:  # pandas / pyarrow result: already executed eagerly
        print(f"-- {name}: eager result, {len(res)} rows (no lazy plan)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
