"""Benchmark harness (driver contract, BASELINE.md protocol).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "docs": N, "docs_per_sec": X}

Headline = the flagship extraction pipeline (wrap → normalize/salt →
DOM-extract actor pool → regroup → write) over the sf documents table
replicated ×GRAFT_REPL (default 10, deterministic doc-id suffixes — the
500–5000-row testdata alone underfeeds a 32-CPU pool).

``--scaling``: runs plain bench.py in TWO FRESH PROCESSES at
RAY_GRAFT_CPUS=8 and =32 on identical input and reports throughputs +
scaling efficiency = (T32/T8)/4 (in-sandbox stand-in for the N→4N-node
criterion — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("GRAFT_REPL", "10"))

TIMED_QUERIES = [
    "pricing_summary",
    "agg_by_lang",
    "join_segment",
    "events_window",
    "transform_clean",
    "token_stats",
    "dedup_exact",
    "dedup_minhash",
    "ann_bruteforce",
]


def run_bench() -> dict:
    import pyarrow as pa
    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from goose_parser_ray.pipelines import build_extraction_pipeline
    from goose_parser_ray.sources.corpus import wrap_flat_documents
    import goose_parser_ray.queries as Q

    # ---- headline: extraction throughput --------------------------------
    def replicate(batch: pa.Table, r: int = REPL) -> pa.Table:
        # deterministic corpus inflation: r copies with distinct doc_ids
        tables = []
        for k in range(r):
            ids = [f"{d}-r{k}" for d in batch["doc_id"].to_pylist()]
            tables.append(
                pa.Table.from_arrays(
                    [pa.array(ids), batch["spans"]], names=["doc_id", "spans"]
                )
            )
        return pa.concat_tables(tables)

    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows * REPL

    # warm OS page cache (untimed) so we measure compute + shuffle
    pq.read_table(f"{SF_DIR}/documents.parquet")

    out_dir = f"/tmp/bench_out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.monotonic()
    ds = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    ds = ds.map_batches(wrap_flat_documents, batch_format="pyarrow")
    ds = ds.map_batches(replicate, batch_format="pyarrow")
    ds = build_extraction_pipeline(
        ds,
        num_partitions=64,
        salt_threshold=512,
        concurrency=max(1, NUM_CPUS - 2),
        batch_size=64,
    )
    ds.write_parquet(out_dir)
    headline = time.monotonic() - t0

    # ---- individual query timings ---------------------------------------
    q_times: dict[str, float] = {}
    for name in TIMED_QUERIES:
        fn = Q.QUERIES[name]
        t0 = time.monotonic()
        res = fn(SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()  # consume (results are small aggregates/pairs)
        q_times[name] = round(time.monotonic() - t0, 3)

    ray.shutdown()
    return {
        "metric": "extraction_wall_seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 1),
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    t8, t32 = lo["value"], hi["value"]
    eff = (t8 / t32) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "sec_8": t8,
        "sec_32": t32,
        "docs_per_sec_8": lo["docs_per_sec"],
        "docs_per_sec_32": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "docs": hi["docs"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
