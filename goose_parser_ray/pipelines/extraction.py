"""The flagship extraction pipeline (SURVEY.md §3.4, north_rule).

``build_extraction_pipeline``: lazy Dataset → Dataset —
read-side pruning happens in the caller's reader; then

  normalize/salt (stateless tasks)
  → ExtractActor pool (fixed size, DOM parse + rules/boilerplate)
  → regroup (only when salting is on — the single shuffle)

``extract_corpus``: the resumable job runner — processes partitions in
waves, commits each partition's output directory atomically, records a
manifest row per partition, and skips completed partitions on restart
(SURVEY.md §4.2, FIXTURES.md F6).
"""

from __future__ import annotations

import math
import shutil
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray
import ray.data

from goose_parser_ray.rules import compile_rules
from goose_parser_ray.sources.io import read_documents
from goose_parser_ray.stages.extract import ExtractActor
from goose_parser_ray.stages.normalize import make_normalize_fn
from goose_parser_ray.stages.regroup import regroup_salted
from goose_parser_ray.state.manifest import Manifest, PartitionRecord
from goose_parser_ray import __version__ as CODE_VERSION

# Salting protects actor heaps from mega-docs; anything below this span count
# is cheaper to process in place than to split and re-shuffle.
DEFAULT_SALT_THRESHOLD = 512


def default_pool_size() -> int:
    """Deterministic pool sizing (autoscaling disabled per BASELINE.json:6):
    ~3/4 of CPUs for the extract pool, the rest for read/merge/write tasks.
    Measured (sf0.1 ×100, 32 CPUs): pool=30 thrashes against the read/write
    tasks (43s); pool=24 pipelines cleanly (12s)."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(1, min(cpus - 2, (cpus * 3) // 4))


def build_extraction_pipeline(
    ds: ray.data.Dataset,
    rules: dict | None = None,
    *,
    rules_registry: dict[str, dict] | None = None,
    num_partitions: int = 64,
    salt_threshold: int | None = DEFAULT_SALT_THRESHOLD,
    concurrency: int | None = None,
    batch_size: int = 256,
    strip_boilerplate: bool = True,
    drop_errors: bool = False,
    partition_filter: "set[int] | None" = None,
    residual_collector=None,
) -> ray.data.Dataset:
    """Wire the stages onto ``ds`` (lazy — nothing executes here).

    ``partition_filter``: restrict the job to these partition_ids — applied
    right after normalize, BEFORE the expensive extract stage (resume/wave
    runs must not re-extract skipped partitions).

    Regroup strategy for salted mega-docs:
    - ``residual_collector`` given → shuffle-free fast path: in-batch partial
      merge + residual rows handed to the collector actor (caller drains it
      after consuming the dataset — see stages/residual.py). This is the
      production path (extract_corpus / bench).
    - else → the general ``groupby(doc_id)`` regroup (stages/regroup.py):
      self-contained and correct for ad-hoc `.to_pandas()` use, but pays an
      all-to-all over ALL rows — measured ~14s wall + 100s CPU on a 50k-row
      corpus with zero salted docs, so production callers should prefer the
      collector.
    - ``salt_threshold=None`` disables salting → no regroup at all."""
    pool = concurrency if concurrency is not None else default_pool_size()
    threshold = salt_threshold if salt_threshold is not None else 1 << 30
    ds = ds.map_batches(
        make_normalize_fn(num_partitions, threshold),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    if partition_filter is not None:
        keep = pa.array(sorted(partition_filter), pa.int32())
        ds = ds.map_batches(
            lambda t, k=keep: t.filter(pc.is_in(t["partition_id"], k)),
            batch_format="pyarrow",
        )
    ds = ds.map_batches(
        ExtractActor,
        fn_constructor_kwargs={
            "rules": rules,
            "strip_boilerplate": strip_boilerplate,
            "rules_registry": rules_registry,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(pool, pool),  # fixed size: deterministic scaling runs
        num_cpus=1,
    )
    if salt_threshold is not None:
        if residual_collector is not None:
            from goose_parser_ray.stages.residual import (
                make_partial_merge_with_collector,
            )

            ds = ds.map_batches(
                make_partial_merge_with_collector(residual_collector),
                batch_format="pyarrow",
                batch_size=None,  # whole blocks: keep a doc's chunks together
            )
        else:
            ds = regroup_salted(ds)
    if drop_errors:
        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t["error"], pa.scalar(""))),
            batch_format="pyarrow",
        )
    return ds


def _chunk(seq: list[int], n_chunks: int) -> list[list[int]]:
    size = max(1, math.ceil(len(seq) / n_chunks))
    return [seq[i : i + size] for i in range(0, len(seq), size)]


def _partition_metrics(part_dir: Path) -> tuple[int, int, int]:
    """(row_count, span_count, error_count) from written parquet — column-
    pruned scan of two small columns, no spans payload read."""
    dataset = pads.dataset(str(part_dir), format="parquet")
    tbl = dataset.to_table(columns=["n_spans", "error"])
    rows = tbl.num_rows
    span_count = pc.sum(tbl["n_spans"]).as_py() or 0
    error_count = pc.sum(
        pc.cast(pc.not_equal(tbl["error"], ""), pa.int64())
    ).as_py() or 0
    return rows, span_count, error_count


def extract_corpus(
    input_path: str,
    output_path: str,
    rules: dict | None = None,
    *,
    rules_registry: dict[str, dict] | None = None,
    num_partitions: int = 16,
    waves: int = 4,
    salt_threshold: int | None = DEFAULT_SALT_THRESHOLD,
    concurrency: int | None = None,
    batch_size: int = 256,
    strip_boilerplate: bool = True,
) -> dict:
    """Run (or resume) the extraction job. Returns a summary dict.

    Resume granularity is the partition: a wave writes to
    ``<output>/_tmp/wave/partition_id=K/`` then each partition directory is
    atomically renamed into place and its manifest row written. A rerun
    skips every manifested partition — byte-identical final output, no
    re-processing (FIXTURES.md F6)."""
    out = Path(output_path)
    out.mkdir(parents=True, exist_ok=True)
    manifest = Manifest(output_path)
    # lineage hash covers the whole query config: plan + registry + mode
    parts = [compile_rules(rules).plan_hash if rules is not None else "boilerplate"]
    for src in sorted(rules_registry or {}):
        parts.append(f"{src}:{compile_rules(rules_registry[src]).plan_hash}")
    rules_hash = "|".join(parts)

    done = manifest.completed_partitions(rules_hash, input_path=str(input_path))
    pending = [p for p in range(num_partitions) if p not in done]
    summary = {
        "num_partitions": num_partitions,
        "skipped": len(done),
        "processed": 0,
        "rows": 0,
        "spans": 0,
        "errors": 0,
    }
    if not pending:
        return summary

    for wave_ids in _chunk(pending, waves):
        t0 = time.monotonic()
        wave_set = set(wave_ids)
        tmp = out / "_tmp" / "wave"
        if tmp.exists():
            shutil.rmtree(tmp)  # leftovers from a killed run
        from goose_parser_ray.stages.residual import (
            ResidualCollector,
            drain_to_table,
        )

        collector = ResidualCollector.remote()
        ds = read_documents(input_path)
        ds = build_extraction_pipeline(
            ds,
            rules,
            rules_registry=rules_registry,
            num_partitions=num_partitions,
            salt_threshold=salt_threshold,
            concurrency=concurrency,
            batch_size=batch_size,
            strip_boilerplate=strip_boilerplate,
            partition_filter=wave_set,  # pre-extract: skipped partitions cost nothing
            residual_collector=collector,
        )
        ds.write_parquet(str(tmp), partition_cols=["partition_id"])
        # all map tasks finished ⇒ all residual adds applied; merge the few
        # mega-docs whose chunks crossed block boundaries and append them
        residual = drain_to_table(collector)
        if residual is not None:
            import pyarrow.parquet as _pq

            for pid_val in sorted(set(residual["partition_id"].to_pylist())):
                sub = residual.filter(
                    pc.equal(residual["partition_id"], pa.scalar(pid_val, pa.int32()))
                ).drop_columns(["partition_id"])  # hive layout omits the key
                pdir = tmp / f"partition_id={pid_val}"
                pdir.mkdir(parents=True, exist_ok=True)
                _pq.write_table(sub, pdir / "residual.parquet")
        wall = time.monotonic() - t0

        # commit partitions (atomic renames), then gather metrics in parallel
        # (serial per-partition parquet scans cost ~2s at 64 partitions)
        for pid in wave_ids:
            src = tmp / f"partition_id={pid}"
            dst = out / f"partition_id={pid}"
            if not src.exists():
                src.mkdir(parents=True)  # empty partition still commits
            if dst.exists():
                shutil.rmtree(dst)
            src.rename(dst)
        from concurrent.futures import ThreadPoolExecutor

        def metrics_for(pid: int) -> tuple[int, int, int]:
            dst = out / f"partition_id={pid}"
            return _partition_metrics(dst) if any(dst.iterdir()) else (0, 0, 0)

        with ThreadPoolExecutor(max_workers=16) as ex:
            all_metrics = list(ex.map(metrics_for, wave_ids))
        for pid, (rows, spans, errors) in zip(wave_ids, all_metrics):
            manifest.mark_complete(
                PartitionRecord(
                    partition_id=pid,
                    status="complete",
                    row_count=rows,
                    span_count=spans,
                    error_count=errors,
                    wall_s=round(wall / len(wave_ids), 4),
                    rules_hash=rules_hash,
                    code_version=CODE_VERSION,
                    input_path=str(input_path),
                )
            )
            summary["processed"] += 1
            summary["rows"] += rows
            summary["spans"] += spans
            summary["errors"] += errors
        shutil.rmtree(out / "_tmp", ignore_errors=True)
    return summary
