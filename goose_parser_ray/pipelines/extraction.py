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
import os
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


class ErrorBudgetExceeded(RuntimeError):
    """Raised mid-job when the quarantined-doc fraction crosses the caller's
    ``max_error_fraction`` budget. Carries the summary so the caller sees
    how far the job got; committed partitions remain manifested."""

    def __init__(self, summary: dict, budget: float) -> None:
        self.summary, self.budget = summary, budget
        frac = summary["errors"] / max(1, summary["rows"])
        super().__init__(
            f"error fraction {frac:.3f} exceeds budget {budget:.3f} after "
            f"{summary['processed']}/{summary['num_partitions']} partitions "
            f"({summary['errors']} quarantined of {summary['rows']} docs)"
        )


def default_pool_size() -> int:
    """Deterministic pool sizing (autoscaling disabled per BASELINE.json:6):
    all CPUs minus ~1/5 reserved for read/merge/write tasks. Measured
    (2M-doc bench corpus, this host): pool=24 → 82.8k docs/s, pool=26-28 →
    90-99k, pool=30 thrashes (76k) — the write stage needs ~6 free slots at
    32 CPUs or it starves and the streaming overlap is lost."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(1, cpus - max(2, round(cpus / 5)))


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
    partition_source: str = "hash",
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
        make_normalize_fn(num_partitions, threshold, partition_source),
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
        # fixed size: deterministic scaling runs. in_flight=2 keeps one batch
        # queued per actor (hides dispatch latency); >2 buys nothing measured
        compute=ray.data.ActorPoolStrategy(
            size=pool, max_tasks_in_flight_per_actor=2
        ),
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
    read_num_blocks: int | None = None,
    partition_mode: str = "hash",
    max_error_fraction: float | None = None,
) -> dict:
    """Run (or resume) the extraction job. Returns a summary dict.

    ``max_error_fraction``: fail-fast error budget. Checked after every
    committed wave: if cumulative quarantined-doc fraction exceeds it,
    raise ``ErrorBudgetExceeded`` instead of burning the remaining corpus
    on (say) a rule plan that errors on half the documents. Committed
    partitions stay manifested — fixing the rules changes the lineage hash
    and reprocesses; rerunning unchanged resumes where the budget tripped.

    Resume granularity is the partition: a wave writes to
    ``<output>/_tmp/wave/partition_id=K/`` then each partition directory is
    atomically renamed into place and its manifest row written. A rerun
    skips every manifested partition — byte-identical final output, no
    re-processing (FIXTURES.md F6).

    ``partition_mode``:
    - 'hash' (default): partition_id = stable_hash(doc_id) % num_partitions.
      Works for any input layout; waves re-scan the input and filter.
    - 'fragment': partition = INPUT FILE (the Lance-fragment alignment of
      the north rule — the corpus arrives hash-partitioned into
      size-balanced fragments, so fragment id IS the doc-hash partition).
      Resume/wave pruning happens at the READER — skipped partitions'
      files are never opened — and every in-flight block belongs to exactly
      one partition, so the hive write emits one file per block instead of
      P splits per block (measured: 8192 -> 512 output files, and the
      per-wave full-corpus re-read disappears). ``num_partitions`` is
      derived from the file count."""
    out = Path(output_path)
    out.mkdir(parents=True, exist_ok=True)
    manifest = Manifest(output_path)
    # lineage hash covers the whole query config: plan + registry + mode
    parts = [compile_rules(rules).plan_hash if rules is not None else "boilerplate"]
    for src in sorted(rules_registry or {}):
        parts.append(f"{src}:{compile_rules(rules_registry[src]).plan_hash}")
    rules_hash = "|".join(parts)

    fragment_files: list[str] | None = None
    if partition_mode == "fragment":
        in_path = Path(input_path)
        fragment_files = sorted(
            str(f)
            for f in ([in_path] if in_path.is_file() else in_path.glob("*.parquet"))
        )
        if not fragment_files:
            raise ValueError(f"no parquet fragments under {input_path}")
        num_partitions = len(fragment_files)

    fragment_sizes = (
        [os.path.getsize(f) for f in fragment_files]
        if fragment_files is not None
        else None
    )
    done = manifest.completed_partitions(
        rules_hash,
        input_path=str(input_path),
        source_files=(
            dict(enumerate(fragment_files)) if fragment_files is not None else None
        ),
        source_sizes=(
            dict(enumerate(fragment_sizes)) if fragment_sizes is not None else None
        ),
    )
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

    summary["phase_s"] = {"pipeline": 0.0, "residual": 0.0, "commit_metrics": 0.0}
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
        nb = read_num_blocks
        if nb is None:
            # ~16 blocks per CPU: fine enough to erase the actor-pool drain
            # tail, coarse enough to keep per-task overhead negligible
            nb = 16 * int(ray.cluster_resources().get("CPU", 4))
        if fragment_files is not None:
            # reader-level pruning: ONLY this wave's fragment files are
            # opened; partition_id is stamped from file provenance
            wave_files = [fragment_files[p] for p in sorted(wave_set)]
            ds = ray.data.read_parquet(
                wave_files,
                include_paths=True,
                override_num_blocks=max(nb * len(wave_set) // num_partitions, len(wave_set)),
            )
            path_to_pid = {fragment_files[p]: p for p in wave_set}

            def stamp_pid(t: pa.Table, lut=path_to_pid) -> pa.Table:
                paths = t["path"]
                uniq = pc.unique(paths.combine_chunks())
                pid_for_uniq = pa.array(
                    [lut[u.as_py()] for u in uniq], pa.int32()
                )
                codes = pc.index_in(paths, value_set=uniq)
                return t.drop_columns(["path"]).append_column(
                    "partition_id", pc.take(pid_for_uniq, codes)
                )

            ds = ds.map_batches(stamp_pid, batch_format="pyarrow")
            pipeline_filter = None  # pruning already happened at the read
            partition_source = "column"
        else:
            ds = read_documents(input_path, num_blocks=nb)
            # pre-extract: skipped partitions cost nothing; a full-coverage
            # wave (single-wave fresh run) skips the filter stage entirely
            pipeline_filter = (
                wave_set if len(wave_set) < num_partitions else None
            )
            partition_source = "hash"
        ds = build_extraction_pipeline(
            ds,
            rules,
            rules_registry=rules_registry,
            num_partitions=num_partitions,
            salt_threshold=salt_threshold,
            concurrency=concurrency,
            batch_size=batch_size,
            strip_boilerplate=strip_boilerplate,
            partition_filter=pipeline_filter,
            residual_collector=collector,
            partition_source=partition_source,
        )
        ds.write_parquet(str(tmp), partition_cols=["partition_id"])
        summary["phase_s"]["pipeline"] += time.monotonic() - t0
        t_res = time.monotonic()
        # all map tasks finished ⇒ all residual adds applied; merge the few
        # mega-docs whose chunks crossed block boundaries and append them
        wave_metrics: dict[int, list[int]] = {
            int(k): list(v) for k, v in ray.get(collector.metrics.remote()).items()
        }
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
                acc = wave_metrics.setdefault(int(pid_val), [0, 0, 0])
                acc[0] += sub.num_rows
                acc[1] += pc.sum(sub["n_spans"]).as_py() or 0
                acc[2] += (
                    pc.sum(
                        pc.cast(pc.not_equal(sub["error"], ""), pa.int64())
                    ).as_py()
                    or 0
                )
        summary["phase_s"]["residual"] += time.monotonic() - t_res
        wall = time.monotonic() - t0
        t_commit = time.monotonic()

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
        # metrics were streamed through the collector during the pipeline —
        # no post-hoc scan of the written files (that scan cost 4.3s of
        # serial driver tail per 2M-doc wave at 8k output files). The
        # unsalted path has no collector stage → scan fallback.
        if salt_threshold is None:
            from concurrent.futures import ThreadPoolExecutor

            def metrics_for(pid: int) -> tuple[int, int, int]:
                d = out / f"partition_id={pid}"
                return _partition_metrics(d) if any(d.iterdir()) else (0, 0, 0)

            with ThreadPoolExecutor(max_workers=16) as ex:
                wave_metrics = dict(zip(wave_ids, ex.map(metrics_for, wave_ids)))
        for pid in wave_ids:
            rows, spans, errors = wave_metrics.get(pid, (0, 0, 0))
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
                    source_file=(
                        fragment_files[pid] if fragment_files is not None else None
                    ),
                    source_size=(
                        fragment_sizes[pid] if fragment_sizes is not None else None
                    ),
                )
            )
            summary["processed"] += 1
            summary["rows"] += rows
            summary["spans"] += spans
            summary["errors"] += errors
        shutil.rmtree(out / "_tmp", ignore_errors=True)
        summary["phase_s"]["commit_metrics"] += time.monotonic() - t_commit
        if (
            max_error_fraction is not None
            and summary["rows"] > 0
            and summary["errors"] > max_error_fraction * summary["rows"]
        ):
            raise ErrorBudgetExceeded(summary, max_error_fraction)
    summary["phase_s"] = {k: round(v, 3) for k, v in summary["phase_s"].items()}
    return summary
