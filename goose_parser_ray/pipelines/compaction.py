"""Small-file compaction for extract_corpus output (maintenance op).

A resumable run writes one hive directory per partition; each wave (and each
write task) adds parquet files, so a long job leaves partitions holding many
small files — poison for downstream scan throughput at scale (file-open cost
dominates, row groups too small to prune). ``compact_partitions`` rewrites
any partition holding more than ``max_files`` parquet files down to
``target_files``, without changing a single row.

Crash safety rides on the SAME manifest contract as the writer
(``state/manifest.py``): before touching a partition's data we delete its
manifest record, and we rewrite it (identical contents) only after the swap
completes. Every crash window therefore leaves the partition "incomplete" —
the next ``extract_corpus`` simply re-processes it. No window can silently
lose data while the manifest still claims it is complete.

Per-partition verification: the compacted rewrite must contain exactly the
row count recorded in the manifest, or the partition is left untouched (and
its record restored).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import pyarrow.parquet as pq
import ray.data

from goose_parser_ray.state.manifest import Manifest


def _parquet_files(d: Path) -> list[Path]:
    return sorted(p for p in d.glob("*.parquet") if p.is_file())


def compact_partitions(
    output_path: str,
    *,
    max_files: int = 1,
    target_files: int = 1,
    sort_within: list[str] | None = None,
) -> dict:
    """Compact every completed ``partition_id=K`` directory under
    ``output_path`` that holds more than ``max_files`` parquet files.
    Returns ``{"compacted": n, "skipped": n, "files_before": n,
    "files_after": n}``. Idempotent; safe to re-run after a crash.

    ``sort_within`` additionally rewrites each compacted partition with
    rows sorted by the given columns (Spark's
    ``repartitionAndSortWithinPartitions`` layout): downstream merge joins
    and range scans read sorted runs, and parquet row-group min/max stats
    become selective on the sort key. Sorting is PER PARTITION — no global
    shuffle — and a sorted partition still passes the row-count
    verification guard, so crash-safety semantics are unchanged."""
    out = Path(output_path)
    manifest = Manifest(output_path)
    tmp_root = out / "_compact_tmp"
    shutil.rmtree(tmp_root, ignore_errors=True)

    compacted = skipped = files_before = files_after = 0
    for rec in manifest.records():
        pid = int(rec["partition_id"])
        final = out / f"partition_id={pid}"
        files = _parquet_files(final)
        if not final.is_dir() or len(files) <= max_files:
            skipped += 1
            files_before += len(files)
            files_after += len(files)
            continue

        tmp = tmp_root / f"partition_id={pid}"
        # partition_id is already encoded in the dir name; the reader
        # re-infers it from the path (sometimes as dictionary, sometimes a
        # file-embedded int32 from an earlier rewrite), and mixed types
        # break the schema merge a sort needs — drop it before rewriting,
        # the hive path restores it on read-back
        ds = ray.data.read_parquet(str(final))
        if "partition_id" in ds.schema().names:
            ds = ds.drop_columns(["partition_id"])
        if sort_within:
            ds = ds.sort(sort_within)
        ds = ds.repartition(target_files)
        ds.write_parquet(str(tmp))
        new_files = _parquet_files(tmp)
        # metadata-only row count (footers), no second scan
        new_rows = sum(
            pq.ParquetFile(str(f)).metadata.num_rows for f in new_files
        )
        if new_rows != int(rec["row_count"]):
            # verification failed — leave the original untouched
            shutil.rmtree(tmp, ignore_errors=True)
            skipped += 1
            files_before += len(files)
            files_after += len(files)
            continue

        rec_file = manifest.dir / f"partition-{pid:05d}.json"
        os.remove(rec_file)  # partition is now "incomplete": crash ⇒ redo
        shutil.rmtree(final)
        os.replace(tmp, final)
        # restore the identical record — the data it describes is unchanged
        tmp_rec = rec_file.with_suffix(".json.tmp")
        tmp_rec.write_text(json.dumps(rec, indent=1))
        os.replace(tmp_rec, rec_file)

        compacted += 1
        files_before += len(files)
        files_after += len(new_files)

    shutil.rmtree(tmp_root, ignore_errors=True)
    return {
        "compacted": compacted,
        "skipped": skipped,
        "files_before": files_before,
        "files_after": files_after,
    }
