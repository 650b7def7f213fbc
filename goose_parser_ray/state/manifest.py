"""Per-partition checkpoint manifest (SURVEY.md §4.2).

One JSON file per completed partition under ``<output>/_manifest/``, written
atomically (tmp + rename) AFTER the partition's output directory is in place,
so a crash between the two leaves the partition "incomplete" and it is simply
re-processed — never half-trusted. On restart, completed partitions are
skipped by an input filter ("exact resume", BASELINE.json north_rule).

Record fields (SURVEY.md §4.2 table): partition_id, status, row_count,
span_count, error_count, wall_s, lineage = (rules_hash, code_version,
input_path).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass
from pathlib import Path

from goose_parser_ray import __version__ as CODE_VERSION


@dataclass
class PartitionRecord:
    partition_id: int
    status: str  # 'complete'
    row_count: int
    span_count: int
    error_count: int
    wall_s: float
    rules_hash: str
    code_version: str
    input_path: str
    # fragment mode: WHICH input file this partition id covered. Partition
    # ids are indexes into the sorted fragment list, so a new shard that
    # sorts mid-list silently remaps every later id — without this field a
    # resume would trust stale outputs under the new mapping. None for
    # hash-partitioned runs (partition identity is the doc-id hash, stable
    # under any input file layout).
    source_file: str | None = None
    # byte size of that file when processed: a re-uploaded shard (same name,
    # different content) must also invalidate. One os.stat per pending
    # partition at resume — no file reads.
    source_size: int | None = None


class Manifest:
    def __init__(self, output_path: str) -> None:
        self.dir = Path(output_path) / "_manifest"

    def completed_partitions(
        self,
        rules_hash: str | None = None,
        input_path: str | None = None,
        source_files: dict[int, str] | None = None,
        source_sizes: dict[int, int] | None = None,
    ) -> set[int]:
        """Partitions safe to skip. A manifest written under a different rule
        plan — or from a DIFFERENT INPUT — does NOT count as complete;
        either change invalidates the checkpoint (full lineage check, not
        just the plan hash). ``source_files`` (fragment mode) maps each
        partition id to the file it must cover under the CURRENT sorted
        fragment list: a record whose stored source differs (a new shard
        re-sorted the list, or a legacy record without the field) is stale
        and the partition reprocesses."""
        done: set[int] = set()
        if not self.dir.is_dir():
            return done
        for f in sorted(self.dir.glob("partition-*.json")):
            try:
                rec = json.loads(f.read_text())
            except (json.JSONDecodeError, OSError):
                continue  # torn write → not complete
            if rec.get("status") != "complete":
                continue
            if rules_hash is not None and rec.get("rules_hash") != rules_hash:
                continue
            if input_path is not None and rec.get("input_path") != input_path:
                continue
            pid = int(rec["partition_id"])
            if source_files is not None and rec.get("source_file") != (
                source_files.get(pid)
            ):
                continue
            if source_sizes is not None and rec.get("source_size") != (
                source_sizes.get(pid)
            ):
                continue
            done.add(pid)
        return done

    def mark_complete(self, rec: PartitionRecord) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        final = self.dir / f"partition-{rec.partition_id:05d}.json"
        tmp = final.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(asdict(rec), indent=1))
        os.replace(tmp, final)  # atomic on POSIX

    def records(self) -> list[dict]:
        out = []
        if self.dir.is_dir():
            for f in sorted(self.dir.glob("partition-*.json")):
                try:
                    out.append(json.loads(f.read_text()))
                except (json.JSONDecodeError, OSError):
                    pass
        return out
