"""Manifest unit tests (state/manifest.py): atomicity, lineage filtering,
torn-write tolerance."""

import json

from goose_parser_ray.state.manifest import Manifest, PartitionRecord


def rec(pid, rules_hash="h1", status="complete"):
    return PartitionRecord(
        partition_id=pid, status=status, row_count=10, span_count=50,
        error_count=0, wall_s=1.0, rules_hash=rules_hash,
        code_version="0.1.0", input_path="/in",
    )


def test_mark_and_read_back(tmp_path):
    m = Manifest(str(tmp_path))
    m.mark_complete(rec(0))
    m.mark_complete(rec(3))
    assert m.completed_partitions("h1") == {0, 3}
    assert len(m.records()) == 2


def test_lineage_mismatch_not_completed(tmp_path):
    m = Manifest(str(tmp_path))
    m.mark_complete(rec(0, rules_hash="old"))
    assert m.completed_partitions("new") == set()
    assert m.completed_partitions("old") == {0}
    assert m.completed_partitions(None) == {0}  # lineage check opt-out


def test_torn_write_ignored(tmp_path):
    m = Manifest(str(tmp_path))
    m.mark_complete(rec(1))
    (m.dir / "partition-00002.json").write_text('{"partition_id": 2, "status"')
    assert m.completed_partitions("h1") == {1}


def test_incomplete_status_ignored(tmp_path):
    m = Manifest(str(tmp_path))
    m.mark_complete(rec(1, status="running"))
    assert m.completed_partitions("h1") == set()


def test_rewrite_is_atomic_replace(tmp_path):
    m = Manifest(str(tmp_path))
    m.mark_complete(rec(5))
    m.mark_complete(rec(5))  # idempotent overwrite
    assert m.completed_partitions("h1") == {5}
    data = json.loads((m.dir / "partition-00005.json").read_text())
    assert data["row_count"] == 10
    assert not list(m.dir.glob("*.tmp"))
