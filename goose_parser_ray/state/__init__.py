"""Checkpoint manifest + exact resume (SURVEY.md §4.2 "manifest",
north_rule: "resumable from checkpoint with per-partition lineage + metrics").
"""

from goose_parser_ray.state.manifest import (
    Manifest,
    PartitionRecord,
)

__all__ = ["Manifest", "PartitionRecord"]
