"""End-to-end pipelines (SURVEY.md §3.4)."""

from goose_parser_ray.pipelines.compaction import compact_partitions
from goose_parser_ray.pipelines.extraction import (
    ErrorBudgetExceeded,
    build_extraction_pipeline,
    extract_corpus,
)

__all__ = [
    "ErrorBudgetExceeded",
    "build_extraction_pipeline",
    "compact_partitions",
    "extract_corpus",
]
