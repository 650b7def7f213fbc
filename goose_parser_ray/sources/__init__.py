"""Sources & sinks: the corpus read/write surface (SURVEY.md §2.5).

The reference's "environments" (Phantom/Chrome/jsdom live pages) collapse into
one corpus reader over the interleaved span table; persistence — absent in the
reference — is a first-class sink here.

Lance is the intended format (``north_rule``); this sandbox has no pylance, so
:mod:`goose_parser_ray.sources.io` is a 2-function shim over Parquet with the
exact Lance-intended schema — Lance drops in when available (SURVEY.md §7.0).
"""

from goose_parser_ray.sources.io import read_documents, write_spans
from goose_parser_ray.sources.corpus import (
    generate_corpus_table,
    wrap_flat_documents,
)
from goose_parser_ray.sources.warc import read_warc, write_warc_shards

__all__ = [
    "read_documents",
    "write_spans",
    "generate_corpus_table",
    "wrap_flat_documents",
    "read_warc",
    "write_warc_shards",
]
