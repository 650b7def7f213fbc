"""PII scrubbing + semi-structured field extraction.

Web-scale training corpora are scrubbed before training: emails, phone
numbers and long digit runs are replaced with placeholder tokens (the
C4/CCNet-style cleanup). Both kernels are single-pass vectorized Arrow
regex ops (RE2) — no per-row Python, no actor state needed, so they run
as plain ``map_batches`` task stages.

The patterns are RE2-safe by construction (no backreferences, no
lookaround), which keeps engine and DuckDB oracle semantics identical
(both are RE2 — see transforms/chain.py's ``_RE2_UNSAFE`` gate for the
general-pattern path used by the `replace` transform).

Upstream parity: SURVEY.md §2.6 training-data mandate (no goose-parser
equivalent — its transforms operate on scraped values, not corpora).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# order matters: emails before digit runs (an email may contain digits)
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
    (r"[0-9]{2,}", "<NUM>"),
)


def redact_pii(
    col: "pa.ChunkedArray | pa.Array",
    rules: tuple[tuple[str, str], ...] = PII_RULES,
) -> "pa.ChunkedArray | pa.Array":
    """Apply the redaction rules in order, global-replace each."""
    for pat, token in rules:
        col = pc.replace_substring_regex(col, pattern=pat, replacement=token)
    return col


def extract_int_field(
    col: "pa.ChunkedArray | pa.Array", field: str
) -> "pa.ChunkedArray | pa.Array":
    """Pull an integer field out of a JSON-ish string column with one
    vectorized regex (``"field": 123``) — the cheap scale path for flat
    props blobs where a full JSON parse per row would be Python-loop
    territory. Non-matching rows yield null."""
    pat = '"' + field + r'":\s*(?P<v>-?[0-9]+)'
    struct = pc.extract_regex(col, pattern=pat)
    return pc.cast(pc.struct_field(struct, "v"), pa.int64())
