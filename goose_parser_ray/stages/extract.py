"""Extract stage — the hot actor pool (SURVEY.md §3.4 stage 4, §4.3).

A callable CLASS for ``map_batches(ExtractActor, concurrency=(n, n), ...)``:
rule-plan compilation happens ONCE per actor in ``__init__`` (the plan JSON
crosses the process boundary once, as constructor args); ``__call__`` does
per-batch work only. DOM parsing is inherently per-document — the batch loop
iterates documents, not characters — and the whole DOM lives and dies inside
the call (never serialized into Arrow — SURVEY.md §1.2).

Poison-document quarantine (SURVEY.md §4.2): a per-row parse/eval error never
fails the task — the row is emitted with ``error`` set and empty spans, so a
10¹²-doc run cannot die on one bad document. Reject rows are filterable
downstream (``error != ''``).
"""

from __future__ import annotations

import pyarrow as pa

from goose_parser_ray.rules import compile_rules
from goose_parser_ray.spans import SPAN_STRUCT, extract_document

EXTRACT_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("salt", pa.int32()),  # first original chunk index in this row
        ("salt_count", pa.int32()),  # original chunks merged into this row
        ("n_salts", pa.int32()),  # total original chunks for the doc
        ("partition_id", pa.int32()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("n_spans", pa.int32()),
        ("error", pa.string()),
    ]
)


class ExtractActor:
    """Stateful extract stage. ``rules``: goose rule-tree dict or None
    (None → boilerplate-strip main-content mode, the flagship path)."""

    def __init__(
        self, rules: dict | None = None, strip_boilerplate: bool = True
    ) -> None:
        # once per actor: compile selectors, transform chains, classifiers
        self.plan = compile_rules(rules) if rules is not None else None
        self.strip_boilerplate = strip_boilerplate

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        has_salt = "salt" in batch.column_names
        salts = batch["salt"].to_pylist() if has_salt else [0] * len(doc_ids)
        n_salts = batch["n_salts"].to_pylist() if has_salt else [1] * len(doc_ids)
        pids = (
            batch["partition_id"].to_pylist()
            if "partition_id" in batch.column_names
            else [0] * len(doc_ids)
        )

        out_spans: list[list[dict]] = []
        out_n: list[int] = []
        out_err: list[str] = []
        for doc_id, spans in zip(doc_ids, spans_col):
            try:
                extracted = extract_document(
                    str(doc_id),
                    spans or [],
                    plan=self.plan,
                    strip_boilerplate=self.strip_boilerplate,
                )
                out_spans.append(extracted)
                out_n.append(len(extracted))
                out_err.append("")
            except Exception as exc:  # noqa: BLE001 — quarantine, never fail
                out_spans.append([])
                out_n.append(0)
                out_err.append(f"{type(exc).__name__}: {exc}")
        return pa.Table.from_pydict(
            {
                "doc_id": [str(d) for d in doc_ids],
                "salt": salts,
                "salt_count": [1] * len(doc_ids),
                "n_salts": n_salts,
                "partition_id": pids,
                "spans": out_spans,
                "n_spans": out_n,
                "error": out_err,
            },
            schema=EXTRACT_OUT_SCHEMA,
        )
