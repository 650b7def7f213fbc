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
    """Stateful extract stage.

    ``rules``: goose rule-tree dict, or None → boilerplate-strip
    main-content mode (the flagship path).
    ``rules_registry``: per-source plan dispatch (G8 static form,
    SURVEY.md §2.1): ``{source_value: rule_tree}``; a ``"default"`` entry
    catches unmatched sources, otherwise those rows fall back to ``rules`` /
    boilerplate mode. All plans compile once per actor."""

    def __init__(
        self,
        rules: dict | None = None,
        strip_boilerplate: bool = True,
        rules_registry: dict[str, dict] | None = None,
    ) -> None:
        # once per actor: compile selectors, transform chains, classifiers
        self.plan = compile_rules(rules) if rules is not None else None
        self.registry = {
            src: compile_rules(tree) for src, tree in (rules_registry or {}).items()
        }
        self.strip_boilerplate = strip_boilerplate

    def _plan_for(self, source: str):
        if self.registry:
            plan = self.registry.get(source)
            if plan is None:
                plan = self.registry.get("default", self.plan)
            return plan
        return self.plan

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        n = len(doc_ids)
        cols = batch.column_names
        salts = batch["salt"].to_pylist() if "salt" in cols else [0] * n
        n_salts = batch["n_salts"].to_pylist() if "n_salts" in cols else [1] * n
        pids = (
            batch["partition_id"].to_pylist() if "partition_id" in cols else [0] * n
        )
        sources = batch["source"].to_pylist() if "source" in cols else [""] * n

        out_spans: list[list[dict]] = []
        out_n: list[int] = []
        out_err: list[str] = []
        for doc_id, source, spans in zip(doc_ids, sources, spans_col):
            try:
                extracted = extract_document(
                    str(doc_id),
                    spans or [],
                    plan=self._plan_for("" if source is None else str(source)),
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
                "salt_count": [1] * n,
                "n_salts": n_salts,
                "partition_id": pids,
                "spans": out_spans,
                "n_spans": out_n,
                "error": out_err,
            },
            schema=EXTRACT_OUT_SCHEMA,
        )
