"""Interleaved span document model + single-process extraction kernel.

Input/output shape is the ``input_hint`` table (BASELINE.json:15, SURVEY.md
§1.2): ``(doc_id: string, spans: list<struct<kind, text, media_ref,
offset:int32>>)``. The per-row conformance invariant is span-sequence equality
on ``(kind, text, media_ref, order)`` — ``offset`` carried, order compared.

:func:`extract_document` is the naive single-process oracle evaluator
(SURVEY.md §5.2-3) AND the per-row kernel the Ray extract actor calls — one
implementation, two harnesses, so the Ray pipeline and the golden fixtures
can only diverge through dataflow bugs, which is exactly what the conformance
tests exist to catch.

Per-span semantics (encoded in golden fixtures):

- ``html``  → DOM parse once; with a rule plan: evaluate and flatten the
  goose-JSON result to ordered text spans (rule-tree order); without a plan:
  boilerplate-strip and emit main-content text blocks in document order.
- ``text``  → pass through as a text span (whitespace-normalized like an HTML
  text block).
- ``image`` → pass through preserving ``(kind, media_ref, order)``; caption
  text kept verbatim.
- ``pdf``   → routed through the layout branch (stubbed in-sandbox —
  :func:`pdf_layout_spans`), which passes spans through deterministically.
"""

from __future__ import annotations

import re
from typing import Any

import pyarrow as pa

from goose_parser_ray.boilerplate import extract_main_text
from goose_parser_ray.html import parse_html
from goose_parser_ray.rules import evaluate
from goose_parser_ray.rules.plan import Plan

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("n_spans", pa.int32()),
        ("error", pa.string()),  # '' = ok; poison-doc quarantine (§4.2)
    ]
)

_WS = re.compile(r"\s+")


def make_span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def flatten_result(value: Any) -> list[str]:
    """Goose-JSON result → ordered scalar strings, rule-tree order.

    dict preserves insertion order (= rule order); lists in element order;
    non-strings stringified (`compare` booleans etc.)."""
    out: list[str] = []

    def walk(v: Any) -> None:
        if isinstance(v, dict):
            for sub in v.values():
                walk(sub)
        elif isinstance(v, list):
            for sub in v:
                walk(sub)
        elif isinstance(v, bool):
            out.append("true" if v else "false")
        elif v is None:
            out.append("")
        else:
            out.append(str(v))

    walk(value)
    return out


def pdf_layout_spans(span: dict, seq: int) -> list[dict]:
    """PDF/layout branch (SURVEY.md §7.4). No PDF library exists in this
    sandbox, so the layout parse is a clearly-marked deterministic stub: the
    span passes through preserving ``(kind, media_ref, order)`` with its
    caption text. The interface (span in → ordered spans out) is the real
    one a layout parser slots into."""
    return [make_span("pdf", span.get("text", ""), span.get("media_ref", ""), seq)]


def extract_document(
    doc_id: str,
    spans: list[dict],
    plan: Plan | None = None,
    strip_boilerplate: bool = True,
) -> list[dict]:
    """Extract one document's ordered output spans (see module docstring).

    ``spans`` must be offset-ordered (the normalize stage guarantees it);
    output ``offset`` is the emission sequence number 0..n-1."""
    out: list[dict] = []
    seq = 0
    for span in sorted(spans, key=lambda s: s["offset"]):
        kind = span.get("kind", "text")
        if kind == "html":
            root = parse_html(span.get("text", ""))
            if plan is not None:
                texts = flatten_result(evaluate(plan, root))
            elif strip_boilerplate:
                texts = extract_main_text(root)
            else:
                texts = [_WS.sub(" ", root.text()).strip()]
            for t in texts:
                out.append(make_span("text", t, "", seq))
                seq += 1
        elif kind == "text":
            t = _WS.sub(" ", span.get("text", "")).strip()
            if t:
                out.append(make_span("text", t, "", seq))
                seq += 1
        elif kind == "image":
            out.append(
                make_span("image", span.get("text", ""), span.get("media_ref", ""), seq)
            )
            seq += 1
        elif kind == "pdf":
            for s in pdf_layout_spans(span, seq):
                out.append(s)
                seq += 1
        else:
            raise ValueError(f"unknown span kind {kind!r} in doc {doc_id!r}")
    return out
