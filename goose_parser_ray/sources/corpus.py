"""Deterministic synthetic corpus generation (FIXTURES.md F1, BASELINE.md
"Bench input": no external data; seed-fixed so two runs — and two parallelism
levels — see byte-identical inputs).

Two generators:

- :func:`generate_corpus_table` — interleaved span docs drawn from the
  conformance case pool (fixtures/cases), with a configurable fraction of
  mega-docs (10³⁺ spans) to exercise salting/regroup (SURVEY.md §4.2).
- :func:`wrap_flat_documents` — vectorized ``map_batches`` fn that wraps the
  driver testdata ``documents.parquet`` rows (flat ``doc_id:int64, text, …``)
  into the interleaved span shape with deterministic HTML boilerplate +
  media spans, so the flagship pipeline runs over driver-provided inputs
  (TESTDATA.md: "use these as inputs").
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import pyarrow as pa

from goose_parser_ray.spans import DOCUMENTS_SCHEMA, make_span

_CASES_DIR = Path(__file__).resolve().parents[2] / "fixtures" / "cases"

_NAV = (
    "<nav><a href='/home'>Home</a> <a href='/news'>News</a> "
    "<a href='/about'>About</a></nav>"
)
_FOOTER = "<footer>© 2016 example <a href='/legal'>legal</a></footer>"


def _case_pool() -> list[str]:
    """HTML bodies from the conformance case pool, sorted for determinism."""
    pool = []
    if _CASES_DIR.is_dir():
        for d in sorted(_CASES_DIR.iterdir()):
            f = d / "doc.html"
            if f.is_file():
                pool.append(f.read_text().rstrip("\n"))
    if not pool:  # fixtures not generated yet — minimal fallback
        pool = ["<article><h1>T</h1><p>Fallback paragraph content.</p></article>"]
    return pool


def generate_corpus_table(
    n_docs: int,
    seed: int = 42,
    mega_doc_every: int = 0,
    mega_spans: int = 1000,
) -> pa.Table:
    """Build an interleaved documents table. ``mega_doc_every=k`` makes every
    k-th doc a mega-doc with ``mega_spans`` spans (salting exercise)."""
    pool = _case_pool()
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    for i in range(n_docs):
        rng = random.Random((seed << 20) + i)
        doc_id = f"doc-{i:08d}"
        n = (
            mega_spans
            if mega_doc_every and i % mega_doc_every == mega_doc_every - 1
            else rng.randint(1, 8)
        )
        spans: list[dict] = []
        for j in range(n):
            roll = rng.random()
            if roll < 0.6:
                spans.append(make_span("html", rng.choice(pool), "", j))
            elif roll < 0.85:
                spans.append(
                    make_span("text", f"plain text {i}/{j} " * rng.randint(1, 4), "", j)
                )
            elif roll < 0.95:
                spans.append(
                    make_span("image", f"caption {j}", f"blob://{doc_id}/{j}", j)
                )
            else:
                spans.append(make_span("pdf", "", f"blob://{doc_id}/{j}", j))
        doc_ids.append(doc_id)
        spans_col.append(spans)
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=DOCUMENTS_SCHEMA
    )


def _paragraphs(text: str, target: int = 200) -> list[str]:
    """Split text into ~target-char paragraphs at word boundaries."""
    words = text.split()
    if not words:
        return []
    out: list[str] = []
    cur: list[str] = []
    size = 0
    for w in words:
        cur.append(w)
        size += len(w) + 1
        if size >= target:
            out.append(" ".join(cur))
            cur, size = [], 0
    if cur:
        out.append(" ".join(cur))
    return out


def wrap_flat_documents(batch: pa.Table) -> pa.Table:
    """map_batches fn: flat testdata ``documents`` rows → interleaved span
    rows. Deterministic per doc_id (no RNG): the html wraps the text in
    nav/article/footer boilerplate; every 3rd doc gets an image span, every
    7th a pdf span."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    sources = (
        batch["source"].to_pylist()
        if "source" in batch.column_names
        else [""] * len(doc_ids)
    )
    out_ids: list[str] = []
    out_spans: list[list[dict]] = []
    for did, text, source in zip(doc_ids, texts, sources):
        doc_id = f"doc-{did:08d}" if isinstance(did, int) else str(did)
        paras = "".join(f"<p>{p}</p>" for p in _paragraphs(text or ""))
        html = (
            f"<body>{_NAV}<article><h1>{source or 'untitled'}</h1>"
            f"{paras}</article>{_FOOTER}</body>"
        )
        spans = [make_span("html", html, "", 0)]
        k = did if isinstance(did, int) else len(doc_id)
        if k % 3 == 0:
            spans.append(make_span("image", f"figure {doc_id}", f"blob://{doc_id}/img", 1))
        if k % 7 == 0:
            spans.append(make_span("pdf", "", f"blob://{doc_id}/pdf", 2))
        out_ids.append(doc_id)
        out_spans.append(spans)
    return pa.Table.from_pydict(
        {"doc_id": out_ids, "spans": out_spans}, schema=DOCUMENTS_SCHEMA
    )


def load_case(case_id: str) -> tuple[dict | None, str, dict]:
    """(rules, html, expected) for one conformance case."""
    d = _CASES_DIR / case_id
    rules = json.loads((d / "rules.json").read_text())
    html = (d / "doc.html").read_text().rstrip("\n")
    expected = json.loads((d / "expected.json").read_text())
    return rules, html, expected
